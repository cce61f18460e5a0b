"""Canonical encodings between field elements, bytes, and proof items.

The reference wires Merkle leaves as pre-hashed [u8;64] (merkle.rs:35) and
leaves the field-element -> bytes -> leaf mapping to the (absent) STARK layer
(SURVEY.md section 1). These are our framework's pinned definitions; they are
part of the proof format and must never change:

- field element -> bytes: 16-byte little-endian of the canonical (fully
  reduced) representative;
- a Merkle leaf for a tuple of field elements = Blake2b-512 of the
  concatenated 16-byte encodings;
- proof items carry field elements as decimal strings, digests as lowercase
  hex strings (JSON-safe; see iop/proof_stream.py).

Intentional divergence from the reference's serde encodings: the reference
serializes a [u8;64] MerkleHash as a JSON array of 64 integers via
serde-big-array (/root/reference/src/iop/types/merkle.rs:9-13) and field
elements through serde's derived I320 representation. This framework's
items are ~2.4x smaller for digests and canonical-by-construction (the
strict decoders below reject every non-canonical re-encoding, closing the
Fiat-Shamir malleability surface an int-array or sign-carrying encoding
would re-open). Byte compatibility with the reference is pinned where the
reference defines bytes — the ProofStream serialization grammar and its
Fiat-Shamir digests (tests/test_proof_stream.py golden vectors); the full
proof grammar of THIS framework is pinned by tests/golden/ +
tests/test_golden_proof.py.

Grammar history:
- v1 (rounds 1-3): per-leaf Merkle paths ({"fri_paths"}, {"bq_paths"},
  {"zk_paths"}), one sibling list per opened index.
- v2 (round 4, CURRENT): deduplicated batch openings — one
  {"fri_multiproofs": [[hex64...] per tree]} item for all FRI trees
  (round r's next-tree openings fold into tree r+1's own set; the last
  tree ships nothing, its codeword is already in the transcript) and
  {"bq_multiproof"} / {"zk_multiproof"} node lists (iop/merkle.py
  multiproof_plan order). Optional {"pow_nonce"} grinding item between
  the last codeword and query sampling when grinding_bits > 0. The
  golden file was regenerated (1.8x smaller at the golden size; ~2x at
  production sizes where path sharing is deeper).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List, Sequence

from stark_anatomy_tpu.ops.field import PRIME

FELT_BYTES = 16  # 128-bit field elements


def felt_to_bytes(value: int) -> bytes:
    """Canonical 16-byte little-endian encoding of a field element."""
    return (value % PRIME).to_bytes(FELT_BYTES, "little")


def bytes_to_felt(data: bytes) -> int:
    if len(data) != FELT_BYTES:
        raise ValueError(f"expected {FELT_BYTES} bytes, got {len(data)}")
    value = int.from_bytes(data, "little")
    if value >= PRIME:
        raise ValueError("non-canonical field element encoding")
    return value


def felts_to_bytes(values: Iterable[int]) -> bytes:
    return b"".join(felt_to_bytes(v) for v in values)


def hash_felts(values: Sequence[int]) -> bytes:
    """Blake2b-512 leaf digest of a tuple of field elements."""
    return hashlib.blake2b(felts_to_bytes(values), digest_size=64).digest()


# -- JSON proof-item encodings --------------------------------------------


def felt_to_item(value: int) -> str:
    return str(value % PRIME)


def item_to_felt(item: str) -> int:
    # Strict canonical decimal: Python's int() accepts '+7', ' 7', '007',
    # '1_0' — distinct transcript byte-encodings of one field element would
    # hash differently under Fiat-Shamir, handing a malicious prover free
    # transcript-malleability/grinding surface. Reject anything that does
    # not round-trip exactly.
    if not isinstance(item, str):
        raise ValueError("field element item must be a string")
    value = int(item)
    if item != str(value):
        raise ValueError("non-canonical field element item")
    if not 0 <= value < PRIME:
        raise ValueError("field element item out of range")
    return value


def felts_to_item(values: Sequence[int]) -> List[str]:
    return [felt_to_item(v) for v in values]


def item_to_felts(items: Sequence[str]) -> List[int]:
    return [item_to_felt(i) for i in items]


# -- proof-of-work grinding -------------------------------------------------
#
# Standard STARK grinding (as in EthSTARK/winterfell): after the commit
# phase, the prover finds a nonce whose SHA-256 against the transcript
# digest has `bits` leading zero bits, and only THEN samples the query
# indices (with the nonce in the transcript). Re-sampling the queries now
# costs an attacker 2^bits hash evaluations per attempt, adding `bits` to
# the FRI query soundness at ~2^bits one-time prover hashes (tens of ms
# for the 16-bit production profiles). The reference has no analogue (it
# has no FRI); accounted in Fri.security_bits / Stark.security_level.


def pow_digest_ok(seed: bytes, nonce: int, bits: int) -> bool:
    """True iff SHA-256(seed || be8(nonce)) has >= `bits` leading zero bits."""
    if not 0 <= nonce < (1 << 64):
        return False
    d = hashlib.sha256(seed + nonce.to_bytes(8, "big")).digest()
    return int.from_bytes(d[:8], "big") >> (64 - bits) == 0 if bits else True


def grind(seed: bytes, bits: int) -> int:
    """Smallest nonce passing pow_digest_ok — deterministic per seed."""
    if not 0 <= bits <= 40:
        raise ValueError("grinding_bits must be in [0, 40]")
    nonce = 0
    while not pow_digest_ok(seed, nonce, bits):
        nonce += 1
    return nonce


def nonce_to_item(nonce: int) -> str:
    return str(nonce)


def item_to_nonce(item: str) -> int:
    """Strict canonical decimal u64 (same malleability rationale as
    item_to_felt: one value, one transcript byte-encoding)."""
    if not isinstance(item, str):
        raise ValueError("nonce item must be a string")
    value = int(item)
    if item != str(value) or not 0 <= value < (1 << 64):
        raise ValueError("non-canonical nonce item")
    return value


def digest_to_item(digest: bytes) -> str:
    return digest.hex()


def item_to_digest(item: str) -> bytes:
    if not isinstance(item, str):
        raise ValueError("digest item must be a string")
    data = bytes.fromhex(item)
    if len(data) != 64:
        raise ValueError("expected a 64-byte digest")
    if item != data.hex():  # reject uppercase/mixed-case re-encodings
        raise ValueError("non-canonical digest item")
    return data
