"""Canonical encodings between field elements, bytes, and proof items.

The reference wires Merkle leaves as pre-hashed [u8;64] (merkle.rs:35) and
leaves the field-element -> bytes -> leaf mapping to the (absent) STARK layer
(SURVEY.md section 1). These are our framework's pinned definitions; they are
part of the proof format and must never change:

- field element -> bytes: 16-byte little-endian of the canonical (fully
  reduced) representative;
- a Merkle leaf for a tuple of field elements = Blake2b-512 of the
  concatenated 16-byte encodings;
- proof items carry field elements as decimal strings, digests as standard
  base64 strings (JSON-safe; see iop/proof_stream.py).

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
- v2 (round 4): deduplicated batch openings — one
  {"fri_multiproofs": [[hex64...] per tree]} item for all FRI trees
  (round r's next-tree openings fold into tree r+1's own set; the last
  tree ships nothing, its codeword is already in the transcript) and
  {"bq_multiproof"} / {"zk_multiproof"} node lists (iop/merkle.py
  multiproof_plan order). Optional {"pow_nonce"} grinding item between
  the last codeword and query sampling when grinding_bits > 0. The
  golden file was regenerated (1.8x smaller at the golden size; ~2x at
  production sizes where path sharing is deeper).
- v3 (round 5, CURRENT): PAIR-LEAF commitments (iop/merkle.py
  pair_columns) on every prover tree — leaf j of a length-n codeword
  tree is Blake2b-512 of rows j AND j + n/2 (all columns' row j
  encodings, then all columns' row j+n/2), the index pair every FRI
  colinearity query and every (i, i+F/2) STARK opening touches
  together. Effects on the wire: every tree is one level shorter, each
  multiproof covers half as many leaves, and {"fri_points"} carries
  [a, b] PAIRS — the fold value c left the grammar entirely (it equals
  the next round's opened a/b, or a fri_last_codeword slot; iop/fri.py
  _verify derives it). Digest items also moved from 128-char hex to
  88-char canonical base64 (digest_to_item) — digests dominate proof
  bytes, and base64 is 1.375 bytes/byte vs hex's 2. The node-hash
  contract is untouched: nodes stay Blake2b-512(left || right)
  (merkle.rs:47-55), leaves stay Blake2b-512 of canonical 16-byte
  encodings. Golden regenerated: ~2x smaller at the golden size; larger
  gains at production sizes (deeper trees).
"""

from __future__ import annotations

import base64
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
    """64-byte digest -> 88-char standard base64 (with padding).

    v3 encoding: digests dominate proof bytes (every multiproof node is
    one), and base64 is 1.375 bytes/byte against hex's 2 — a ~30% cut on
    the digest-heavy items for free. The alphabet (A-Za-z0-9+/=) needs no
    JSON escaping, so serialized transcripts stay canonical compact JSON.
    """
    return base64.b64encode(digest).decode("ascii")


def item_to_digest(item: str) -> bytes:
    if not isinstance(item, str):
        raise ValueError("digest item must be a string")
    if len(item) != 88:
        raise ValueError("expected an 88-char base64 digest item")
    try:
        data = base64.b64decode(item, validate=True)
    except (ValueError, TypeError) as exc:
        raise ValueError("invalid base64 digest item") from exc
    if len(data) != 64:
        raise ValueError("expected a 64-byte digest")
    if base64.b64encode(data).decode("ascii") != item:
        # Reject non-canonical re-encodings (e.g. trailing-bit variants):
        # one digest, one transcript byte-encoding (Fiat-Shamir
        # malleability, same rationale as item_to_felt).
        raise ValueError("non-canonical digest item")
    return data
