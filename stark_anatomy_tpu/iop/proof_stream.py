"""Fiat-Shamir proof stream, byte-compatible with the Rust reference.

Reference: /root/reference/src/iop/types/proof_stream.rs.

Behavioral contract reproduced exactly:
- ordered item list + read cursor; `push` appends (proof_stream.rs:25-27),
  `pull` reads sequentially and errors past the end (proof_stream.rs:29-36,
  OutOfBoundsReadIndexError -> IndexError here);
- serialization is serde_json of the item list (proof_stream.rs:38-49,67-69):
  compact separators, struct-declaration key order. Python's
  ``json.dumps(items, separators=(",", ":"))`` over insertion-ordered dicts
  reproduces those bytes exactly — pinned by the golden byte vector at
  proof_stream.rs:104-108 in tests/test_proof_stream.py;
- ``prover_fiat_shamir`` = SHA-256 of the JSON of ALL items
  (proof_stream.rs:51-56); ``verifier_fiat_shamir`` = SHA-256 of the JSON of
  items[0..read_index] (proof_stream.rs:58-64). Golden digests pinned from
  proof_stream.rs:188-191 and proof_stream.rs:220-223.

The reference's stray ``dbg!`` transcript dumps (proof_stream.rs:53,61) are a
debug leak, intentionally not replicated (SURVEY.md section 5.1).

Items must be JSON-serializable values (dict/list/str/int/bool/None). Field
elements are encoded as decimal strings and hashes as hex strings — JSON
numbers cannot carry 128-bit integers faithfully across parsers
(see utils/encoding.py for the canonical encoders).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, List


class ProofStreamError(Exception):
    """Base error, mirroring the reference's ProofStreamError enum
    (proof_stream.rs:9-15)."""


class OutOfBoundsReadIndexError(ProofStreamError, IndexError):
    """Pull past the end of the transcript (proof_stream.rs:13-14)."""


def serialize_items(items: List[Any]) -> bytes:
    """serde_json::to_vec-compatible bytes (proof_stream.rs:67-69)."""
    return json.dumps(items, separators=(",", ":"), ensure_ascii=False).encode("utf-8")


class ProofStream:
    """Ordered Fiat-Shamir transcript (proof_stream.rs:17-65)."""

    def __init__(self, items: List[Any] | None = None):
        self.items: List[Any] = list(items) if items is not None else []
        self.read_index: int = 0

    def push(self, item: Any) -> None:
        self.items.append(item)

    def pull(self) -> Any:
        if self.read_index >= len(self.items):
            raise OutOfBoundsReadIndexError("Read index is out of bounds")
        value = self.items[self.read_index]
        self.read_index += 1
        return value

    def serialize(self) -> bytes:
        return serialize_items(self.items)

    @classmethod
    def deserialize(cls, data: bytes) -> "ProofStream":
        # Any malformed input maps to ProofStreamError, mirroring the
        # reference's ErrorSerializingProofItems (proof_stream.rs:11-12).
        try:
            items = json.loads(data.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as exc:
            raise ProofStreamError(f"Serialization error: {exc}") from exc
        if not isinstance(items, list):
            raise ProofStreamError("proof must deserialize to an item list")
        return cls(items)

    def prover_fiat_shamir(self) -> bytes:
        """SHA-256 over the full serialized transcript (proof_stream.rs:51-56)."""
        return hashlib.sha256(self.serialize()).digest()

    def verifier_fiat_shamir(self) -> bytes:
        """SHA-256 over the pulled prefix only (proof_stream.rs:58-64)."""
        return hashlib.sha256(serialize_items(self.items[: self.read_index])).digest()

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, ProofStream)
            and self.items == other.items
            and self.read_index == other.read_index
        )

    def __len__(self) -> int:
        return len(self.items)
