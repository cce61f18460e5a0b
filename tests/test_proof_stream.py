"""ProofStream: byte-compatibility with the Rust reference's serde_json +
SHA-256 Fiat-Shamir scheme (/root/reference/src/iop/types/proof_stream.rs).
"""

import pytest

from stark_anatomy_tpu.iop.proof_stream import (
    OutOfBoundsReadIndexError,
    ProofStream,
    serialize_items,
)

# Items matching the reference's TestStruct transcript (proof_stream.rs:93-98).
ITEMS = [{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 4}, {"a": 4, "b": 5}]

# Golden serialized bytes (proof_stream.rs:104-108).
GOLDEN_BYTES = bytes(
    [
        91, 123, 34, 97, 34, 58, 49, 44, 34, 98, 34, 58, 50, 125, 44, 123, 34, 97,
        34, 58, 50, 44, 34, 98, 34, 58, 51, 125, 44, 123, 34, 97, 34, 58, 51, 44,
        34, 98, 34, 58, 52, 125, 44, 123, 34, 97, 34, 58, 52, 44, 34, 98, 34, 58,
        53, 125, 93,
    ]
)

# Golden SHA-256 digests (proof_stream.rs:188-191 and :220-223).
GOLDEN_PROVER_FS = bytes(
    [
        201, 176, 198, 41, 77, 42, 190, 176, 93, 90, 51, 57, 129, 77, 162, 158, 96,
        4, 167, 126, 67, 85, 94, 5, 241, 172, 158, 164, 239, 74, 93, 192,
    ]
)
GOLDEN_VERIFIER_FS = bytes(
    [
        188, 90, 181, 158, 133, 61, 76, 0, 246, 85, 241, 132, 91, 7, 84, 157, 111,
        193, 104, 105, 236, 15, 89, 163, 86, 118, 20, 24, 98, 195, 116, 174,
    ]
)


def make_stream():
    ps = ProofStream()
    for item in ITEMS:
        ps.push(item)
    return ps


def test_serialize_golden_bytes():
    assert serialize_items(ITEMS) == GOLDEN_BYTES
    assert make_stream().serialize() == GOLDEN_BYTES


def test_prover_fiat_shamir_golden():
    assert make_stream().prover_fiat_shamir() == GOLDEN_PROVER_FS


def test_verifier_fiat_shamir_golden():
    ps = make_stream()
    ps.pull()
    ps.pull()
    ps.pull()
    assert ps.verifier_fiat_shamir() == GOLDEN_VERIFIER_FS


def test_verifier_prefix_semantics():
    # verifier digest == prover digest exactly when everything was pulled
    ps = make_stream()
    for _ in ITEMS:
        ps.pull()
    assert ps.verifier_fiat_shamir() == ps.prover_fiat_shamir()


def test_round_trip():
    # proof_stream.rs:112-129
    ps = make_stream()
    again = ProofStream.deserialize(ps.serialize())
    assert again == ps
    assert again.read_index == 0


def test_round_trip_complex():
    # proof_stream.rs:131-164: nested structures survive serialization
    ps = ProofStream()
    for k in range(4):
        ps.push({"a": [1 + k, 2 + k, 3 + k, 4 + k], "b": 5 + k, "c": {"a": 6, "b": 7}})
    assert ProofStream.deserialize(ps.serialize()) == ps


def test_pull_past_end_raises():
    # proof_stream.rs:29-36
    ps = ProofStream()
    ps.push({"a": 1})
    ps.pull()
    with pytest.raises(OutOfBoundsReadIndexError):
        ps.pull()


def test_pull_order():
    ps = make_stream()
    assert [ps.pull() for _ in ITEMS] == ITEMS
