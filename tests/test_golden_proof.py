"""Golden-bytes pin of the complete proof grammar (VERDICT round 1, item 6).

tests/golden/proof_rescue_chain1.json is a full serialized proof of the
flagship Rescue-Prime AIR (chain_length=1, expansion 4, 2 colinearity
checks) proved with the deterministic seed b"golden-v1". The prover is
deterministic given (trace, boundary, randomizer_seed), so ANY drift in
the proof encoding — item ordering, field-element/digest item encodings,
Fiat-Shamir transcript bytes, Merkle leaf hashing, FRI fold semantics —
changes the bytes and fails test_regenerated_proof_matches_golden_bytes.

The grammar (item-kind sequence) and per-item-kind encodings are asserted
separately so a failure localizes: a grammar change, an encoding change,
or a value change. The intentional divergence from the reference's serde
encodings is documented in utils/encoding.py.
"""

import json
import os
import re

import pytest

from stark_anatomy_tpu.iop.stark import Stark
from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir
from stark_anatomy_tpu.ops.field import PRIME

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "proof_rescue_chain1.json")
INPUT = 20260817
SEED = b"golden-v1"

_DEC = re.compile(r"^(0|[1-9][0-9]*)$")
#: 64-byte digest as canonical standard base64: 64 = 21*3 + 1 bytes ->
#: 86 alphabet chars + "==" padding, 88 chars total.
_B64_DIGEST = re.compile(r"^[A-Za-z0-9+/]{86}==$")


@pytest.fixture(scope="module")
def golden_bytes():
    with open(GOLDEN, "rb") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def setup():
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    boundary = air.boundary_constraints(rp.hash(INPUT))
    return rp, stark, boundary


def test_checked_in_proof_verifies(setup, golden_bytes):
    _, stark, boundary = setup
    assert stark.verify(golden_bytes, boundary)


def test_regenerated_proof_matches_golden_bytes(setup, golden_bytes):
    rp, stark, boundary = setup
    proof = stark.prove(rp.trace(INPUT), boundary, randomizer_seed=SEED)
    assert proof == golden_bytes, (
        "proof encoding drifted from tests/golden/proof_rescue_chain1.json; "
        "if the grammar change is INTENTIONAL, regenerate the golden file "
        "and document the break"
    )


def test_grammar_item_kind_sequence(golden_bytes):
    items = json.loads(golden_bytes)
    kinds = [next(iter(it)) for it in items]
    num_rounds = 7  # F=1024, expansion 4, 2 checks
    expected = (
        ["bq_root", "zk_root"]
        + ["fri_root"] * num_rounds
        + ["fri_last_codeword"]
        + ["fri_points"] * (num_rounds - 1)
        + ["fri_multiproofs"]
        + ["bq_leaves", "bq_multiproof", "zk_leaves", "zk_multiproof"]
    )
    assert kinds == expected


def test_item_kind_encodings(golden_bytes):
    # Every digest is an 88-char canonical base64 string (Blake2b-512,
    # grammar v3); every field element is a canonical decimal string < p;
    # every opening is [index, ...] with in-range indices. One pass over
    # the whole proof.
    items = json.loads(golden_bytes)
    f = 1024

    def check_felt(s):
        assert isinstance(s, str) and _DEC.match(s), f"bad felt item {s!r}"
        assert int(s) < PRIME

    def check_digest(s):
        assert isinstance(s, str) and _B64_DIGEST.match(s), f"bad digest item {s!r}"

    for it in items:
        kind, val = next(iter(it.items()))
        if kind in ("bq_root", "zk_root", "fri_root"):
            check_digest(val)
        elif kind == "fri_last_codeword":
            for v in val:
                check_felt(v)
        elif kind == "fri_points":
            # Grammar v3: (a, b) pairs only — the fold value c is the
            # next round's own opened a/b (iop/fri.py), never on wire.
            for pair in val:
                assert len(pair) == 2
                for v in pair:
                    check_felt(v)
        elif kind == "fri_multiproofs":
            assert len(val) == 6  # one batch opening per tree 0..rounds-2
            for nodes in val:
                for d in nodes:
                    check_digest(d)
        elif kind in ("bq_leaves", "zk_leaves"):
            for idx, v in val:
                assert 0 <= idx < f
                for x in v if isinstance(v, list) else [v]:
                    check_felt(x)
        elif kind in ("bq_multiproof", "zk_multiproof"):
            for d in val:
                check_digest(d)
        else:  # pragma: no cover - grammar test catches unknown kinds
            raise AssertionError(f"unknown item kind {kind}")


def test_serialization_is_compact_canonical_json(golden_bytes):
    # The transcript hashes serialized bytes; the serialization must be
    # the canonical compact form (no whitespace) or Fiat-Shamir would be
    # ambiguous across encoders.
    items = json.loads(golden_bytes)
    assert json.dumps(items, separators=(",", ":")).encode() == golden_bytes
