"""End-to-end STARK: prove + verify a Rescue-Prime trace, soundness probes."""

import numpy as np
import pytest

from stark_anatomy_tpu.iop.stark import Stark, default_config
from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir
from stark_anatomy_tpu.ops.field import PRIME


@pytest.fixture(scope="module")
def setup():
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    inp = 228894434762048332457318
    trace = rp.trace(inp)
    output = rp.hash(inp)
    boundary = air.boundary_constraints(output)
    proof = stark.prove(trace, boundary, randomizer_seed=b"test-seed")
    return rp, air, stark, trace, output, boundary, proof


def test_domain_parameters(setup):
    _, _, stark, *_ = setup
    assert stark.trace_length == 33  # 32 rows per permutation + 1
    assert stark.omicron_domain_length == 64  # 33 + 8 randomizers -> 64
    assert stark.transition_quotient_degree == 4 * 63 - 32
    assert stark.fri_domain_length == 1024
    assert stark.expansion_shift == 16


def test_honest_proof_verifies(setup):
    _, _, stark, _, _, boundary, proof = setup
    assert stark.verify(proof, boundary)


def test_proof_is_deterministic_with_seed(setup):
    # Deterministic mode: an explicit randomizer_seed pins every byte.
    rp, air, stark, trace, _, boundary, proof = setup
    assert stark.prove(trace, boundary, randomizer_seed=b"test-seed") == proof


def test_zero_knowledge_blinding(setup):
    # ZK surface: distinct seeds (and the fresh-entropy default) give
    # proofs sharing no transcript randomness — different bytes — while
    # all of them verify against the same public boundary.
    rp, air, stark, trace, _, boundary, proof = setup
    p_other = stark.prove(trace, boundary, randomizer_seed=b"other-seed")
    assert p_other != proof
    assert stark.verify(p_other, boundary)
    p_fresh1 = stark.prove(trace, boundary)  # default: os.urandom entropy
    p_fresh2 = stark.prove(trace, boundary)
    assert p_fresh1 != p_fresh2
    assert stark.verify(p_fresh1, boundary)
    assert stark.verify(p_fresh2, boundary)


def test_wrong_output_rejected(setup):
    rp, air, stark, _, output, _, proof = setup
    bad_boundary = air.boundary_constraints((output + 1) % PRIME)
    assert not stark.verify(proof, bad_boundary)


def test_wrong_trace_rejected(setup):
    rp, air, stark, trace, output, boundary, _ = setup
    bad_trace = trace.copy()
    bad_trace[13][0] = (int(bad_trace[13][0]) + 1) % PRIME
    proof = stark.prove(bad_trace, boundary)
    assert not stark.verify(proof, boundary)


def test_tampered_proof_bytes_rejected(setup):
    _, _, stark, _, _, boundary, proof = setup
    # Flip a byte in the middle; must reject (False) or at worst raise
    # inside and be converted to False — never accept.
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 0x55
    assert not stark.verify(bytes(bad), boundary)
    assert not stark.verify(b"not a proof", boundary)


def test_chain_proof():
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=2)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    inp = 42
    trace = rp.trace(inp, chain_length=2)
    boundary = air.boundary_constraints(rp.chain_output(inp, 2))
    proof = stark.prove(trace, boundary)
    assert stark.verify(proof, boundary)


def test_default_config_shape():
    stark = default_config(chain_length=1, num_colinearity_checks=2)
    assert stark.num_registers == 2
    assert stark.trace_length == 33


def test_bytes_trace_path_identical_proof():
    # The (T, w, 16) uint8 bulk path must produce byte-identical proofs
    # to the Python-int path, and the periodic constant columns must
    # tile into the same per-row values constant_columns reports.
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    inp = 777
    boundary = air.boundary_constraints(rp.hash(inp))
    p1 = stark.prove(rp.trace(inp), boundary, randomizer_seed=b"s")
    stark2 = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    p2 = stark2.prove(rp.trace_bytes(inp), boundary, randomizer_seed=b"s")
    assert p1 == p2
    assert stark.verify(p2, boundary)
    # periodic columns tile into constant_columns
    o = stark.omicron_domain_length
    period, pcols = air.periodic_columns()
    cols = air.constant_columns(o)
    assert o % period == 0
    for pc, col in zip(pcols, cols):
        assert col == [pc[t % period] for t in range(o)]


def test_periodic_interpolants_match_columns():
    # eval_periodic_at(omicron^t) must reproduce the raw column values —
    # the identity the succinct verifier relies on (iop/stark.py).
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    o = stark.omicron_domain_length
    cols = air.constant_columns(o)
    for t in list(range(0, o, 7)) + [o - 1]:
        x = pow(stark.omicron, t, PRIME)
        vals = stark.eval_periodic_at(x)
        assert vals == [col[t] for col in cols]


def test_checkpoint_resume(tmp_path):
    # A checkpointed prove writes a pre-FRI snapshot; a fresh Stark with
    # only the checkpoint produces the identical proof without the trace.
    from stark_anatomy_tpu.utils import telemetry

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    inp = 31337
    boundary = air.boundary_constraints(rp.hash(inp))
    trace = rp.trace(inp)
    p1 = stark.prove(trace, boundary, randomizer_seed=b"ck", checkpoint_dir=str(tmp_path))
    telemetry.reset()
    stark2 = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    p2 = stark2.prove(trace, boundary, randomizer_seed=b"ck", checkpoint_dir=str(tmp_path))
    assert p2 == p1
    # The resumed run must have skipped the pre-FRI phases entirely.
    phases = telemetry.report()
    assert "prove.fri" in phases
    assert "prove.trace-lde" not in phases
    # A mismatched boundary must NOT resume from the stale checkpoint.
    other_boundary = air.boundary_constraints((rp.hash(inp) + 1) % PRIME)
    p3 = stark2.prove(
        rp.trace(inp), other_boundary, randomizer_seed=b"ck",
        checkpoint_dir=str(tmp_path),
    )
    assert not stark2.verify(p3, boundary)


def test_offload_path_identical_proof(monkeypatch):
    # Forcing host-offload (tiny threshold) must not change proof bytes.
    monkeypatch.setenv("STARK_ANATOMY_OFFLOAD_N", "1")
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    inp = 5150
    boundary = air.boundary_constraints(rp.hash(inp))
    offloaded = stark.prove(rp.trace(inp), boundary, randomizer_seed=b"o")
    monkeypatch.delenv("STARK_ANATOMY_OFFLOAD_N")
    stark2 = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    resident = stark2.prove(rp.trace(inp), boundary, randomizer_seed=b"o")
    assert offloaded == resident
    assert stark.verify(offloaded, boundary)


def test_fused_path_identical_proof(monkeypatch):
    # The fused phase mega-jits (forced on via a tiny threshold) must
    # produce byte-identical proofs to the eager per-op path.
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    boundary = air.boundary_constraints(rp.hash(777))
    monkeypatch.setenv("STARK_ANATOMY_FUSE_MIN", "1")
    fused = Stark(air, expansion_factor=4, num_colinearity_checks=2).prove(
        rp.trace(777), boundary, randomizer_seed=b"f"
    )
    monkeypatch.setenv("STARK_ANATOMY_FUSE_MIN", str(1 << 60))
    eager = Stark(air, expansion_factor=4, num_colinearity_checks=2).prove(
        rp.trace(777), boundary, randomizer_seed=b"f"
    )
    assert fused == eager
    assert Stark(air, expansion_factor=4, num_colinearity_checks=2).verify(
        fused, boundary
    )


def test_big_chunked_path_identical_proof(monkeypatch):
    # The chunked big-domain prover (Stark._prove_big, normally F >= 2^26
    # where the fused mega-jits exceed HBM) must produce byte-identical
    # proofs to the standard path — forced on via tiny thresholds. The
    # chunk length is dropped to make several chunks at toy size.
    from stark_anatomy_tpu.iop import stark as stark_mod

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    boundary = air.boundary_constraints(rp.hash(777))
    want = Stark(air, expansion_factor=4, num_colinearity_checks=2).prove(
        rp.trace(777), boundary, randomizer_seed=b"big"
    )
    monkeypatch.setattr(stark_mod, "_BIG_F_MIN", 1)
    monkeypatch.setattr(stark_mod, "_BIG_CHUNK", 256)  # F=1024 -> 4 chunks
    got = Stark(air, expansion_factor=4, num_colinearity_checks=2).prove(
        rp.trace(777), boundary, randomizer_seed=b"big"
    )
    assert got == want
    assert Stark(air, expansion_factor=4, num_colinearity_checks=2).verify(
        got, boundary
    )
    # Bytes-trace (bulk) input through the big path too.
    got_bytes = Stark(air, expansion_factor=4, num_colinearity_checks=2).prove(
        rp.trace_bytes(777, chain_length=1), boundary, randomizer_seed=b"big"
    )
    assert got_bytes == want


def test_security_accounting_profiles():
    # VERDICT r3 item 2: a stated, tested soundness derivation. The FRI
    # query term is q*log2(blowup) (+ grinding) conjectured and half that
    # proven; security_level() is the weakest term.
    from stark_anatomy_tpu.iop.stark import PROFILES

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)

    s80 = Stark.from_profile("production-80", air)
    terms = s80.security_terms()
    assert terms["fri_queries"] == 32 * 2 + 16 == 80
    assert s80.fri.security_bits(conjectured=False) == 32 + 16 == 48
    assert s80.security_level() == 80  # fri term binds at this size
    assert s80.security_level(conjectured=False) == 48

    legacy = Stark(air, expansion_factor=4, num_colinearity_checks=16)
    assert legacy.security_level() == 32
    assert legacy.security_level(conjectured=False) == 16

    s128 = Stark.from_profile("production-128", air)
    assert s128.security_terms()["fri_queries"] == 56 * 2 + 16 == 128

    # Honesty pin (docs/SOUNDNESS.md §3): at PRODUCTION domain sizes the
    # overall conjectured level of production-128 is capped by the
    # fold_sampling union term (~log2(p / (F * rounds))), not the query
    # count — constructing the Stark is cheap (no proving happens here).
    big = Stark.from_profile(
        "production-128", RescuePrimeAir(rp, chain_length=32760)
    )
    assert big.fri_domain_length == 1 << 24
    assert big.security_terms()["fri_queries"] == 128
    assert big.security_level() == min(big.security_terms().values()) == 99

    # Every profile's stated (conjectured, proven) pair matches the formula.
    for name, params in PROFILES.items():
        conj, prov = params["_bits"]
        s = Stark.from_profile(name, air)
        assert s.security_terms()["fri_queries"] == conj, name
        assert s.fri.security_bits(conjectured=False) == prov, name

    # Overrides pass through.
    s = Stark.from_profile("test", air, num_colinearity_checks=3)
    assert s.num_colinearity_checks == 3


def test_grinding_proof_roundtrip():
    # A ground STARK proof verifies; the same parameters without grinding
    # reject it (transcript grammar differs by the pow item).
    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2, grinding_bits=5)
    trace = rp.trace(99)
    boundary = air.boundary_constraints(rp.hash(99))
    proof = stark.prove(trace, boundary, randomizer_seed=b"grind")
    assert stark.verify(proof, boundary)
    plain = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    assert not plain.verify(proof, boundary)
