"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins one hardening fix:
- canonical transcript item encodings (no int()-accepted aliases);
- degenerate FRI round counts rejected at construction;
- Merkle path lengths pinned to the committed tree height by verifiers;
- checkpoint resume refuses a stale snapshot when the trace or the
  randomizer seed changed (shapes/boundary alone no longer match).
"""

import json

import pytest

from stark_anatomy_tpu.iop.fri import Fri
from stark_anatomy_tpu.utils.encoding import item_to_digest, item_to_felt


def test_item_to_felt_rejects_noncanonical():
    assert item_to_felt("7") == 7
    assert item_to_felt("0") == 0
    for bad in ["+7", " 7", "7 ", "007", "1_0", "0x7", "", "-1", 7]:
        with pytest.raises((ValueError, TypeError)):
            item_to_felt(bad)


def test_item_to_digest_rejects_noncanonical():
    import base64

    digest = bytes.fromhex("ab" * 64)
    item = base64.b64encode(digest).decode()  # 88-char canonical base64 (v3)
    assert item_to_digest(item) == digest
    with pytest.raises(ValueError):
        item_to_digest(digest.hex())  # v2 hex encoding no longer accepted
    with pytest.raises(ValueError):
        item_to_digest(item[:-4])  # truncated
    with pytest.raises(ValueError):
        item_to_digest(item[:-1] + "!")  # non-alphabet char
    # Trailing-bit alias: 64 bytes occupy 512 of the 516 bits of the 86
    # encoded sextets, so the last sextet's low 4 bits are padding that a
    # lenient decoder ignores — flipping one yields a DIFFERENT transcript
    # byte-encoding of the SAME digest; must be rejected.
    alphabet = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    )
    v = alphabet.index(item[85])
    aliased = item[:85] + alphabet[v ^ 1] + "=="
    assert base64.b64decode(aliased) == digest  # lenient decoder collapses it
    with pytest.raises(ValueError):
        item_to_digest(aliased)


def test_fri_degenerate_round_counts_rejected():
    # 0 rounds: domain == expansion factor.
    with pytest.raises(ValueError, match="round"):
        Fri(offset=7, domain_length=4, expansion_factor=4, num_colinearity_tests=2)
    # 1 round: the check count stops the fold immediately; the query loop
    # would emit nothing and Fri.verify would accept a contentless proof.
    with pytest.raises(ValueError, match="round"):
        Fri(offset=7, domain_length=64, expansion_factor=4, num_colinearity_tests=16)
    # A healthy config still constructs.
    Fri(offset=7, domain_length=64, expansion_factor=4, num_colinearity_tests=2)


def _small_stark():
    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    return rp, Stark(air, expansion_factor=4, num_colinearity_checks=2)


@pytest.fixture(scope="module")
def proved():
    """One shared (rp, stark, proof, boundary) — proving dominates module time."""
    rp, stark = _small_stark()
    inp = 909
    boundary = stark.air.boundary_constraints(rp.hash(inp))
    proof = stark.prove(rp.trace(inp), boundary)
    return rp, stark, proof, boundary


def test_verifier_rejects_truncated_merkle_paths(proved):
    rp, stark, proof, boundary = proved
    items = json.loads(proof)
    # Drop one node from the boundary-quotient multiproof: the verifier
    # must consume EXACTLY the planned node list (iop/merkle.py
    # verify_multiproof), so shorter, longer, and reordered lists all
    # reject.
    for it in items:
        if isinstance(it, dict) and "bq_multiproof" in it:
            full = list(it["bq_multiproof"])
            it["bq_multiproof"] = full[:-1]
            break
    tampered = json.dumps(items, separators=(",", ":")).encode()
    assert not stark.verify(tampered, boundary)
    it["bq_multiproof"] = full + [full[0]]
    assert not stark.verify(json.dumps(items, separators=(",", ":")).encode(), boundary)
    it["bq_multiproof"] = [full[1], full[0]] + full[2:]
    assert not stark.verify(json.dumps(items, separators=(",", ":")).encode(), boundary)


def test_fri_verify_returns_false_on_malformed_paths(proved):
    rp, stark, proof, boundary = proved
    items = json.loads(proof)
    for it in items:
        if isinstance(it, dict) and "fri_multiproofs" in it:
            # Garbage digest encoding inside a FRI multiproof: direct Fri
            # users must see a clean False, not a ValueError.
            it["fri_multiproofs"][0][0] = "zz"
            break
    from stark_anatomy_tpu.iop.proof_stream import ProofStream

    ps = ProofStream.deserialize(
        json.dumps(items, separators=(",", ":")).encode()
    )
    ps.pull()  # bq_root
    ps.pull()  # zk_root
    ok, points = stark.fri.verify(ps)
    assert ok is False and points == []


def test_checkpoint_refuses_stale_trace_and_seed(tmp_path):
    rp, stark = _small_stark()
    d = str(tmp_path)
    tr1 = rp.trace(31)
    b1 = stark.air.boundary_constraints(rp.hash(31))
    p1 = stark.prove(tr1, b1, randomizer_seed=b"pin", checkpoint_dir=d)
    # resume: identical
    assert stark.prove(tr1, b1, randomizer_seed=b"pin", checkpoint_dir=d) == p1
    # Different randomizer seed, same trace/boundary/shapes: the stale
    # snapshot must be refused and the fresh proof must still verify.
    p2 = stark.prove(tr1, b1, randomizer_seed=b"fresh", checkpoint_dir=d)
    assert p2 != p1
    assert stark.verify(p2, b1)


def test_mid_fri_kill_resume(tmp_path, monkeypatch):
    # A crash mid-FRI must resume from the per-round snapshots: completed
    # folds are skipped and the resumed proof is byte-identical to an
    # uninterrupted run. Force the all-device FRI (no host tail) — the
    # fault is injected into the device fold, which at this tiny domain
    # would otherwise never run (bytes are tail-independent, pinned by
    # test_fri.py::test_host_tail_matches_device_rounds).
    import stark_anatomy_tpu.iop.fri as frimod

    monkeypatch.setenv("STARK_ANATOMY_FRI_HOST_N", "0")
    rp, stark = _small_stark()
    inp = 4711
    b = stark.air.boundary_constraints(rp.hash(inp))
    tr = rp.trace(inp)
    p_ref = stark.prove(tr, b, randomizer_seed=b"kr")  # no checkpointing

    real_fold = frimod.fold
    calls = {"n": 0}

    def crashing_fold(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash mid-FRI")
        return real_fold(*a, **k)

    monkeypatch.setattr(frimod, "fold", crashing_fold)
    with pytest.raises(RuntimeError, match="simulated crash"):
        stark.prove(tr, b, randomizer_seed=b"kr", checkpoint_dir=str(tmp_path))
    # The committed rounds before the crash were snapshotted.
    assert (tmp_path / "stark-fri-r0.npz").exists()
    assert (tmp_path / "stark-fri-r2.npz").exists()

    resumed = {"n": 0}

    def counting_fold(*a, **k):
        resumed["n"] += 1
        return real_fold(*a, **k)

    monkeypatch.setattr(frimod, "fold", counting_fold)
    p2 = stark.prove(tr, b, randomizer_seed=b"kr", checkpoint_dir=str(tmp_path))
    assert p2 == p_ref
    assert stark.verify(p2, b)
    # Rounds 0..2 replayed from disk: exactly one catch-up fold (of the
    # last snapshot) plus the live folds for the remaining rounds.
    rounds = stark.fri.num_rounds
    assert resumed["n"] == rounds - 3


def test_big_path_checkpoint_resume_identical(tmp_path, monkeypatch):
    # The chunked big-domain prover must checkpoint and RESUME through the
    # chunked re-commit path (host-resident quotients) with identical
    # bytes — forced on at toy size.
    from stark_anatomy_tpu.iop import stark as stark_mod
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    boundary = air.boundary_constraints(rp.hash(31337))
    trace = rp.trace(31337)
    monkeypatch.setattr(stark_mod, "_BIG_F_MIN", 1)
    monkeypatch.setattr(stark_mod, "_BIG_CHUNK", 256)
    stark = stark_mod.Stark(air, expansion_factor=4, num_colinearity_checks=2)
    d = str(tmp_path)
    p1 = stark.prove(trace, boundary, randomizer_seed=b"bigck", checkpoint_dir=d)
    # Second call resumes from the pre-FRI snapshot (chunked re-commit).
    stark2 = stark_mod.Stark(air, expansion_factor=4, num_colinearity_checks=2)
    p2 = stark2.prove(trace, boundary, randomizer_seed=b"bigck", checkpoint_dir=d)
    assert p1 == p2
    assert stark.verify(p1, boundary)
