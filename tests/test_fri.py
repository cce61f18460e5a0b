"""FRI prove/verify round trips and soundness probes."""

import jax.numpy as jnp
import numpy as np
import pytest

from stark_anatomy_tpu.iop.fri import Fri, colinearity_check, fold
from stark_anatomy_tpu.iop.proof_stream import ProofStream
from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops import ntt as nttmod
from stark_anatomy_tpu.ops.field import GENERATOR, PRIME, finv, primitive_root_of_unity
from stark_anatomy_tpu.ops.limbs import ints_to_limbs, limbs_to_ints


def _codeword_of_degree(num_coeffs: int, domain_length: int, offset: int, seed=0):
    """Evaluations of a random degree < num_coeffs polynomial on the coset."""
    rng = np.random.default_rng(seed)
    coeffs = [int(x) for x in rng.integers(1, 1 << 62, size=num_coeffs)]
    cm = fj.to_mont(jnp.asarray(ints_to_limbs(coeffs)))
    return nttmod.coset_evaluate(cm, domain_length, offset)


def _fri():
    return Fri(
        offset=GENERATOR,
        domain_length=256,
        expansion_factor=4,
        num_colinearity_tests=8,
    )


def test_fold_matches_host_oracle():
    n = 64
    offset = GENERATOR
    omega = primitive_root_of_unity(n)
    rng = np.random.default_rng(1)
    values = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    alpha = 123456789123456789
    cm = fj.to_mont(jnp.asarray(ints_to_limbs(values)))
    folded = limbs_to_ints(np.asarray(fj.from_mont(fold(cm, alpha, offset, omega))))
    inv2 = finv(2)
    for i in range(n // 2):
        d = offset * pow(omega, i, PRIME) % PRIME
        au = alpha * finv(d) % PRIME
        want = inv2 * ((1 + au) * values[i] + (1 - au) * values[i + n // 2]) % PRIME
        assert int(folded[i]) == want, i


def test_prove_verify_round_trip():
    fri = _fri()
    codeword = _codeword_of_degree(64, 256, fri.offset)
    ps = ProofStream()
    fri.prove(codeword, ps)
    # Serialize -> deserialize (the proof travels as bytes).
    verifier_ps = ProofStream.deserialize(ps.serialize())
    ok, points = fri.verify(verifier_ps)
    assert ok
    # Returned top-level points must match the committed codeword.
    values = limbs_to_ints(np.asarray(fj.from_mont(codeword)))
    assert points
    for idx, val in points:
        assert int(values[idx]) == val


def test_high_degree_codeword_rejected():
    fri = _fri()
    # Degree bound is 256/4 = 64 coefficients; use 128 -> must fail.
    codeword = _codeword_of_degree(128, 256, fri.offset, seed=3)
    ps = ProofStream()
    fri.prove(codeword, ps)
    ok, _ = fri.verify(ProofStream.deserialize(ps.serialize()))
    assert not ok


def test_tampered_value_rejected():
    fri = _fri()
    codeword = _codeword_of_degree(64, 256, fri.offset, seed=4)
    ps = ProofStream()
    fri.prove(codeword, ps)
    # Flip one opened value in the first query round.
    for item in ps.items:
        if isinstance(item, dict) and "fri_points" in item:
            a = int(item["fri_points"][0][0])
            item["fri_points"][0][0] = str((a + 1) % PRIME)
            break
    ok, _ = fri.verify(ProofStream.deserialize(ps.serialize()))
    assert not ok


def test_tampered_root_rejected():
    fri = _fri()
    codeword = _codeword_of_degree(64, 256, fri.offset, seed=5)
    ps = ProofStream()
    fri.prove(codeword, ps)
    for item in ps.items:
        if isinstance(item, dict) and "fri_root" in item:
            item["fri_root"] = "00" * 64
            break
    ok, _ = fri.verify(ProofStream.deserialize(ps.serialize()))
    assert not ok


def test_colinearity_check():
    # y = 3x + 5 over F_p.
    pts = [(x, (3 * x + 5) % PRIME) for x in (2, 71, 90001)]
    assert colinearity_check(pts)
    bad = [pts[0], pts[1], (pts[2][0], (pts[2][1] + 1) % PRIME)]
    assert not colinearity_check(bad)


def test_num_rounds_bounds():
    fri = _fri()
    # Folding stops while 4*tests < length and length > expansion.
    assert fri.num_rounds == 3  # 256 -> 128 -> 64 -> 32 (stop: 4*8 !< 32)


def test_host_tail_matches_device_rounds(monkeypatch):
    # The host-tail rounds (STARK_ANATOMY_FRI_HOST_N) must produce the
    # exact transcript bytes of the all-device path.
    import jax.numpy as jnp

    from stark_anatomy_tpu.iop.proof_stream import ProofStream
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import ntt as nttmod
    from stark_anatomy_tpu.ops.limbs import ints_to_limbs

    n, expansion = 1 << 10, 4
    fri = Fri(offset=GENERATOR, domain_length=n, expansion_factor=expansion,
              num_colinearity_tests=4)
    rng = np.random.default_rng(23)
    coeffs = [int(x) for x in rng.integers(0, 1 << 60, size=n // expansion)]
    cw = nttmod.coset_evaluate(
        fj.to_mont(jnp.asarray(ints_to_limbs(coeffs))), n, GENERATOR
    )

    monkeypatch.setenv("STARK_ANATOMY_FRI_HOST_N", "0")
    ps_dev = ProofStream()
    idx_dev = fri.prove(cw, ps_dev)
    monkeypatch.setenv("STARK_ANATOMY_FRI_HOST_N", str(1 << 30))
    ps_host = ProofStream()
    idx_host = fri.prove(cw, ps_host)
    assert idx_dev == idx_host
    assert ps_dev.serialize() == ps_host.serialize()
    ok, pts = fri.verify(ProofStream.deserialize(ps_host.serialize()))
    assert ok and pts


def test_grinding_round_trip_and_rejection():
    # Grinding (VERDICT r3 item 2): the pow nonce enters the transcript
    # between the last codeword and index sampling. Honest proof verifies;
    # any nonce perturbation both fails the pow check AND shifts the
    # sampled indices, so verification must reject.
    import json

    fri = Fri(
        offset=GENERATOR,
        domain_length=256,
        expansion_factor=4,
        num_colinearity_tests=8,
        grinding_bits=6,
    )
    codeword = _codeword_of_degree(64, 256, fri.offset)
    ps = ProofStream()
    fri.prove(codeword, ps)
    raw = ps.serialize()
    assert b"pow_nonce" in raw
    ok, _ = fri.verify(ProofStream.deserialize(raw))
    assert ok

    # A verifier configured WITHOUT grinding must reject this transcript
    # (it reads the nonce item as something else), and vice versa.
    no_grind = Fri(
        offset=GENERATOR,
        domain_length=256,
        expansion_factor=4,
        num_colinearity_tests=8,
    )
    ok, _ = no_grind.verify(ProofStream.deserialize(raw))
    assert not ok

    # Tamper: bump the nonce.
    items = json.loads(raw)
    for it in items:
        if "pow_nonce" in it:
            it["pow_nonce"] = str(int(it["pow_nonce"]) + 1)
    tampered = json.dumps(items).encode()
    ok, _ = fri.verify(ProofStream.deserialize(tampered))
    assert not ok


def test_security_bits_formula():
    fri = Fri(
        offset=GENERATOR,
        domain_length=256,
        expansion_factor=4,
        num_colinearity_tests=8,
        grinding_bits=6,
    )
    assert fri.security_bits() == 8 * 2 + 6
    assert fri.security_bits(conjectured=False) == 8 * 1 + 6
    wide = Fri(
        offset=GENERATOR,
        domain_length=4096,
        expansion_factor=16,
        num_colinearity_tests=20,
    )
    assert wide.security_bits() == 20 * 4
    assert wide.security_bits(conjectured=False) == 20 * 2


def test_fused_fri_round_identical_transcript(monkeypatch):
    # VERDICT r3 item 3a: the fused fold+from_mont+commit round (one
    # dispatch per device round) must emit byte-identical transcripts to
    # the eager fold -> from_mont -> commit sequence.
    monkeypatch.setenv("STARK_ANATOMY_FRI_HOST_N", "256")
    fri = Fri(
        offset=GENERATOR,
        domain_length=4096,
        expansion_factor=4,
        num_colinearity_tests=8,
    )
    codeword = _codeword_of_degree(1024, 4096, fri.offset, seed=9)

    monkeypatch.setenv("STARK_ANATOMY_FUSE_MIN", "1")
    ps_fused = ProofStream()
    fri.prove(codeword, ps_fused)

    monkeypatch.setenv("STARK_ANATOMY_FUSE_MIN", str(1 << 60))
    ps_eager = ProofStream()
    fri.prove(codeword, ps_eager)

    assert ps_fused.serialize() == ps_eager.serialize()
    ok, _ = fri.verify(ProofStream.deserialize(ps_fused.serialize()))
    assert ok


def test_fri_chunked_commit_branch_bit_identical(monkeypatch):
    # The >= _CHUNKED_COMMIT_MIN branch of Fri._commit_one (streamed
    # host-resident commit, used at F >= 2^26 on hardware) must produce
    # the same transcript bytes as the fused commit — forced on here.
    from stark_anatomy_tpu.iop import fri as fri_mod
    from stark_anatomy_tpu.iop.proof_stream import ProofStream
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import ntt as nttmod
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    import jax.numpy as jnp
    import numpy as np

    n = 1 << 13
    rng = np.random.default_rng(5)
    coeffs = fj.to_mont(jnp.asarray(random_felt_limbs(rng, (n // 4,))))
    cw = nttmod.coset_evaluate(coeffs, n, 3)
    fri = fri_mod.Fri(
        offset=3, domain_length=n, expansion_factor=4, num_colinearity_tests=4
    )
    ps = ProofStream()
    fri.prove(cw, ps)
    want = ps.serialize()
    # chunk_leaves floor is 2048, so a 2^13 codeword (2^12 pair leaves)
    # splits into 2 chunks once the threshold is forced down.
    monkeypatch.setattr(fri_mod, "_CHUNKED_COMMIT_MIN", 1 << 13)
    ps2 = ProofStream()
    fri.prove(cw, ps2)
    got = ps2.serialize()
    assert got == want
    ok, _ = fri.verify(ProofStream.deserialize(got))
    assert ok
