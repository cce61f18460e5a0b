"""NTT / LDE / polynomial multiply vs exact host oracles."""

import numpy as np
import pytest

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops import ntt as nt
from stark_anatomy_tpu.ops.field import PRIME, finv, primitive_root_of_unity
from stark_anatomy_tpu.ops.limbs import ints_to_limbs, limbs_to_ints, random_felt_limbs
from stark_anatomy_tpu.ops.poly import Polynomial

RNG = np.random.default_rng(0xBEEF)


def to_mont_arr(ints):
    return fj.to_mont(ints_to_limbs(ints))


def from_mont_ints(arr):
    return [int(v) for v in limbs_to_ints(np.asarray(fj.from_mont(arr)))]


def naive_dft(coeffs, omega):
    n = len(coeffs)
    return [
        sum(c * pow(omega, i * k, PRIME) for k, c in enumerate(coeffs)) % PRIME
        for i in range(n)
    ]


@pytest.mark.parametrize("n", [1, 2, 4, 8, 64, 256])
def test_ntt_matches_naive_dft(n):
    coeffs = [int(RNG.integers(0, 2**63)) for _ in range(n)]
    out = from_mont_ints(nt.ntt(to_mont_arr(coeffs)))
    assert out == naive_dft(coeffs, primitive_root_of_unity(n))


@pytest.mark.parametrize("n", [2, 16, 1 << 10])
def test_intt_round_trip(n):
    arr = fj.to_mont(random_felt_limbs(RNG, (n,)))
    back = nt.intt(nt.ntt(arr))
    assert from_mont_ints(back) == from_mont_ints(arr)


def test_ntt_evaluates_polynomial():
    # eval[i] == P(omega^i) against Horner on the host
    n = 32
    coeffs = [int(RNG.integers(0, 2**62)) for _ in range(n)]
    p = Polynomial(coeffs)
    w = primitive_root_of_unity(n)
    out = from_mont_ints(nt.ntt(to_mont_arr(coeffs)))
    assert out == [p.evaluate(pow(w, i, PRIME)) for i in range(n)]


def test_powers_table():
    base = 123456789
    tab = from_mont_ints(nt.powers(base, 10))
    assert tab == [pow(base, i, PRIME) for i in range(10)]


def test_coset_evaluate_and_interpolate():
    n, blowup, offset = 16, 4, nt.primitive_root_of_unity(1 << 30)
    coeffs = [int(RNG.integers(0, 2**62)) for _ in range(n)]
    p = Polynomial(coeffs)
    lde = nt.coset_lde(to_mont_arr(coeffs), blowup, offset)
    w = primitive_root_of_unity(n * blowup)
    expect = [p.evaluate(offset * pow(w, i, PRIME) % PRIME) for i in range(n * blowup)]
    assert from_mont_ints(lde) == expect
    # interpolate back on the big domain: coefficients match (zero-padded)
    coeffs_back = from_mont_ints(nt.coset_interpolate(lde, offset))
    assert coeffs_back == [c % PRIME for c in coeffs] + [0] * (n * blowup - n)


def test_poly_mul_vs_schoolbook():
    a = [int(RNG.integers(0, 2**62)) for _ in range(13)]
    b = [int(RNG.integers(0, 2**62)) for _ in range(7)]
    out = from_mont_ints(nt.poly_mul(to_mont_arr(a), to_mont_arr(b)))
    expect = (Polynomial(a) * Polynomial(b)).coeffs
    expect = expect + [0] * (len(a) + len(b) - 1 - len(expect))
    assert out == expect


def test_poly_mul_large_pow2():
    # config 1 shape (BASELINE.json): 2^12 x 2^12 multiply, spot-checked by
    # evaluating both sides at random points (full schoolbook too slow here).
    n = 1 << 12
    a = [int(x) for x in limbs_to_ints(random_felt_limbs(RNG, (n,)))]
    b = [int(x) for x in limbs_to_ints(random_felt_limbs(RNG, (n,)))]
    prod = from_mont_ints(nt.poly_mul(to_mont_arr(a), to_mont_arr(b)))
    pa, pb, pp = Polynomial(a), Polynomial(b), Polynomial(prod)
    for _ in range(4):
        x = int(RNG.integers(0, 2**63))
        assert pp.evaluate(x) == pa.evaluate(x) * pb.evaluate(x) % PRIME


def test_ntt_rejects_non_pow2():
    with pytest.raises(ValueError):
        nt.ntt(fj.zeros((3,)))
    with pytest.raises(ValueError):
        nt.intt(fj.zeros((5,)))


def test_zerofier_and_interpolate_host():
    xs = [1, 5, 9, 42]
    ys = [3, 1, 4, 1]
    p = Polynomial.interpolate(xs, ys)
    assert p.evaluate_domain(xs) == ys
    z = Polynomial.zerofier(xs)
    assert all(z.evaluate(x) == 0 for x in xs)
    assert z.evaluate(2) != 0
    q, r = (p * z).divmod(z)
    assert r.is_zero() and q == p


def test_coset_evaluate_decimated_matches_monolithic():
    # Big-domain evaluation path (ops/ntt.py coset_evaluate_decimated):
    # P(x) = sum_j x^j P_j(x^S) with periodic sub-evaluations must be
    # bit-exact vs the monolithic transform for several split shapes.
    import numpy as np
    import jax.numpy as jnp

    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import ntt as nttmod
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    rng = np.random.default_rng(3)
    coeffs = fj.to_mont(jnp.asarray(random_felt_limbs(rng, (1 << 8,))))
    mono = np.asarray(nttmod.coset_evaluate(coeffs, 1 << 12, 3))
    for sub_max, chunk in [(1 << 10, 1 << 9), (1 << 9, 1 << 10), (1 << 11, 1 << 11)]:
        deci = np.asarray(
            nttmod.coset_evaluate_decimated(
                coeffs, 1 << 12, 3, sub_max=sub_max, chunk=chunk
            )
        )
        assert np.array_equal(mono, deci), (sub_max, chunk)
