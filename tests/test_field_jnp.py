"""Device limb arithmetic vs the exact host oracle.

Every device op must agree with Python-int math on random batches and on
the reference conformance vectors (SURVEY.md section 2 row 2).
"""

import numpy as np
import pytest

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops.field import PRIME
from stark_anatomy_tpu.ops.limbs import (
    R_MOD_P,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
    random_felt_limbs,
)

RNG = np.random.default_rng(0xF1E1D)
N = 257  # deliberately not a multiple of the lane width


def rand_pair():
    a_int = [int(x) for x in limbs_to_ints(random_felt_limbs(RNG, (N,)))]
    b_int = [int(x) for x in limbs_to_ints(random_felt_limbs(RNG, (N,)))]
    return a_int, b_int


def as_ints(limbs):
    return [int(x) for x in limbs_to_ints(np.asarray(limbs))]


def test_limb_round_trip():
    vals = [0, 1, PRIME - 1, 2**64 - 3, 2**127 + 12345]
    arr = ints_to_limbs(vals)
    assert as_ints(arr) == [v % PRIME for v in vals]
    assert limbs_to_int(int_to_limbs(PRIME - 1)) == PRIME - 1
    assert limbs_to_int(int_to_limbs(PRIME)) == 0


def test_add_random():
    a, b = rand_pair()
    out = fj.add(ints_to_limbs(a), ints_to_limbs(b))
    assert as_ints(out) == [(x + y) % PRIME for x, y in zip(a, b)]


def test_add_boundary():
    cases = [(PRIME - 1, PRIME - 1), (PRIME - 1, 1), (0, 0), (PRIME - 10, 12)]
    a = ints_to_limbs([c[0] for c in cases])
    b = ints_to_limbs([c[1] for c in cases])
    assert as_ints(fj.add(a, b)) == [(x + y) % PRIME for x, y in cases]


def test_sub_random():
    a, b = rand_pair()
    out = fj.sub(ints_to_limbs(a), ints_to_limbs(b))
    assert as_ints(out) == [(x - y) % PRIME for x, y in zip(a, b)]


def test_sub_boundary():
    cases = [(0, 12), (0, 0), (1, PRIME - 1), (PRIME - 1, PRIME - 1)]
    a = ints_to_limbs([c[0] for c in cases])
    b = ints_to_limbs([c[1] for c in cases])
    assert as_ints(fj.sub(a, b)) == [(x - y) % PRIME for x, y in cases]


def test_neg():
    vals = [0, 1, PRIME - 1, 12345]
    out = fj.neg(ints_to_limbs(vals))
    assert as_ints(out) == [(-v) % PRIME for v in vals]


def test_mont_mul_reference_vectors():
    # Standard-form multiply built from two REDC passes must hit the
    # reference vectors (field.rs:183-194, base.rs:354-386).
    cases = [
        (2**64 - 3, 2**64 - 2, 69784469778708083235216150296170332165),
        (PRIME - 1, PRIME - 1, 1),
        (0, 12345, 0),
        (1, PRIME - 1, PRIME - 1),
    ]
    a = ints_to_limbs([c[0] for c in cases])
    b = ints_to_limbs([c[1] for c in cases])
    assert as_ints(fj.mul(a, b)) == [c[2] for c in cases]


def test_mont_mul_random():
    a, b = rand_pair()
    am, bm = fj.to_mont(ints_to_limbs(a)), fj.to_mont(ints_to_limbs(b))
    out = fj.from_mont(fj.mont_mul(am, bm))
    assert as_ints(out) == [(x * y) % PRIME for x, y in zip(a, b)]


def test_mont_form_round_trip():
    a, _ = rand_pair()
    arr = ints_to_limbs(a)
    am = fj.to_mont(arr)
    assert as_ints(am) == [x * R_MOD_P % PRIME for x in a]
    assert as_ints(fj.from_mont(am)) == [x % PRIME for x in a]


def test_pow_const_vector():
    # field.rs:139-151: 2^160 mod p
    out = fj.pow_const(ints_to_limbs([2]), 160, a_is_mont=False)
    assert as_ints(out) == [242584109230747146804944788495759879579]


def test_pow_const_edges():
    a = ints_to_limbs([5, PRIME - 1, 0, 7])
    assert as_ints(fj.pow_const(a, 0, a_is_mont=False)) == [1, 1, 1, 1]
    assert as_ints(fj.pow_const(a, 1, a_is_mont=False)) == [5, PRIME - 1, 0, 7]


def test_inv_fermat():
    a, _ = rand_pair()
    a = [x or 1 for x in a]  # avoid zeros
    out = fj.inv(ints_to_limbs(a), a_is_mont=False)
    expect = [pow(x, PRIME - 2, PRIME) for x in a]
    assert as_ints(out) == expect
    # reference div vector (field.rs:196-208) via inverse
    num, den = 2**64 - 3, 2**64 - 2
    got = fj.mul(ints_to_limbs([num]), fj.inv(ints_to_limbs([den]), a_is_mont=False))
    assert as_ints(got) == [263166645724356846472197722797662682189]


@pytest.mark.parametrize("k", range(1, 12))
def test_inv_minus_family_device(k):
    # field.rs:120-137 on the device path: (1/(p-k)) * (p-k) == 1
    b = ints_to_limbs([PRIME - k])
    out = fj.mul(fj.inv(b, a_is_mont=False), b)
    assert as_ints(out) == [1]


def test_masks_and_select():
    a = ints_to_limbs([0, 5, 0, PRIME - 1])
    b = ints_to_limbs([1, 2, 3, 4])
    nz = np.asarray(fj.is_nonzero(a))
    assert nz.tolist() == [False, True, False, True]
    eqm = np.asarray(fj.eq(a, a))
    assert eqm.all()
    sel = fj.select(fj.is_nonzero(a), a, b)
    assert as_ints(sel) == [1, 5, 3, PRIME - 1]


def test_batched_2d_shapes():
    vals = [[1, 2, 3, 4], [5, 6, 7, 8]]
    arr = ints_to_limbs(vals)
    assert arr.shape == (8, 2, 4)
    out = fj.mul(arr, arr)
    got = limbs_to_ints(np.asarray(out))
    for r in range(2):
        for c in range(4):
            assert int(got[r][c]) == (vals[r][c] ** 2) % PRIME


def test_jit_compiles():
    import jax

    a, b = rand_pair()
    am, bm = ints_to_limbs(a), ints_to_limbs(b)
    f = jax.jit(lambda x, y: fj.from_mont(fj.mont_mul(fj.to_mont(x), fj.to_mont(y))))
    out = f(am, bm)
    assert as_ints(out) == [(x * y) % PRIME for x, y in zip(a, b)]
