"""Pallas field kernels vs the jnp reference — interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops import field_pallas as fp
from stark_anatomy_tpu.ops.limbs import random_felt_limbs

N = 2048  # one multiple of rows*128 with rows=8 and 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    a = jnp.asarray(random_felt_limbs(rng, (N,)))
    b = jnp.asarray(random_felt_limbs(rng, (N,)))
    return a, b


def test_add_matches(data):
    a, b = data
    np.testing.assert_array_equal(
        np.asarray(fp.add(a, b, interpret=True)), np.asarray(fj.add(a, b))
    )


def test_sub_matches(data):
    a, b = data
    np.testing.assert_array_equal(
        np.asarray(fp.sub(a, b, interpret=True)), np.asarray(fj.sub(a, b))
    )


def test_mont_mul_matches(data):
    a, b = data
    np.testing.assert_array_equal(
        np.asarray(fp.mont_mul(a, b, interpret=True)), np.asarray(fj.mont_mul(a, b))
    )


def test_butterfly_matches(data):
    a, b = data
    rng = np.random.default_rng(1)
    tw = jnp.asarray(random_felt_limbs(rng, (N,)))
    hi, lo = fp.butterfly(a, b, tw, interpret=True)
    t = fj.mont_mul(b, tw)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(fj.add(a, t)))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(fj.sub(a, t)))


def test_fallback_path_off_tpu(data):
    # Without interpret, off-TPU inputs take the jnp fallback — results equal.
    a, b = data
    np.testing.assert_array_equal(
        np.asarray(fp.mont_mul(a, b)), np.asarray(fj.mont_mul(a, b))
    )


def test_pow_and_inv_match(data):
    import jax.numpy as jnp

    a, b = data
    np.testing.assert_array_equal(
        np.asarray(fp.pow_const(a, 12345, interpret=True)),
        np.asarray(fj.pow_const(a, 12345)),
    )
    got = fp.inv(a, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(fj.inv(a)))


def test_batch_inv_matches_fermat_with_zeros():
    # Montgomery batch inversion (n >= fp._BATCH_INV_MIN takes the
    # group-scan scheme): must equal the Fermat ladder bit-for-bit —
    # inverses are unique and canonical — and keep the 0 -> 0 convention.
    rng = np.random.default_rng(11)
    n = fp._BATCH_INV_MIN
    a = np.array(random_felt_limbs(rng, (n,)))
    zero_at = [0, 1, 129, n // 2, n - 1]
    a[:, zero_at] = 0
    x = jnp.asarray(a)
    got = np.asarray(fp.inv(x))
    want = np.asarray(fj.inv(x))
    np.testing.assert_array_equal(got, want)
    assert not got[:, zero_at].any()
    # one size below the cutoff goes through the ladder and agrees too
    small = jnp.asarray(np.array(random_felt_limbs(rng, (n // 2,))))
    np.testing.assert_array_equal(
        np.asarray(fp.inv(small)), np.asarray(fj.inv(small))
    )
