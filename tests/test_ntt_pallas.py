"""Pallas NTT vs the jnp reference — interpret mode on CPU, bit-exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops import ntt as nttmod
from stark_anatomy_tpu.ops import ntt_pallas as ntp
from stark_anatomy_tpu.ops.limbs import random_felt_limbs


def _codeword(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(random_felt_limbs(rng, (n,)))


@pytest.mark.parametrize("n", [2048, 4096])
def test_ntt_matches_reference(n):
    x = _codeword(n)
    want = np.asarray(nttmod.ntt(x))
    got = np.asarray(ntp._ntt_pallas_impl(x, False, True))
    np.testing.assert_array_equal(got, want)


def test_intt_matches_reference_and_roundtrips():
    n = 2048
    x = _codeword(n, seed=1)
    want = np.asarray(nttmod.intt(x))
    got = np.asarray(ntp._ntt_pallas_impl(x, True, True))
    np.testing.assert_array_equal(got, want)
    back = ntp._ntt_pallas_impl(
        ntp._ntt_pallas_impl(x, False, True), True, True
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_small_sizes_fall_back():
    x = _codeword(256, seed=2)
    np.testing.assert_array_equal(
        np.asarray(ntp.ntt(x)), np.asarray(nttmod.ntt(x))
    )
