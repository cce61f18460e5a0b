"""Native C++ field library vs the exact host oracle."""

import numpy as np
import pytest

from stark_anatomy_tpu import native
from stark_anatomy_tpu.models.rescue_prime import RescuePrime
from stark_anatomy_tpu.ops.field import PRIME, finv


def _rand_felts(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(int.from_bytes(rng.bytes(16), "little") % PRIME)
    return out


def test_native_library_builds():
    # The image ships g++; the native path must actually be active here.
    assert native.AVAILABLE


def test_arith_matches_oracle():
    a = _rand_felts(257, seed=1) + [0, 1, PRIME - 1]
    b = _rand_felts(257, seed=2) + [PRIME - 1, PRIME - 1, PRIME - 1]
    assert native.add_batch(a, b) == [(x + y) % PRIME for x, y in zip(a, b)]
    assert native.sub_batch(a, b) == [(x - y) % PRIME for x, y in zip(a, b)]
    assert native.mul_batch(a, b) == [x * y % PRIME for x, y in zip(a, b)]


def test_reference_mul_vector():
    # (2^64-3)*(2^64-2) mod p (reference field.rs:183-194).
    a, b = 2**64 - 3, 2**64 - 2
    assert native.mul_batch([a], [b]) == [69784469778708083235216150296170332165]


def test_pow_inv_powers():
    a = _rand_felts(64, seed=3)
    assert native.pow_batch(a, 3) == [pow(x, 3, PRIME) for x in a]
    nz = [x if x else 1 for x in a]
    assert native.inv_batch(nz) == [finv(x) for x in nz]
    g = 3
    assert native.powers(g, 50) == [pow(g, i, PRIME) for i in range(50)]


def test_rescue_trace_matches_python():
    rp = RescuePrime()
    for inp, k in [(5, 1), (123456789123456789123456789, 2)]:
        want = rp._trace_py(inp, chain_length=k)
        got = native.rescue_chain_trace(rp, inp, k)
        assert got.shape == want.shape
        assert (got == want).all()
