"""Hand-tiled Pallas TPU kernels for F_p limb arithmetic.

Same semantics as ops/field_jnp.py (the any-backend reference
implementation, tested equivalent in tests/test_field_pallas.py), but laid
out for the TPU VPU explicitly:

- an (8, n) limb codeword is viewed as (8, n/128/R, R, 128): the limb axis
  becomes a MAJOR axis, so each per-limb slice inside the kernel is a
  tile-aligned (R, 128) vector register — no sublane relayouts, unlike the
  XLA path where slicing row i of an (8, n) array reshuffles tiles;
- one grid step processes R*128 elements; all ~700 uint32 ops of the
  schoolbook 8x8 product + Montgomery REDC (see ops/limbs.py for the
  algorithm and constants) run on full (R, 128) tiles in VMEM;
- the fused NTT butterfly kernel computes t = odd*tw, even+t, even-t in
  one pass — one HBM read/write per operand per stage instead of three.

Kernels fall back to ops/field_jnp.py off-TPU (tests exercise both the
fallback and interpret-mode kernels on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops.limbs import (
    COMP_P_LIMBS,
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    P_TOP_DIGIT,
)

import numpy as np

_M = np.uint32(LIMB_MASK)
_S16 = np.uint32(LIMB_BITS)
#: default elements per grid step = _ROWS * 128.
_ROWS = 64


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _limbs(ref):
    """8 per-limb (R, 128) tiles from an (8, R, 128) block ref."""
    return [ref[i] for i in range(NUM_LIMBS)]


def _store(ref, digits):
    for i in range(NUM_LIMBS):
        ref[i] = digits[i]


def _cond_sub_p(digits, carry_out):
    """value < 2p (8 digits + bit-128 carry) -> value mod p. Tile ops only."""
    u = []
    c = None
    for i in range(NUM_LIMBS):
        t = digits[i] + np.uint32(COMP_P_LIMBS[i]) + (np.uint32(1) if c is None else c)
        u.append(t & _M)
        c = t >> _S16
    ge = (carry_out | c) != 0
    return [jnp.where(ge, u[i], digits[i]) for i in range(NUM_LIMBS)]


def _add_digits(a, b):
    digits = []
    c = np.uint32(0)
    for i in range(NUM_LIMBS):
        t = a[i] + b[i] + c
        digits.append(t & _M)
        c = t >> _S16
    return _cond_sub_p(digits, c)


def _sub_digits(a, b):
    d = []
    c = np.uint32(1)
    for i in range(NUM_LIMBS):
        t = a[i] + (_M - b[i]) + c
        d.append(t & _M)
        c = t >> _S16
    borrowed = c == 0
    from stark_anatomy_tpu.ops.limbs import P_LIMBS

    e = []
    c2 = np.uint32(0)
    for i in range(NUM_LIMBS):
        t = d[i] + np.uint32(P_LIMBS[i]) + c2
        e.append(t & _M)
        c2 = t >> _S16
    return [jnp.where(borrowed, e[i], d[i]) for i in range(NUM_LIMBS)]


def _mont_mul_digits(a, b):
    """REDC(a*b): schoolbook 8x8 + 8 REDC steps (ops/field_jnp.py:mont_mul)."""
    t = [None] * (2 * NUM_LIMBS)

    def acc(k, v):
        t[k] = v if t[k] is None else t[k] + v

    for i in range(NUM_LIMBS):
        for j in range(NUM_LIMBS):
            prod = a[i] * b[j]
            acc(i + j, prod & _M)
            acc(i + j + 1, prod >> _S16)
    zero = jnp.zeros_like(a[0])
    t = [zero if x is None else x for x in t]
    top = np.uint32(P_TOP_DIGIT)
    carry = zero
    for i in range(NUM_LIMBS):
        ti = t[i] + carry
        m = (np.uint32(0x10000) - (ti & _M)) & _M
        ti = ti + m
        carry = ti >> _S16
        mp = m * top
        t[i + 7] = t[i + 7] + (mp & _M)
        t[i + 8] = t[i + 8] + (mp >> _S16)
    digits = []
    for i in range(NUM_LIMBS, 2 * NUM_LIMBS):
        ti = t[i] + carry
        digits.append(ti & _M)
        carry = ti >> _S16
    return _cond_sub_p(digits, carry)


# -- kernels ---------------------------------------------------------------


def _add_kernel(a_ref, b_ref, o_ref):
    _store(o_ref, _add_digits(_limbs(a_ref), _limbs(b_ref)))


def _sub_kernel(a_ref, b_ref, o_ref):
    _store(o_ref, _sub_digits(_limbs(a_ref), _limbs(b_ref)))


def _mont_mul_kernel(a_ref, b_ref, o_ref):
    _store(o_ref, _mont_mul_digits(_limbs(a_ref), _limbs(b_ref)))


def _butterfly_kernel(even_ref, odd_ref, tw_ref, hi_ref, lo_ref):
    """t = odd*tw; hi = even + t; lo = even - t (one fused pass)."""
    even = _limbs(even_ref)
    t = _mont_mul_digits(_limbs(odd_ref), _limbs(tw_ref))
    _store(hi_ref, _add_digits(even, t))
    _store(lo_ref, _sub_digits(even, t))


def _blocked(x: jax.Array, rows: int):
    """(8, n) -> (8, n/(rows*128), rows, 128); requires divisibility."""
    n = x.shape[-1]
    blocks = n // (rows * 128)
    return x.reshape(NUM_LIMBS, blocks, rows, 128), blocks


def _block_spec(rows: int):
    return pl.BlockSpec(
        (NUM_LIMBS, 1, rows, 128),
        lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _squeeze_kernel(kernel):
    """Adapt a (8, R, 128)-block kernel to the (8, 1, R, 128) refs."""

    def wrapped(*refs):
        kernel(*[_SqueezedRef(r) for r in refs])

    return wrapped


class _SqueezedRef:
    """View of an (8, 1, R, 128) ref presenting (8, R, 128) indexing."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, i):
        return self._ref[i, 0]

    def __setitem__(self, i, value):
        self._ref[i, 0] = value


def _elementwise_call(kernel, n_out: int, rows: int, interpret: bool, *arrays):
    n = arrays[0].shape[-1]
    if n % (rows * 128):
        raise ValueError(f"n={n} must be a multiple of {rows * 128}")
    blocked = []
    for x in arrays:
        xb, blocks = _blocked(x, rows)
        blocked.append(xb)
    out_shape = [
        jax.ShapeDtypeStruct(blocked[0].shape, jnp.uint32) for _ in range(n_out)
    ]
    spec = _block_spec(rows)
    result = pl.pallas_call(
        _squeeze_kernel(kernel),
        out_shape=out_shape if n_out > 1 else out_shape[0],
        grid=(blocks,),
        in_specs=[spec] * len(arrays),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        interpret=interpret,
    )(*blocked)
    if n_out == 1:
        return result.reshape(NUM_LIMBS, n)
    return tuple(r.reshape(NUM_LIMBS, n) for r in result)


def _pick_rows(n: int) -> int:
    rows = _ROWS
    while rows > 8 and n % (rows * 128):
        rows //= 2
    return rows


@partial(jax.jit, static_argnames=("interpret",))
def add(a: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    if not interpret and (not _on_tpu() or a.shape[-1] % 1024):
        return fj.add(a, b)
    return _elementwise_call(_add_kernel, 1, _pick_rows(a.shape[-1]), interpret, a, b)


@partial(jax.jit, static_argnames=("interpret",))
def sub(a: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    if not interpret and (not _on_tpu() or a.shape[-1] % 1024):
        return fj.sub(a, b)
    return _elementwise_call(_sub_kernel, 1, _pick_rows(a.shape[-1]), interpret, a, b)


@partial(jax.jit, static_argnames=("interpret",))
def mont_mul(a: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    if not interpret and (not _on_tpu() or a.shape[-1] % 1024):
        return fj.mont_mul(a, b)
    return _elementwise_call(
        _mont_mul_kernel, 1, _pick_rows(a.shape[-1]), interpret, a, b
    )


@partial(jax.jit, static_argnames=("interpret",))
def butterfly(
    even: jax.Array, odd: jax.Array, tw: jax.Array, interpret: bool = False
):
    """(even + odd*tw, even - odd*tw) fused; all (8, n) Montgomery form."""
    if not interpret and (not _on_tpu() or even.shape[-1] % 1024):
        t = fj.mont_mul(odd, tw)
        return fj.add(even, t), fj.sub(even, t)
    return _elementwise_call(
        _butterfly_kernel, 2, _pick_rows(even.shape[-1]), interpret, even, odd, tw
    )


@partial(jax.jit, static_argnames=("exponent", "interpret"))
def pow_const(a: jax.Array, exponent: int, interpret: bool = False) -> jax.Array:
    """a^exponent on Montgomery-form inputs via a kernel-bodied scan.

    The jnp ladder (ops/field_jnp.py pow_const) spends ~250 full-tensor
    mont_muls; running each step through the tiled kernel makes the Fermat
    inverse ~20x faster on TPU. Fallback preserves fj semantics exactly.
    """
    if exponent < 0:
        raise ValueError("negative exponents unsupported")
    if not interpret and (not _on_tpu() or a.shape[-1] % 1024 or a.ndim != 2):
        return fj.pow_const(a, exponent, a_is_mont=True)
    from stark_anatomy_tpu.ops.limbs import R_MOD_P, int_to_limbs

    one_m = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(R_MOD_P), dtype=jnp.uint32).reshape(8, 1), a.shape
    ).astype(jnp.uint32)
    if exponent == 0:
        return one_m
    rows = _pick_rows(a.shape[-1])
    nbits = exponent.bit_length()
    bits = jnp.asarray([(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.bool_)

    def step(carry, bit):
        result, base = carry
        prod = _elementwise_call(_mont_mul_kernel, 1, rows, interpret, result, base)
        result = jnp.where(bit, prod, result)
        base = _elementwise_call(_mont_mul_kernel, 1, rows, interpret, base, base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(step, (one_m, a), bits)
    return result


def _make_mul(interpret: bool):
    """Size-aware Montgomery multiply: tiled kernel when the operand
    qualifies, fj otherwise. Bit-identical either way (pinned on device
    by tests/test_tpu_smoke.py)."""

    def mul(x, y):
        if interpret or (
            _on_tpu() and x.ndim == 2 and x.shape[-1] % 1024 == 0
        ):
            rows = _pick_rows(x.shape[-1])
            return _elementwise_call(_mont_mul_kernel, 1, rows, interpret, x, y)
        return fj.mont_mul(x, y)

    return mul


def _inv_ladder(a: jax.Array, mul) -> jax.Array:
    """Fermat inverse a^(p-2) by an addition chain for p-2 = 407*2^119 - 1
    (VERDICT r3 item 3b): with t119 = a^(2^119 - 1) built by run-doubling
    (118 squarings + 11 multiplies) and z = t119 * a = a^(2^119),

        a^(p-2) = a^(406*2^119 + 2^119 - 1) = z^406 * t119,

    406 = 0b110010110 costing 8 squarings + 4 multiplies. Total ~143
    mont_muls vs ~256 for the generic bit-scan pow_const. 0 maps to 0.
    """

    def sq_n(x, n):
        if n == 0:
            return x

        def step(c, _):
            return mul(c, c), None

        y, _ = jax.lax.scan(step, x, None, length=n)
        return y

    t = a  # t_k invariant: a^(2^k - 1)
    saved = {1: a}
    for k in (1, 2, 4, 8, 16, 32):  # doubling steps: t_{2k} = t_k^(2^k) * t_k
        t = mul(sq_n(t, k), t)
        saved[2 * k] = t
    for k in (32, 16, 4, 2, 1):  # 64+32+16+4+2+1 = 119
        t = mul(sq_n(t, k), saved[k])
    z = mul(t, a)  # a^(2^119)
    # z^406, MSB-first over 0b110010110 (the leading 1 is z itself).
    r = z
    for bit in (1, 0, 0, 1, 0, 1, 1, 0):
        r = mul(r, r)
        if bit:
            r = mul(r, z)
    return mul(r, t)


#: Group width of the batched-inversion scans. 128 keeps every recursion
#: level's (8, n/128) mul tile-aligned down to n = 2^17 while bounding
#: the scan length (and therefore compile time) per level.
_BATCH_INV_GROUP = 128

#: Below this length the ladder wins: the batch scheme's two length-128
#: scans cost ~384 small dispatches of fixed overhead, while 143 ladder
#: muls on a small array are already cheap.
_BATCH_INV_MIN = 1 << 14


def _batch_inv_nonzero(a: jax.Array, mul, one_m: jax.Array) -> jax.Array:
    """Montgomery's batch-inversion trick on an (8, n) array with NO zero
    elements: invert all n values with ~3 full-size mont_mul passes
    instead of the ladder's ~143.

    Group the lanes into runs of G = _BATCH_INV_GROUP consecutive
    elements. A forward scan over the group axis builds each element's
    EXCLUSIVE prefix product p_{i-1} (and the group totals); the totals
    are inverted recursively (n/G values, ladder at the base); a reverse
    scan with carry c_i = (prod_{j<=i} x_j)^{-1} then emits
    x_i^{-1} = c_i * p_{i-1} and updates c_{i-1} = c_i * x_i. Every
    element's inverse is the unique field inverse, so bytes match the
    ladder exactly (canonical Montgomery representatives both ways).
    """
    n = a.shape[-1]
    g = _BATCH_INV_GROUP
    if n < _BATCH_INV_MIN or n % g:
        return _inv_ladder(a, mul)
    m = n // g
    ones = jnp.broadcast_to(one_m.reshape(8, 1), (8, m)).astype(a.dtype)
    xs = jnp.moveaxis(a.reshape(8, m, g), 2, 0)  # (g, 8, m)

    def fwd(c, x):
        return mul(c, x), c  # emit the EXCLUSIVE prefix

    total, excl = jax.lax.scan(fwd, ones, xs)
    tinv = _batch_inv_nonzero(total, mul, one_m)

    def bwd(c, x_e):
        x, e = x_e
        return mul(c, x), mul(c, e)

    _, invs = jax.lax.scan(bwd, tinv, (xs, excl), reverse=True)
    return jnp.moveaxis(invs, 0, 2).reshape(8, n)


@partial(jax.jit, static_argnames=("interpret",))
def inv(a: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched field inverse, Montgomery form; 0 maps to 0.

    Large 2-D arrays take Montgomery's batch-inversion trick
    (_batch_inv_nonzero, ~3 full-size passes — the boundary phase's
    single batched zerofier inverse was the largest prove-phase term);
    zeros are masked to 1 on the way in and back to 0 on the way out,
    preserving the 0 -> 0 convention. Small or oddly-shaped inputs use
    the addition-chain ladder. The inverse of a unit is unique and all
    paths produce canonical Montgomery representatives, so results are
    bit-identical to pow_const(a, p-2) everywhere.
    """
    from stark_anatomy_tpu.ops.limbs import R_MOD_P, int_to_limbs

    mul = _make_mul(interpret)
    n = a.shape[-1]
    if a.ndim != 2 or n < _BATCH_INV_MIN or n % _BATCH_INV_GROUP:
        return _inv_ladder(a, mul)
    one_m = jnp.asarray(int_to_limbs(R_MOD_P), dtype=jnp.uint32)
    is_zero = jnp.all(a == 0, axis=0, keepdims=True)  # (1, n)
    a1 = jnp.where(is_zero, one_m.reshape(8, 1), a)
    out = _batch_inv_nonzero(a1, mul, one_m)
    return jnp.where(is_zero, jnp.zeros((), a.dtype), out)


def _const_like(value: int, a: jax.Array) -> jax.Array:
    from stark_anatomy_tpu.ops.limbs import int_to_limbs

    c = jnp.asarray(int_to_limbs(value), dtype=jnp.uint32)
    return jnp.broadcast_to(c.reshape((8,) + (1,) * (a.ndim - 1)), a.shape)


@partial(jax.jit, static_argnames=("interpret",))
def to_mont(a: jax.Array, interpret: bool = False) -> jax.Array:
    from stark_anatomy_tpu.ops.limbs import R2_MOD_P

    if not interpret and (not _on_tpu() or a.shape[-1] % 1024 or a.ndim != 2):
        return fj.to_mont(a)
    return mont_mul(a, _const_like(R2_MOD_P, a), interpret=interpret)


@partial(jax.jit, static_argnames=("interpret",))
def from_mont(a: jax.Array, interpret: bool = False) -> jax.Array:
    if not interpret and (not _on_tpu() or a.shape[-1] % 1024 or a.ndim != 2):
        return fj.from_mont(a)
    return mont_mul(a, _const_like(1, a), interpret=interpret)
