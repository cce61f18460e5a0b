"""Vectorized F_p arithmetic on limb arrays — pure jnp / XLA, full-tensor.

All functions take and return uint32 arrays of shape ``(8, *batch)``
(see ops/limbs.py for the representation). This module is the
any-backend implementation; ops/field_pallas.py provides hand-tiled TPU
kernels with identical semantics, tested against this module and against
the host oracle (ops/field.py).

Design rule: NO per-limb row slicing in hot paths. Slicing row i of an
(8, n) array crosses TPU sublane tiles and costs a relayout per slice —
measured ~50x over a plain elementwise op. Instead every operation is a
short sequence of FULL (8, *batch) tensor ops:

- carry propagation is branch-free Kogge-Stone over the limb axis
  (3 doubling steps for 8 limbs) after one coarse pass — O(log limbs)
  tensor ops instead of an 8-step sliced ripple;
- multiplication uses the textbook FULL Montgomery REDC, R = 2^128:
  m = (T mod R) * p' mod R, result = (T + m*p)/R, exploiting that
  p = 1 + 52096*2^112 makes m*p just  m + (m*52096 << 112)
  (see ops/limbs.py for why the reference's per-op 320-bit division,
  /root/reference/src/field/types/base.rs:125-137, is replaced by REDC);
- the schoolbook digit products accumulate in 16 uint32 columns with
  headroom (each column < 2^21), normalized once.

Montgomery-form convention: the device pipeline (NTT, constraint
evaluation, FRI folding) keeps values in Montgomery form (x~ = x*R mod p);
`mont_mul(a~, b~) = (a*b)~`. Addition/subtraction/negation/equality are
form-agnostic. Convert with `to_mont` / `from_mont` at commitment and
serialization boundaries so all persisted bytes are canonical standard
form (required for cross-mesh-shape proof determinism, SURVEY.md sec 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops.field import PRIME
from stark_anatomy_tpu.ops.limbs import (
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    R2_MOD_P,
    R_MOD_P,
    int_to_limbs,
)

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_SH = np.uint32(LIMB_BITS)

#: 2^128 - p as 8 digits (adding it == subtracting p, mod 2^128).
_R_MINUS_P = tuple(
    ((1 << 128) - PRIME) >> (LIMB_BITS * i) & LIMB_MASK for i in range(NUM_LIMBS)
)
_P_DIGITS = tuple(PRIME >> (LIMB_BITS * i) & LIMB_MASK for i in range(NUM_LIMBS))
#: p' = -p^{-1} mod 2^128 (Montgomery constant for full REDC).
_P_PRIME = (-pow(PRIME, -1, 1 << 128)) % (1 << 128)
_P_PRIME_DIGITS = tuple(
    _P_PRIME >> (LIMB_BITS * i) & LIMB_MASK for i in range(NUM_LIMBS)
)
_P_TOP = np.uint32(52096)  # p = 1 + 52096 * 2^112


def _const_col(digits, like: jax.Array, limbs: int | None = None) -> jax.Array:
    """(limbs, 1, ..) broadcastable constant column."""
    limbs = limbs if limbs is not None else len(digits)
    c = np.asarray(digits[:limbs], dtype=np.uint32)
    return jnp.asarray(c).reshape((limbs,) + (1,) * (like.ndim - 1))


def _shift_up(x: jax.Array, k: int) -> jax.Array:
    """Limb index i receives x[i-k]; zeros shift in at the bottom."""
    if k == 0:
        return x
    pad = jnp.zeros_like(x[:k])
    return jnp.concatenate([pad, x[: x.shape[0] - k]], axis=0)


def _resolve_carries(s: jax.Array, coarse: int = 1) -> tuple[jax.Array, jax.Array]:
    """Digits (any values < 2^32) -> (digits < 2^16, total carry out).

    `coarse` extra passes fold multi-bit carries (digit values up to
    2^(16+c*16)); the final 0/1 ripple is Kogge-Stone. Returns the carry
    word that overflowed past the top limb (sum of carries out, < 2^16).
    """
    limbs = s.shape[0]
    overflow = jnp.zeros_like(s[:1])
    for _ in range(coarse):
        c = s >> _SH
        overflow = overflow + c[limbs - 1 :]
        s = (s & _MASK) + _shift_up(c, 1)
    # Now digits <= 2^16 (value 2^16 possible): one 0/1 carry round via KS.
    g = s >> _SH  # generate: 0/1
    lo = s & _MASK
    p = (lo == _MASK).astype(_U32)
    steps = 1
    while steps < limbs:
        g = g | (p & _shift_up(g, steps))
        p = p & _shift_up(p, steps)
        steps *= 2
    overflow = overflow + g[limbs - 1 :]
    res = (lo + _shift_up(g, 1)) & _MASK
    return res, overflow[0]


def _check_limbs(*arrays) -> None:
    for x in arrays:
        if x.ndim < 1 or x.shape[0] != NUM_LIMBS:
            raise ValueError(
                f"expected limb axis of size {NUM_LIMBS} first, got shape {x.shape}"
            )


def _cond_sub_p(digits: jax.Array, ge_extra: jax.Array) -> jax.Array:
    """Canonical digits + "definitely >= p" mask -> value mod p.

    digits < 2^16 each, value < 2p; ge_extra: (batch,) nonzero where the
    (dropped) bit-128 carry was set.
    """
    s = digits + _const_col(_R_MINUS_P, digits)
    sub, carry = _resolve_carries(s)
    ge = (ge_extra | carry) != 0
    return jnp.where(ge[None], sub, digits)


@jax.jit
def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod p, canonical in -> canonical out."""
    _check_limbs(a, b)
    s, carry = _resolve_carries(a + b)
    return _cond_sub_p(s, carry)


@jax.jit
def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod p: a + (2^128-1 - b) + 1, plus p when it borrows."""
    _check_limbs(a, b)
    s = a + (_MASK - b)
    # +1 at limb 0 via a constant column.
    s = s + _const_col((1,) + (0,) * (NUM_LIMBS - 1), a)
    d, carry = _resolve_carries(s)
    borrowed = carry == 0  # no wrap => a < b
    e, _ = _resolve_carries(d + _const_col(_P_DIGITS, a))
    return jnp.where(borrowed[None], e, d)


@jax.jit
def neg(a: jax.Array) -> jax.Array:
    """(-a) mod p = p - a (and 0 -> 0)."""
    _check_limbs(a)
    s = _const_col(_P_DIGITS, a) + (_MASK - a)
    s = s + _const_col((1,) + (0,) * (NUM_LIMBS - 1), a)
    d, _ = _resolve_carries(s)
    nz = is_nonzero(a)
    return jnp.where(nz[None], d, jnp.zeros_like(a))


def _mul_digits_low(a: jax.Array, b_rows: list, columns: int) -> jax.Array:
    """Schoolbook digit product, keeping only `columns` output columns.

    a: (8, *batch) digits < 2^16; b_rows: list of 8 (1, *batch) rows (or
    broadcastable constants). Result digits UNNORMALIZED (< 2^21).
    """
    batch_shape = a.shape[1:]
    acc = jnp.zeros((columns,) + batch_shape, dtype=_U32)
    for j in range(min(NUM_LIMBS, columns)):
        prod = a * b_rows[j]  # (8, *batch): a_i * b_j, exact in u32
        lo = prod & _MASK
        hi = prod >> _SH
        lo_p = _pad_to(lo, j, columns)
        hi_p = _pad_to(hi, j + 1, columns)
        acc = acc + lo_p
        if hi_p is not None:
            acc = acc + hi_p
    return acc


def _pad_to(x: jax.Array, offset: int, columns: int):
    """Place x's limbs at [offset, offset+8) in a `columns`-limb array."""
    take = min(x.shape[0], columns - offset)
    if take <= 0:
        return None
    pieces = []
    if offset:
        pieces.append(jnp.zeros((offset,) + x.shape[1:], dtype=_U32))
    pieces.append(x[:take])
    tail = columns - offset - take
    if tail:
        pieces.append(jnp.zeros((tail,) + x.shape[1:], dtype=_U32))
    return jnp.concatenate(pieces, axis=0)


@jax.jit
def mont_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product REDC(a * b) = a*b*R^{-1} mod p, R = 2^128.

    Canonical (< p) in -> canonical out. Full REDC:
      T = a*b (16 columns);  m = (T mod R) * p' mod R;
      result = (T + m*p) / R, with m*p = m + (m*52096 << 112).
    """
    _check_limbs(a, b)
    b_rows = [b[j][None] for j in range(NUM_LIMBS)]
    t_acc = _mul_digits_low(a, b_rows, 2 * NUM_LIMBS)
    t, t_over = _resolve_carries(t_acc, coarse=2)  # t_over adds at column 16 — but
    # column 16 does not exist: the full product < p^2 < R*p fits 16 digits,
    # so the overflow out of column 15 is zero by construction.
    t_lo = t[:NUM_LIMBS]
    m_acc = _mul_digits_low(t_lo, [jnp.asarray(np.uint32(d)) for d in _P_PRIME_DIGITS], NUM_LIMBS)
    m, _ = _resolve_carries(m_acc, coarse=2)  # mod 2^128: drop overflow
    # m * 52096: digits < 2^16 * 52096 < 2^32 — exact.
    mp = m * _P_TOP
    mp_lo = mp & _MASK
    mp_hi = mp >> _SH
    # T + m + (mp << 112): build the 16-column sum.
    s = t.astype(_U32)
    s = s + _pad_to(m, 0, 2 * NUM_LIMBS)
    s = s + _pad_to(mp_lo, 7, 2 * NUM_LIMBS)
    s = s + _pad_to(mp_hi, 8, 2 * NUM_LIMBS)
    r, r_over = _resolve_carries(s, coarse=1)
    # low 8 digits are zero (REDC invariant); result = high 8 digits,
    # value < 2p; r_over is the bit-256 carry — impossible (T+mp < R*p + R*p).
    hi = r[NUM_LIMBS:]
    # The carry out of column 15 IS significant: (T + m*p) < 2*R*p < R*2^128
    # means no 17th digit... except 2p > 2^128: bit 128 of the HIGH half.
    return _cond_sub_p(hi, r_over)


@jax.jit
def to_mont(a: jax.Array) -> jax.Array:
    """Standard -> Montgomery form: a*R mod p = mont_mul(a, R^2)."""
    return mont_mul(a, jnp.broadcast_to(_const_col(int_to_limbs(R2_MOD_P), a), a.shape))


@jax.jit
def from_mont(a: jax.Array) -> jax.Array:
    """Montgomery -> standard form: mont_mul(a~, 1) = (x*R)*R^{-1} = x."""
    return mont_mul(a, jnp.broadcast_to(_const_col(int_to_limbs(1), a), a.shape))


@jax.jit
def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Plain (a * b) mod p on standard-form inputs (two REDC passes)."""
    return mont_mul(mont_mul(a, b), jnp.broadcast_to(_const_col(int_to_limbs(R2_MOD_P), a), a.shape))


@partial(jax.jit, static_argnames=("exponent", "a_is_mont"))
def pow_const(a: jax.Array, exponent: int, a_is_mont: bool = True) -> jax.Array:
    """a^exponent (static int) via an LSB-first square-and-multiply scan."""
    if exponent < 0:
        raise ValueError("negative exponents: use inv() then pow_const")
    am = a if a_is_mont else to_mont(a)
    one_m = jnp.broadcast_to(_const_col(int_to_limbs(R_MOD_P), a), a.shape).astype(_U32)
    if exponent == 0:
        result = one_m
    else:
        nbits = exponent.bit_length()
        bits = jnp.asarray(
            [(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.bool_
        )

        def step(carry, bit):
            result, base = carry
            result = jnp.where(bit, mont_mul(result, base), result)
            base = mont_mul(base, base)
            return (result, base), None

        (result, _), _ = jax.lax.scan(step, (one_m, am), bits)
    return result if a_is_mont else from_mont(result)


@partial(jax.jit, static_argnames=("a_is_mont",))
def inv(a: jax.Array, a_is_mont: bool = True) -> jax.Array:
    """Batched modular inverse via Fermat: a^(p-2); 0 maps to 0."""
    return pow_const(a, PRIME - 2, a_is_mont=a_is_mont)


@jax.jit
def is_nonzero(a: jax.Array) -> jax.Array:
    """Boolean batch mask: element != 0 (canonical form assumed)."""
    return jnp.max(a, axis=0) != 0


@jax.jit
def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    """Boolean batch mask: a == b digit-wise (same form, canonical)."""
    return jnp.all(a == b, axis=0)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise where over limb arrays: mask ? a : b (mask on batch dims)."""
    return jnp.where(mask[None, ...], a, b)


def zeros(shape: tuple[int, ...]) -> jax.Array:
    return jnp.zeros((NUM_LIMBS,) + tuple(shape), dtype=_U32)


def full(shape: tuple[int, ...], value: int, mont: bool = False) -> jax.Array:
    """Constant-filled limb array (host int -> canonical or Montgomery form)."""
    v = (value % PRIME) * (1 << 128) % PRIME if mont else value % PRIME
    c = jnp.asarray(int_to_limbs(v), dtype=_U32)
    return jnp.broadcast_to(
        c.reshape((NUM_LIMBS,) + (1,) * len(shape)), (NUM_LIMBS,) + tuple(shape)
    )
