"""Vectorized F_p arithmetic on limb arrays — pure jnp / XLA.

All functions take and return uint32 arrays of shape ``(8, *batch)``
(see ops/limbs.py for the representation). This module is the
*obviously-correct, any-backend* implementation; ops/field_pallas.py
provides hand-tiled TPU kernels with identical semantics, tested against
this module and against the host oracle (ops/field.py).

Multiplication uses Montgomery REDC (R = 2^128) instead of the reference's
per-op 320-bit division (/root/reference/src/field/types/base.rs:125-137);
see ops/limbs.py for why REDC is nearly free for this p.

Montgomery-form convention: the *device pipeline* (NTT, constraint
evaluation, FRI folding) keeps values in Montgomery form (x̃ = x*R mod p);
`mont_mul(ã, b̃) = (a*b)~`. Addition/subtraction/negation/equality are
form-agnostic. Convert with `to_mont` / `from_mont` at commitment and
serialization boundaries so all persisted bytes are canonical standard form
(required for cross-mesh-shape proof determinism, SURVEY.md section 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops.field import PRIME
from stark_anatomy_tpu.ops.limbs import (
    COMP_P_LIMBS,
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    P_LIMBS,
    P_TOP_DIGIT,
    R2_MOD_P,
    R_MOD_P,
    int_to_limbs,
)

_U32 = jnp.uint32
_MASK = jnp.uint32(LIMB_MASK)


def _const_limbs(value: int, like: jax.Array) -> jax.Array:
    """(8,) constant broadcast against `like`'s batch dims."""
    c = jnp.asarray(int_to_limbs(value), dtype=_U32)
    return c.reshape((NUM_LIMBS,) + (1,) * (like.ndim - 1))


def _check_limbs(*arrays) -> None:
    """Trace-time shape guard: JAX clamps out-of-range indices, so a wrong
    limb axis would silently compute garbage instead of raising."""
    for x in arrays:
        if x.ndim < 1 or x.shape[0] != NUM_LIMBS:
            raise ValueError(
                f"expected limb axis of size {NUM_LIMBS} first, got shape {x.shape}"
            )


def _cond_sub_p(digits: list[jax.Array], carry_out: jax.Array) -> jax.Array:
    """Given a value < 2p as 8 digits + a bit-128 carry, return value mod p.

    Borrow-free compare-and-subtract: u = digits + (2^128 - p); the carry out
    of that addition (or the incoming bit-128 carry) says digits >= p.
    """
    u = []
    c = jnp.uint32(1)  # +1 completes the two's complement of p
    for i in range(NUM_LIMBS):
        t = digits[i] + jnp.uint32(COMP_P_LIMBS[i]) + c
        u.append(t & _MASK)
        c = t >> LIMB_BITS
    ge = (carry_out | c).astype(jnp.bool_)
    return jnp.stack(
        [jnp.where(ge, u[i], digits[i]) for i in range(NUM_LIMBS)], axis=0
    ).astype(_U32)


@jax.jit
def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod p, canonical in -> canonical out."""
    _check_limbs(a, b)
    digits = []
    carry = jnp.uint32(0)
    for i in range(NUM_LIMBS):
        t = a[i] + b[i] + carry
        digits.append(t & _MASK)
        carry = t >> LIMB_BITS
    return _cond_sub_p(digits, carry)


@jax.jit
def neg(a: jax.Array) -> jax.Array:
    """(-a) mod p = p - a (and 0 -> 0)."""
    _check_limbs(a)
    digits = []
    borrow_comp = jnp.uint32(1)
    nonzero = is_nonzero(a)
    for i in range(NUM_LIMBS):
        # p - a via p + comp(a) + 1 (carry out is guaranteed for a != 0).
        t = jnp.uint32(P_LIMBS[i]) + (jnp.uint32(LIMB_MASK) - a[i]) + borrow_comp
        digits.append(jnp.where(nonzero, t & _MASK, jnp.uint32(0)))
        borrow_comp = t >> LIMB_BITS
    return jnp.stack(digits, axis=0).astype(_U32)


@jax.jit
def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod p. a - b, plus p on borrow — one pass, no neg round-trip."""
    _check_limbs(a, b)
    # a + comp(b) + 1 == a - b + 2^128; carry-out c == 1 iff a >= b.
    d = []
    c = jnp.uint32(1)
    for i in range(NUM_LIMBS):
        t = a[i] + (jnp.uint32(LIMB_MASK) - b[i]) + c
        d.append(t & _MASK)
        c = t >> LIMB_BITS
    borrowed = c == 0  # a < b: result currently a - b + 2^128; add p - 2^128
    # p - 2^128 == -(2^128 - p); adding p then dropping the 2^128 excess:
    e = []
    c2 = jnp.uint32(0)
    for i in range(NUM_LIMBS):
        t = d[i] + jnp.uint32(P_LIMBS[i]) + c2
        e.append(t & _MASK)
        c2 = t >> LIMB_BITS
    return jnp.stack(
        [jnp.where(borrowed, e[i], d[i]) for i in range(NUM_LIMBS)], axis=0
    ).astype(_U32)


@jax.jit
def mont_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product REDC(a * b) = a*b*R^{-1} mod p, R = 2^128.

    Canonical (< p) in -> canonical out. Schoolbook 8x8 digit products
    accumulated as 16-bit lo/hi pieces in 16 uint32 columns (max column
    value < 2^22 — no overflow), then 8 interleaved carry/REDC digit steps
    with m = (-t_i) mod 2^16 and m*p folded in as m + m*52096<<112.
    """
    _check_limbs(a, b)
    # Phase 1: schoolbook partial products, lo/hi split per column.
    t = [None] * (2 * NUM_LIMBS)

    def _acc(k, v):
        t[k] = v if t[k] is None else t[k] + v

    for i in range(NUM_LIMBS):
        ai = a[i]
        for j in range(NUM_LIMBS):
            prod = ai * b[j]  # uint32: (2^16-1)^2 < 2^32, exact
            _acc(i + j, prod & _MASK)
            _acc(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a[0])
    t = [zero if x is None else x for x in t]

    # Phase 2: 8 REDC digit steps, carries folded serially.
    top = jnp.uint32(P_TOP_DIGIT)
    carry = zero
    for i in range(NUM_LIMBS):
        ti = t[i] + carry
        m = (jnp.uint32(0x10000) - (ti & _MASK)) & _MASK  # (-ti) mod 2^16
        ti = ti + m  # += m * p_limbs[0] (== m); low 16 bits become 0
        carry = ti >> LIMB_BITS
        mp = m * top  # m * 52096 < 2^32
        t[i + 7] = t[i + 7] + (mp & _MASK)
        t[i + 8] = t[i + 8] + (mp >> LIMB_BITS)  # i+8 <= 15 always

    # Phase 3: final carry propagation over the high half (the result).
    digits = []
    for i in range(NUM_LIMBS, 2 * NUM_LIMBS):
        ti = t[i] + carry
        digits.append(ti & _MASK)
        carry = ti >> LIMB_BITS
    # carry is now the bit-128 overflow; REDC result < 2p.
    return _cond_sub_p(digits, carry)


@jax.jit
def to_mont(a: jax.Array) -> jax.Array:
    """Standard -> Montgomery form: a*R mod p = mont_mul(a, R^2)."""
    return mont_mul(a, _const_limbs(R2_MOD_P, a))


@jax.jit
def from_mont(a: jax.Array) -> jax.Array:
    """Montgomery -> standard form: mont_mul(ã, 1) = (x*R)*R^{-1} = x."""
    return mont_mul(a, _const_limbs(1, a))


@jax.jit
def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Plain (a * b) mod p on standard-form inputs (two REDC passes)."""
    return mont_mul(mont_mul(a, b), _const_limbs(R2_MOD_P, a))


@partial(jax.jit, static_argnames=("exponent", "a_is_mont"))
def pow_const(a: jax.Array, exponent: int, a_is_mont: bool = True) -> jax.Array:
    """a^exponent (exponent a static Python int) via square-and-multiply.

    Implemented as a ``lax.scan`` over the exponent bits (LSB first) so the
    compiled graph stays small (2 mont_muls per step) even for 128-bit
    exponents like the Fermat inverse. Operates in Montgomery form
    internally; input/output in Montgomery form when `a_is_mont`, standard
    form otherwise.
    """
    if exponent < 0:
        raise ValueError("negative exponents: use inv() then pow_const")
    am = a if a_is_mont else to_mont(a)
    one_m = jnp.broadcast_to(_const_limbs(R_MOD_P, a), a.shape).astype(_U32)
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
    """Batched modular inverse via Fermat: a^(p-2).

    Fully parallel across lanes (~190 mont_muls of depth), unlike
    Montgomery's batch-inversion trick whose prefix products serialize on
    the batch axis — on TPU the Fermat ladder wins. 0 maps to 0 (callers
    must guard if zero is an error).
    """
    return pow_const(a, PRIME - 2, a_is_mont=a_is_mont)


@jax.jit
def is_nonzero(a: jax.Array) -> jax.Array:
    """Boolean batch mask: element != 0 (canonical form assumed)."""
    acc = a[0]
    for i in range(1, NUM_LIMBS):
        acc = acc | a[i]
    return acc != 0


@jax.jit
def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    """Boolean batch mask: a == b digit-wise (same form, canonical)."""
    acc = a[0] == b[0]
    for i in range(1, NUM_LIMBS):
        acc = jnp.logical_and(acc, a[i] == b[i])
    return acc


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

