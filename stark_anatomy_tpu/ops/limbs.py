"""Limb representation of F_p elements for TPU vector lanes.

TPU VPUs are 32-bit machines (no 64/128-bit integer vectors), so a field
element is decomposed into **8 radix-2^16 digits stored in uint32 lanes**,
limb axis FIRST: an array of N elements has shape ``(8, N)`` (or generally
``(8, *batch)``). Limbs-first puts the batch dimension on the 128-wide lane
axis and the 8 limbs exactly on the 8 sublanes of a float32/int32 tile —
the natural TPU layout (see /opt/skills/guides/pallas_guide.md, Tiling).

This replaces the role of the reference's I320 wide integer
(/root/reference/src/field/types/base.rs:7-10): where the reference does a
full 320-bit Knuth division per reduction (base.rs:125-137, see SURVEY.md
section 3.1), we use Montgomery REDC with R = 2^128, exploiting two
structural gifts of p = 1 + 407*2^119:

- p ≡ 1 (mod 2^16)  =>  the per-digit Montgomery constant p' = -p^{-1}
  mod 2^16 = 0xFFFF, i.e. m = (-t) mod 2^16 — no multiply needed;
- p's digits are [1, 0, 0, 0, 0, 0, 0, 52096]  =>  adding m*p costs ONE
  16x16 multiply (m * 52096) plus an add of m, instead of 8 multiplies.

Host-side conversion helpers here are exact (Python ints).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from stark_anatomy_tpu.ops.field import PRIME

NUM_LIMBS = 8
LIMB_BITS = 16
LIMB_MASK = 0xFFFF
R = 1 << 128  # Montgomery radix
R_MOD_P = R % PRIME
R2_MOD_P = (R * R) % PRIME
R_INV = pow(R, -1, PRIME)
#: p's only nonzero high digit: p = 1 + 52096 * 2^112 (407 << 7 == 52096).
P_TOP_DIGIT = 52096
assert PRIME == 1 + P_TOP_DIGIT * (1 << 112)

P_LIMBS = tuple((PRIME >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS))
assert P_LIMBS == (1, 0, 0, 0, 0, 0, 0, P_TOP_DIGIT)
#: Digit-wise complement of p: (2^128 - 1 - p) per digit; used for the
#: borrow-free "subtract p" trick (a - p == a + COMP_P + 1 - 2^128).
COMP_P_LIMBS = tuple(LIMB_MASK - d for d in P_LIMBS)


def int_to_limbs(value: int) -> np.ndarray:
    """One canonical field element -> (8,) uint32 digit vector."""
    value %= PRIME
    return np.array(
        [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS)],
        dtype=np.uint32,
    )


def ints_to_limbs(values: Sequence[int] | np.ndarray) -> np.ndarray:
    """Batch of field elements -> (8, *batch) uint32 limb array."""
    arr = np.asarray(values, dtype=object)
    out = np.empty((NUM_LIMBS,) + arr.shape, dtype=np.uint32)
    flat = arr.reshape(-1)
    canon = np.array([int(v) % PRIME for v in flat], dtype=object)
    for i in range(NUM_LIMBS):
        out[i] = np.array(
            [(v >> (LIMB_BITS * i)) & LIMB_MASK for v in canon], dtype=np.uint32
        ).reshape(arr.shape)
    return out


def limbs_to_ints(limbs: np.ndarray) -> np.ndarray:
    """(8, *batch) uint32 limb array -> object array of exact Python ints."""
    limbs = np.asarray(limbs)
    if limbs.shape[0] != NUM_LIMBS:
        raise ValueError(f"expected limb axis of size {NUM_LIMBS} first")
    acc = np.zeros(limbs.shape[1:], dtype=object)
    for i in range(NUM_LIMBS):
        acc += limbs[i].astype(object) << (LIMB_BITS * i)
    return acc


def limbs_to_int(limbs: np.ndarray) -> int:
    """(8,) digit vector -> exact Python int."""
    return int(limbs_to_ints(np.asarray(limbs).reshape(NUM_LIMBS, 1))[0])


def random_felt_limbs(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    """Uniform random canonical elements as (8, *shape) limbs.

    Rejection sampling on the top digit keeps the draw uniform over [0, p).
    """
    out = rng.integers(0, 1 << LIMB_BITS, size=(NUM_LIMBS,) + shape, dtype=np.uint32)
    # p's top digit is 52096 and lower digits are [1, 0...0]; values with top
    # digit < 52096 are always < p, values with top digit > 52096 always >= p.
    # Resample top digit into [0, 52096) and accept a tiny non-uniformity of
    # ~2^-112 by excluding top == 52096 (the boundary slice) entirely.
    out[NUM_LIMBS - 1] = rng.integers(0, P_TOP_DIGIT, size=shape, dtype=np.uint32)
    return out


def bytes_to_limbs(data: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 canonical little-endian encodings -> (8, n) uint32.

    Pure vectorized numpy — the fast path for bulk host<->device crossings
    (Python-int conversion costs ~1us/element; this is ~1ns/element).
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if data.ndim != 2 or data.shape[1] != 16:
        raise ValueError("expected (n, 16) byte rows")
    u16 = data.view("<u2")  # (n, 8) 16-bit digits, little-endian
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def limbs_to_bytes(limbs: np.ndarray) -> np.ndarray:
    """(8, n) uint32 limb array -> (n, 16) uint8 canonical encodings."""
    limbs = np.asarray(limbs)
    if limbs.shape[0] != NUM_LIMBS:
        raise ValueError(f"expected limb axis of size {NUM_LIMBS} first")
    u16 = np.ascontiguousarray(limbs.T.astype("<u2"))  # (n, 8)
    return u16.view(np.uint8).reshape(-1, 16)
