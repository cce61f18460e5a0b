"""Hand-tiled Pallas TPU kernel for batched single-block Blake2b-512.

Same function as ops/blake2b.py (RFC 7693, unkeyed, 64-byte digest; the
hash of /root/reference/src/iop/types/merkle.rs:47-55), but laid out for
the VPU explicitly and — crucially — with the whole compression living in
VMEM. The jnp compressor materializes ~100 full-batch word planes in HBM
(measured: a single 2^23-pair Merkle level reserves 5+ GB of XLA temp and
is pure HBM traffic); this kernel touches HBM exactly once per message
word in and once per digest word out.

Layout contract (plane-major — the natural output of limb columns):
  input  planes: (k, n) uint32 — word plane w holds message word w of all
                 n messages (k = ceil(msg_len/4) <= 32, single block);
  output planes: (16, n) uint32 — digest word plane w of all n messages.

Each 64-bit Blake2b word is a (lo, hi) pair of (rows, 128) uint32 tiles;
the 12x8 G ladder is fully unrolled on tiles in VMEM. Bit-exactness vs
hashlib is pinned in tests/test_blake2b.py; equality with the jnp
compressor (and therefore every Merkle golden vector) in interpret mode
on CPU and on real TPU via tests/test_tpu_smoke.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_anatomy_tpu.ops.blake2b import _IV64, _PARAM_XOR, _SIGMA

#: elements per grid step = _ROWS * 128 lanes.
_ROWS = 32


def _rotr(lo, hi, r: int):
    if r == 32:
        return hi, lo
    if r < 32:
        sl, sr = np.uint32(32 - r), np.uint32(r)
        return (lo >> sr) | (hi << sl), (hi >> sr) | (lo << sl)
    r -= 32
    sl, sr = np.uint32(32 - r), np.uint32(r)
    return (hi >> sr) | (lo << sl), (lo >> sr) | (hi << sl)


def _add64(a, b):
    lo = a[0] + b[0]
    return lo, a[1] + b[1] + (lo < a[0]).astype(jnp.uint32)


def _g(v, ai, bi, ci, di, x, y):
    a, b, c, d = v[ai], v[bi], v[ci], v[di]
    a = _add64(_add64(a, b), x)
    d = _rotr(d[0] ^ a[0], d[1] ^ a[1], 32)
    c = _add64(c, d)
    b = _rotr(b[0] ^ c[0], b[1] ^ c[1], 24)
    a = _add64(_add64(a, b), y)
    d = _rotr(d[0] ^ a[0], d[1] ^ a[1], 16)
    c = _add64(c, d)
    b = _rotr(b[0] ^ c[0], b[1] ^ c[1], 63)
    v[ai], v[bi], v[ci], v[di] = a, b, c, d


def _kernel_factory(k: int, msg_len: int):
    """Kernel hashing one (k, R, 128) block of word planes -> (16, R, 128).

    k message word planes (< 32 implies zero padding, done in-register);
    msg_len is the byte counter t of the single final block.
    """
    h_words = list(_IV64)
    h_words[0] ^= _PARAM_XOR
    v_init = h_words + list(_IV64)
    v_init[12] ^= msg_len  # t_lo
    v_init[14] ^= 0xFFFFFFFFFFFFFFFF  # final-block flag

    def kernel(m_ref, o_ref):
        shape = m_ref[0, 0].shape
        zero = jnp.zeros(shape, jnp.uint32)

        def const64(w):
            return (
                jnp.full(shape, np.uint32(w & 0xFFFFFFFF)),
                jnp.full(shape, np.uint32(w >> 32)),
            )

        planes = [m_ref[i, 0] for i in range(k)] + [zero] * (32 - k)
        m = [(planes[2 * i], planes[2 * i + 1]) for i in range(16)]
        v = [const64(w) for w in v_init]
        for r in range(12):
            s = _SIGMA[r]
            _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
        for i in range(8):
            lo0 = np.uint32(h_words[i] & 0xFFFFFFFF)
            hi0 = np.uint32(h_words[i] >> 32)
            o_ref[2 * i, 0] = lo0 ^ v[i][0] ^ v[i + 8][0]
            o_ref[2 * i + 1, 0] = hi0 ^ v[i][1] ^ v[i + 8][1]

    return kernel


def _pick_rows(n: int) -> int:
    rows = _ROWS
    while rows > 8 and n % (rows * 128):
        rows //= 2
    return rows


def supported(n: int, msg_len: int) -> bool:
    """True when the kernel path can hash this batch on this backend."""
    from stark_anatomy_tpu.ops.field_pallas import _on_tpu

    return msg_len <= 128 and n % 1024 == 0 and _on_tpu()


@partial(jax.jit, static_argnames=("msg_len", "interpret"))
def blake2b_planes(planes: jax.Array, msg_len: int, interpret: bool = False) -> jax.Array:
    """(k, n) message word planes -> (16, n) digest word planes.

    Single-block messages only (msg_len <= 128 bytes). n must be a
    multiple of 1024. Caller gates with supported(); no silent fallback.
    """
    k, n = planes.shape
    if msg_len > 128:
        raise ValueError("single-block messages only (msg_len <= 128)")
    if k != (msg_len + 3) // 4:
        raise ValueError(f"expected {(msg_len + 3) // 4} planes, got {k}")
    rows = _pick_rows(n)
    if n % (rows * 128):
        raise ValueError(f"n={n} must be a multiple of 1024")
    blocks = n // (rows * 128)
    xb = planes.reshape(k, blocks, rows, 128)
    spec_in = pl.BlockSpec(
        (k, 1, rows, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_out = pl.BlockSpec(
        (16, 1, rows, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_factory(k, msg_len),
        out_shape=jax.ShapeDtypeStruct((16, blocks, rows, 128), jnp.uint32),
        grid=(blocks,),
        in_specs=[spec_in],
        out_specs=spec_out,
        interpret=interpret,
    )(xb)
    return out.reshape(16, n)
