"""Batched Blake2b-512 on TPU vector lanes (pure jnp / XLA).

The reference hashes Merkle leaves and nodes with Blake2b-512
(/root/reference/src/iop/types/merkle.rs:1,47-55,131-135 via the `blake2`
crate, unkeyed, 64-byte digest). Blake2b is 64-bit-word ARX; TPU VPUs are
32-bit machines, so every 64-bit word is carried as a (lo, hi) pair of
uint32 arrays (SURVEY.md section 7 "Blake2b on TPU"):

- 64-bit add: uint32 add + borrow-free carry (carry = lo_sum < lo_a);
- rotr by 32: swap lo/hi; by 24/16: cross-half shift+or; by 63: rotl 1;
- xor/not: elementwise uint32.

Layout is the classic SIMD formulation: the 16-word state is a 4x4 matrix
held as four (4, batch) row vectors; a round is ONE vectorized G over the
four columns, a diagonalizing roll, one more G, and an un-roll — all
batched over messages (one per lane, thousands per call). Rounds run under
``lax.fori_loop`` with the SIGMA schedule as a gathered constant, keeping
the compiled graph ~100x smaller than a fully unrolled ladder.

Bit-exactness anchor: unkeyed Blake2b-512 == Python
``hashlib.blake2b(digest_size=64)`` (RFC 7693; verified in
tests/test_blake2b.py against hashlib and the RFC "abc" vector).

Digests on device are ``(batch, 16) uint32``: 64 bytes as 16 little-endian
uint32 words (state word h[i] = digest[2i] | digest[2i+1] << 32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32

# RFC 7693 IV (SHA-512 IV).
_IV64 = (
    0x6A09E667F3BCC908,
    0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1,
    0x510E527FADE682D1,
    0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B,
    0x5BE0CD19137E2179,
)
#: Unkeyed Blake2b-512 parameter word: digest_length=64, fanout=1, depth=1.
_PARAM_XOR = 0x0000000001010040

_SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    ],
    dtype=np.int32,
)


def _add64(a_lo, a_hi, b_lo, b_hi):
    lo = a_lo + b_lo
    return lo, a_hi + b_hi + (lo < a_lo).astype(_U32)


def _rotr64(lo, hi, r: int):
    if r == 32:
        return hi, lo
    if r < 32:
        sl, sr = jnp.uint32(32 - r), jnp.uint32(r)
        return (lo >> sr) | (hi << sl), (hi >> sr) | (lo << sl)
    r -= 32
    sl, sr = jnp.uint32(32 - r), jnp.uint32(r)
    return (hi >> sr) | (lo << sl), (lo >> sr) | (hi << sl)


def _g_vec(a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi, x_lo, x_hi, y_lo, y_hi):
    """One G mixing step, vectorized over the 4 columns AND the batch."""
    a_lo, a_hi = _add64(*_add64(a_lo, a_hi, b_lo, b_hi), x_lo, x_hi)
    d_lo, d_hi = _rotr64(d_lo ^ a_lo, d_hi ^ a_hi, 32)
    c_lo, c_hi = _add64(c_lo, c_hi, d_lo, d_hi)
    b_lo, b_hi = _rotr64(b_lo ^ c_lo, b_hi ^ c_hi, 24)
    a_lo, a_hi = _add64(*_add64(a_lo, a_hi, b_lo, b_hi), y_lo, y_hi)
    d_lo, d_hi = _rotr64(d_lo ^ a_lo, d_hi ^ a_hi, 16)
    c_lo, c_hi = _add64(c_lo, c_hi, d_lo, d_hi)
    b_lo, b_hi = _rotr64(b_lo ^ c_lo, b_hi ^ c_hi, 63)
    return a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi


def _quarter_const(words, like):
    """4 u64 constants -> ((4, batch) lo, (4, batch) hi).

    Derived from `like` (as like*0 + const) rather than broadcast fresh, so
    the result carries the same device-varying type as the data under
    shard_map — otherwise the fori_loop carry would mix varying and
    replicated components and fail to trace.
    """
    lo = np.array([w & 0xFFFFFFFF for w in words], dtype=np.uint32)
    hi = np.array([w >> 32 for w in words], dtype=np.uint32)
    expand = (4,) + (1,) * (like.ndim - 1)
    base = like[:4] * jnp.uint32(0)
    return (
        base + jnp.asarray(lo).reshape(expand),
        base + jnp.asarray(hi).reshape(expand),
    )


def _compress(h_lo, h_hi, m_lo, m_hi, t: int, last: bool):
    """One Blake2b compression, batched.

    h_lo/h_hi: (8, batch) state halves; m_lo/m_hi: (16, batch) message
    halves. t (byte counter) and `last` are compile-time constants — our
    message lengths are always static.
    """
    a_lo, a_hi = h_lo[:4], h_hi[:4]
    b_lo, b_hi = h_lo[4:], h_hi[4:]
    c_lo, c_hi = _quarter_const(_IV64[:4], h_lo)
    # v12 ^= t, v14 = ~v14 on the last block: fold into the constants.
    d_words = [
        _IV64[4] ^ (t & 0xFFFFFFFFFFFFFFFF),
        _IV64[5] ^ (t >> 64),
        _IV64[6] ^ (0xFFFFFFFFFFFFFFFF if last else 0),
        _IV64[7],
    ]
    d_lo, d_hi = _quarter_const(d_words, h_lo)
    sigma = jnp.asarray(_SIGMA)

    def round_body(rnd, v):
        a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi = v
        s = sigma[rnd]
        pm_lo, pm_hi = m_lo[s], m_hi[s]
        # Column step: G on (v0,v4,v8,v12)..(v3,v7,v11,v15).
        a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi = _g_vec(
            a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi,
            pm_lo[0:8:2], pm_hi[0:8:2], pm_lo[1:8:2], pm_hi[1:8:2],
        )
        # Diagonalize: lane i becomes (v_i, v_{4+(i+1)%4}, v_{8+(i+2)%4}, ...).
        b_lo, b_hi = jnp.roll(b_lo, -1, 0), jnp.roll(b_hi, -1, 0)
        c_lo, c_hi = jnp.roll(c_lo, -2, 0), jnp.roll(c_hi, -2, 0)
        d_lo, d_hi = jnp.roll(d_lo, -3, 0), jnp.roll(d_hi, -3, 0)
        a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi = _g_vec(
            a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi,
            pm_lo[8:16:2], pm_hi[8:16:2], pm_lo[9:16:2], pm_hi[9:16:2],
        )
        b_lo, b_hi = jnp.roll(b_lo, 1, 0), jnp.roll(b_hi, 1, 0)
        c_lo, c_hi = jnp.roll(c_lo, 2, 0), jnp.roll(c_hi, 2, 0)
        d_lo, d_hi = jnp.roll(d_lo, 3, 0), jnp.roll(d_hi, 3, 0)
        return a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi

    v = (a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi)
    a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi = jax.lax.fori_loop(
        0, 12, round_body, v
    )
    # h[i] ^= v[i] ^ v[i+8]
    out_lo = jnp.concatenate([h_lo[:4] ^ a_lo ^ c_lo, h_lo[4:] ^ b_lo ^ d_lo], axis=0)
    out_hi = jnp.concatenate([h_hi[:4] ^ a_hi ^ c_hi, h_hi[4:] ^ b_hi ^ d_hi], axis=0)
    return out_lo, out_hi


def _init_state(like):
    """Initial h from a (>=8, batch) data template (varying-type safe)."""
    words = list(_IV64)
    words[0] ^= _PARAM_XOR
    lo = np.array([w & 0xFFFFFFFF for w in words], dtype=np.uint32)
    hi = np.array([w >> 32 for w in words], dtype=np.uint32)
    expand = (8,) + (1,) * (like.ndim - 1)
    base = like[:8] * jnp.uint32(0)
    return (
        base + jnp.asarray(lo).reshape(expand),
        base + jnp.asarray(hi).reshape(expand),
    )


def _to_planes(words_t: jax.Array) -> jax.Array:
    """(k, batch) -> (k, rows, 128) word planes (batch padded to 128).

    The batch then spans full (rows, 128) VPU tiles — one relayout at the
    boundary instead of half-empty sublane tiles through all 12 rounds.
    """
    k, batch = words_t.shape
    rows = (batch + 127) // 128
    pad = rows * 128 - batch
    if pad:
        words_t = jnp.concatenate(
            [words_t, jnp.zeros((k, pad), dtype=_U32)], axis=1
        )
    return words_t.reshape(k, rows, 128)


@partial(jax.jit, static_argnames=("msg_len",))
def blake2b_u32(msg_words: jax.Array, msg_len: int) -> jax.Array:
    """Batched unkeyed Blake2b-512 over fixed-length messages.

    msg_words: (batch, ceil(msg_len/4)) uint32 — the message bytes as
    little-endian uint32 words (trailing bytes of the last word zero).
    msg_len: length in BYTES (static). Returns (batch, 16) uint32 digests
    (64 bytes as little-endian words).
    """
    if msg_len == 0:
        raise ValueError("empty messages not supported (not needed by the IOP)")
    batch = msg_words.shape[0]
    n_words = (msg_len + 3) // 4
    if msg_words.shape[1] != n_words:
        raise ValueError(f"expected {n_words} message words, got {msg_words.shape[1]}")
    n_blocks = (msg_len + 127) // 128
    pad = n_blocks * 32 - n_words
    if pad:
        msg_words = jnp.concatenate(
            [msg_words, jnp.zeros((batch, pad), dtype=_U32)], axis=1
        )
    planes = _to_planes(msg_words.T)  # (32*n_blocks, rows, 128)
    h_lo, h_hi = _init_state(planes)
    for blk in range(n_blocks):
        block = planes[32 * blk : 32 * (blk + 1)]
        m_lo = block[0::2]  # (16, rows, 128)
        m_hi = block[1::2]
        last = blk == n_blocks - 1
        t = msg_len if last else 128 * (blk + 1)
        h_lo, h_hi = _compress(h_lo, h_hi, m_lo, m_hi, t, last)
    out = jnp.stack([h_lo, h_hi], axis=1).reshape(16, -1)  # (16, rows*128)
    return out[:, :batch].T


@jax.jit
def merkle_node_hash(left: jax.Array, right: jax.Array) -> jax.Array:
    """Blake2b-512(left || right) for batches of 64-byte digests.

    left/right: (batch, 16) uint32 digests. The 128-byte concatenation is
    exactly one Blake2b block, so a Merkle reduction level is ONE fused
    compression call (merkle.rs:47-55 semantics).
    """
    batch = left.shape[0]
    msg = jnp.concatenate([left, right], axis=1)  # (batch, 32)
    planes = _to_planes(msg.T)
    m_lo = planes[0::2]
    m_hi = planes[1::2]
    h_lo, h_hi = _init_state(m_lo)
    h_lo, h_hi = _compress(h_lo, h_hi, m_lo, m_hi, 128, True)
    out = jnp.stack([h_lo, h_hi], axis=1).reshape(16, -1)
    return out[:, :batch].T


# -- host-side helpers (exact, tiny) ---------------------------------------


def digests_to_bytes(digests: np.ndarray) -> list[bytes]:
    """(batch, 16) uint32 device digests -> list of 64-byte strings."""
    arr = np.asarray(digests, dtype="<u4")
    return [row.tobytes() for row in arr]


def bytes_to_digest_words(digest: bytes) -> np.ndarray:
    if len(digest) != 64:
        raise ValueError("expected a 64-byte digest")
    return np.frombuffer(digest, dtype="<u4").copy()


def pack_bytes_to_u32(data: np.ndarray) -> np.ndarray:
    """(batch, L) uint8 -> (batch, ceil(L/4)) little-endian uint32 words."""
    batch, length = data.shape
    padded = length + (-length % 4)
    if padded != length:
        buf = np.zeros((batch, padded), dtype=np.uint8)
        buf[:, :length] = data
        data = buf
    return data.view("<u4").reshape(batch, padded // 4)
