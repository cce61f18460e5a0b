"""Radix-2 NTT / iNTT, coset low-degree extension, polynomial multiply.

Absent in the reference (SURVEY.md section 0) — this implements the
polynomial layer the STARK stack needs, TPU-first:

- codewords are Montgomery-form limb arrays of shape ``(8, n)``
  (ops/limbs.py); all butterflies are vectorized VPU ops, no scalar loops;
- iterative decimation-in-time over the 2-adic subgroup of F_p
  (2-adicity 119, ops/field.py), in a self-sorting constant-geometry
  form (one lax.scan stage body — no bit-reversal pass, no per-stage
  graph unrolling);
- twiddle tables are built ON DEVICE by repeated doubling (log n batched
  Montgomery multiplies) — no host big-int loops on the hot path;
- low-degree extension evaluates on a coset offset*<omega_L> so the LDE
  domain is disjoint from the trace domain (required by the DEEP-style
  quotienting in iop/stark.py).

Conventions: `ntt` maps coefficients (natural order) -> evaluations on
<omega_n> in natural order (eval[i] = P(omega^i)); `intt` is its exact
inverse. Everything is exact integer math — outputs are bit-identical on
CPU and TPU and across mesh shapes (the sharded variant in
parallel/ntt_sharded.py is tested to match element-for-element).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops.field import PRIME, finv, primitive_root_of_unity
from stark_anatomy_tpu.ops.limbs import NUM_LIMBS, int_to_limbs

__all__ = [
    "ntt",
    "intt",
    "coset_lde",
    "coset_evaluate",
    "coset_interpolate",
    "poly_mul",
    "powers",
    "bit_reverse_indices",
]


def _is_pow2(n: int) -> bool:
    return n >= 1 and (n & (n - 1)) == 0


@lru_cache(maxsize=64)
def bit_reverse_indices(n: int) -> np.ndarray:
    """Permutation indices reversing log2(n)-bit indices (host, cached)."""
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@partial(jax.jit, static_argnames=("count",))
def _powers_device(base_mont: jax.Array, count: int) -> jax.Array:
    """[1, w, w^2, ..., w^(count-1)] in Montgomery form (power-of-two count).

    Two equivalent constructions (mont_mul is canonical-in/canonical-out,
    so w^i has exactly one limb image — the choice cannot change a bit):

    - TPU: unrolled doubling — table [w^0..w^(L-1)] extends to 2L by one
      Pallas mont_mul per step. Minimal FLOPs (sum of widths = count
      total products) and a tiny graph (one custom call per step), so
      both runtime and compile stay cheap: the 2^24 table builds in tens
      of milliseconds.
    - elsewhere (XLA:CPU — the test/virtual-mesh backend): a fixed-shape
      lax.scan over the bit decomposition, powers[i] = prod over set
      bits b of w^(2^b). log2(count)-fold more multiplies, but the
      unrolled jnp doubling graph cost tens of seconds of XLA:CPU
      compile per distinct count, which dominated the suite and the
      driver dry run; the scan compiles in ~1s.
    """
    # The scan below reads exactly count.bit_length()-1 bits, which
    # silently drops the top bit for non-power-of-two counts (count=5
    # would yield powers[4] = 1). powers() rounds up before calling, but
    # enforce it here so a future direct caller fails loudly (ADVICE r3).
    if count & (count - 1):
        raise ValueError(f"count must be a power of two, got {count}")
    one_m = jnp.asarray(int_to_limbs((1 << 128) % PRIME), dtype=jnp.uint32)
    if count == 1:
        return one_m.reshape(NUM_LIMBS, 1)

    from stark_anatomy_tpu.ops import field_pallas as fp

    if fp._on_tpu():
        table = one_m.reshape(NUM_LIMBS, 1)
        w_k = base_mont.reshape(NUM_LIMBS, 1)
        while table.shape[1] < count:
            ext = fp.mont_mul(table, jnp.broadcast_to(w_k, table.shape))
            table = jnp.concatenate([table, ext], axis=1)
            w_k = fp.mont_mul(w_k, w_k)
        return table

    bits = count.bit_length() - 1
    idx = jnp.arange(count, dtype=jnp.uint32)
    acc = jnp.tile(one_m.reshape(NUM_LIMBS, 1), (1, count))

    def step(carry, b):
        acc, w_k = carry
        sel = ((idx >> b) & jnp.uint32(1)) != 0
        ext = fj.mont_mul(acc, jnp.broadcast_to(w_k, acc.shape))
        acc = jnp.where(sel[None, :], ext, acc)
        w_k = fj.mont_mul(w_k, w_k)
        return (acc, w_k), None

    (acc, _), _ = jax.lax.scan(
        step,
        (acc, base_mont.reshape(NUM_LIMBS, 1)),
        jnp.arange(bits, dtype=jnp.uint32),
    )
    return acc


_TWIDDLE_CACHE: dict = {}


def _twiddles(n: int, inverse: bool):
    """(8, n//2) Montgomery-form table [w^0 .. w^(n/2-1)], w = omega_n^(+-1).

    Cached as a CONCRETE host array. When first requested inside a
    jit/shard_map trace the result is a tracer — returned uncached (the
    table is recomputed per trace, log n batched mont_muls) so the cache
    never leaks a tracer across traces.
    """
    key = (n, inverse)
    if key in _TWIDDLE_CACHE:
        return _TWIDDLE_CACHE[key]
    w = primitive_root_of_unity(n)
    if inverse:
        w = finv(w)
    w_mont = jnp.asarray(int_to_limbs(w * (1 << 128) % PRIME), dtype=jnp.uint32)
    tab = _powers_device(w_mont, max(n // 2, 1))
    if isinstance(tab, jax.core.Tracer):
        return tab
    _TWIDDLE_CACHE[key] = np.asarray(tab)
    return _TWIDDLE_CACHE[key]


def powers(base: int, count: int) -> jax.Array:
    """(8, count) Montgomery-form powers [base^0 .. base^(count-1)].

    count is rounded up to a power of two internally and truncated.
    """
    cap = 1
    while cap < count:
        cap *= 2
    base_mont = jnp.asarray(int_to_limbs(base * (1 << 128) % PRIME), dtype=jnp.uint32)
    return _powers_device(base_mont, cap)[:, :count]


@partial(jax.jit, static_argnames=("stages",))
def _ntt_core(x: jax.Array, tw: jax.Array, stages: int) -> jax.Array:
    """Constant-geometry (Pease-style, self-sorting) DIT butterflies.

    x: (8, *batch, n) Montgomery form in NATURAL order; output is the
    natural-order transform (eval[k] = P(omega^k)). tw: (8, n//2)
    twiddles [w^0 .. w^(n/2-1)].

    Every stage has the SAME shape of work — gather the butterfly operand
    pairs, multiply by a gathered twiddle row, write sums to the low half
    and differences to the high half — so the whole transform is ONE
    lax.scan over a per-stage halving stride, and the compiled graph is
    one stage-body big (the former stage-unrolled form took ~25-55s of
    XLA:CPU compile per distinct shape; this compiles in ~2s).

    Derivation: with m = 2^s subtransform results laid out k-major
    (position = k * (n/m) + b for subproblem b), the DIT combine step
    pairs positions (i', i' + halfc) where halfc = n/(2m) and
    i' = ((i & ~mask) << 1) | (i & mask), mask = halfc - 1, writing
    E + w^(i & ~mask) * O to position i and E - ... to i + n/2. The
    identity starts at m = 1 (natural input) and ends at m = n (natural
    output), with no separate bit-reversal pass. Outputs are
    bit-identical to any correct radix-2 NTT (exact field math, canonical
    Montgomery representatives).
    """
    n = x.shape[-1]
    half = n // 2
    i = jnp.arange(half, dtype=jnp.uint32)
    wshape = (NUM_LIMBS,) + (1,) * (x.ndim - 2) + (half,)
    halfcs = jnp.asarray([n >> (s + 1) for s in range(stages)], dtype=jnp.uint32)

    def stage(x, halfc):
        mask = halfc - jnp.uint32(1)
        e_idx = ((i & ~mask) << jnp.uint32(1)) | (i & mask)
        e = jnp.take(x, e_idx, axis=-1)
        o = jnp.take(x, e_idx + halfc, axis=-1)
        w = jnp.take(tw, i & ~mask, axis=-1).reshape(wshape)
        t = fj.mont_mul(o, jnp.broadcast_to(w, o.shape))
        return jnp.concatenate([fj.add(e, t), fj.sub(e, t)], axis=-1), None

    x, _ = jax.lax.scan(stage, x, halfcs)
    return x


def _use_pallas(x: jax.Array) -> bool:
    """True when the hand-tiled TPU kernels should take this transform."""
    import os

    if os.environ.get("STARK_ANATOMY_DISABLE_PALLAS"):
        return False
    if x.ndim != 2 or x.shape[-1] < 2048 or isinstance(x, jax.core.Tracer):
        return False
    from stark_anatomy_tpu.ops import field_pallas as fp

    return fp._on_tpu()


def ntt_jnp(coeffs_mont: jax.Array) -> jax.Array:
    """Pure-jnp forward transform (any backend, any batch shape)."""
    n = coeffs_mont.shape[-1]
    if not _is_pow2(n):
        raise ValueError(f"NTT size must be a power of two, got {n}")
    if n == 1:
        return coeffs_mont
    return _ntt_core(
        coeffs_mont, jnp.asarray(_twiddles(n, inverse=False)), n.bit_length() - 1
    )


def intt_jnp(evals_mont: jax.Array) -> jax.Array:
    """Pure-jnp inverse transform (any backend, any batch shape)."""
    n = evals_mont.shape[-1]
    if not _is_pow2(n):
        raise ValueError(f"NTT size must be a power of two, got {n}")
    if n == 1:
        return evals_mont
    y = _ntt_core(
        evals_mont, jnp.asarray(_twiddles(n, inverse=True)), n.bit_length() - 1
    )
    n_inv_mont = fj.full((1,) * (y.ndim - 1), finv(n), mont=True)
    return fj.mont_mul(y, jnp.broadcast_to(n_inv_mont, y.shape))


def ntt(coeffs_mont: jax.Array) -> jax.Array:
    """Coefficients -> evaluations on <omega_n>, natural order, Montgomery form.

    Transforms the last axis; leading axes (after the limb axis) are batch.
    Dispatches to the Pallas TPU kernels (ops/ntt_pallas.py) for large 2-D
    codewords on TPU; results are bit-identical either way.
    """
    if _use_pallas(coeffs_mont):
        from stark_anatomy_tpu.ops import ntt_pallas as ntp

        return ntp._ntt_pallas_impl(coeffs_mont, False, False)
    return ntt_jnp(coeffs_mont)


def intt(evals_mont: jax.Array) -> jax.Array:
    """Inverse NTT: evaluations on <omega_n> -> coefficients (batched)."""
    if _use_pallas(evals_mont):
        from stark_anatomy_tpu.ops import ntt_pallas as ntp

        return ntp._ntt_pallas_impl(evals_mont, True, False)
    return intt_jnp(evals_mont)


#: Above this coset-evaluation domain, TPU runs switch to the decimated
#: form (coset_evaluate_decimated): the monolithic Pallas transform at
#: 2^26 needs ~11 GB of HBM by itself (measured by ballast probing —
#: input + 2.1 GB of stage tables + bit-reversal/stage transients), which
#: cannot coexist with ANY prover state on a 16 GB chip.
_COSET_MONO_MAX = 1 << 25


def coset_evaluate_decimated(
    coeffs_mont: jax.Array,
    domain_len: int,
    offset: int,
    sub_max: int = 1 << 24,
    chunk: int = 1 << 23,
) -> jax.Array:
    """coset_evaluate via input decimation — big domains, bounded HBM.

    With S = domain_len / sub_max: P(x) = sum_{j<S} x^j * P_j(x^S), and
    on the coset x_k = offset * w^k the argument x_k^S = offset^S *
    (w^S)^k is sub_max-PERIODIC in k (w^S has order sub_max), so each
    P_j evaluates with one ordinary sub_max-point coset transform and
    the outer sum is a chunked Horner in x. Identical field values to
    the monolithic transform (exact polynomial identity, canonical
    Montgomery representatives — pinned by tests), but the largest
    allocation is one sub_max transform (+ the S stored sub-evals),
    ~5 GB at L = 2^26 instead of ~11, and the L-point stage tables are
    never built.
    """
    from stark_anatomy_tpu.ops import field_pallas as _fp
    from stark_anatomy_tpu.ops.limbs import int_to_limbs as _itl

    L = domain_len
    n = coeffs_mont.shape[-1]
    s = L // sub_max
    if s <= 1:
        return coset_evaluate(coeffs_mont, domain_len, offset)
    if chunk > sub_max:
        chunk = sub_max
    off_s = pow(offset, s, PRIME)
    subs = []
    for j in range(s):
        pj = coeffs_mont[:, j::s]
        subs.append(coset_evaluate(pj, sub_max, off_s))
        # Serialize sub-transforms: queued transforms stack their
        # transient working sets (async dispatch) and OOM.
        np.asarray(subs[-1][:1, :1])
    w = primitive_root_of_unity(L)
    base = powers(w, chunk)

    def _cm(value: int) -> jax.Array:
        c = jnp.asarray(_itl(value * (1 << 128) % PRIME), dtype=jnp.uint32)
        return jnp.broadcast_to(c.reshape(8, 1), (8, chunk))

    parts = []
    for c in range(L // chunk):
        sc = offset * pow(w, c * chunk, PRIME) % PRIME
        xc = _fp.mont_mul(base, _cm(sc))
        m0 = (c * chunk) % sub_max
        sl = slice(m0, m0 + chunk)
        acc = subs[s - 1][:, sl]
        for j in range(s - 2, -1, -1):
            acc = _fp.add(_fp.mont_mul(acc, xc), subs[j][:, sl])
        parts.append(acc)
    del subs
    return jnp.concatenate(parts, axis=1)


def coset_evaluate(coeffs_mont: jax.Array, domain_len: int, offset: int) -> jax.Array:
    """Evaluate a polynomial on the coset offset*<omega_L>, L = domain_len.

    coeffs may be shorter than L (zero-padded). Returns (8, L) evaluations,
    eval[i] = P(offset * omega_L^i), Montgomery form. Domains past
    _COSET_MONO_MAX on TPU route through the decimated form (same values).
    """
    n = coeffs_mont.shape[-1]
    if n > domain_len:
        raise ValueError("polynomial longer than the target domain")
    from stark_anatomy_tpu.ops import field_pallas as _fp_gate

    if domain_len > _COSET_MONO_MAX and _fp_gate._on_tpu():
        return coset_evaluate_decimated(coeffs_mont, domain_len, offset)
    off = powers(offset, n)
    # field_pallas.mont_mul: VMEM-tiled on TPU (the full-tensor fj
    # multiply materializes ~50 limb planes of XLA temp — 3 GB at
    # n = 2^24), transparent fj fallback elsewhere; identical values.
    from stark_anatomy_tpu.ops import field_pallas as _fp

    scaled = _fp.mont_mul(coeffs_mont, off)
    if n < domain_len:
        pad = fj.zeros((domain_len - n,))
        scaled = jnp.concatenate([scaled, pad], axis=1)
    return ntt(scaled)


def coset_interpolate(evals_mont: jax.Array, offset: int) -> jax.Array:
    """Inverse of coset_evaluate at the same length: evals -> coefficients."""
    n = evals_mont.shape[-1]
    coeffs_scaled = intt(evals_mont)
    off_inv = powers(finv(offset), n)
    return fj.mont_mul(coeffs_scaled, off_inv)


def coset_lde(
    coeffs_mont: jax.Array, blowup: int, offset: int
) -> jax.Array:
    """Low-degree extension: length-n coefficients -> blowup*n coset evals."""
    n = coeffs_mont.shape[-1]
    if not _is_pow2(blowup):
        raise ValueError("blowup must be a power of two")
    return coset_evaluate(coeffs_mont, n * blowup, offset)


def poly_mul(a_mont: jax.Array, b_mont: jax.Array) -> jax.Array:
    """Dense polynomial product via NTT. Output length = len(a)+len(b)-1."""
    la, lb = a_mont.shape[-1], b_mont.shape[-1]
    out_len = la + lb - 1
    n = 1
    while n < out_len:
        n *= 2
    pa = jnp.concatenate([a_mont, fj.zeros((n - la,))], axis=1)
    pb = jnp.concatenate([b_mont, fj.zeros((n - lb,))], axis=1)
    prod = fj.mont_mul(ntt(pa), ntt(pb))
    return intt(prod)[:, :out_len]
