#!/usr/bin/env python
"""Speed-of-light accounting for the hot kernels (BASELINE.md).

Measures on the current backend:
  1. empirical VPU u32 throughput — a Pallas kernel that runs K
     multiply-add pairs per element on VMEM-resident tiles (compute-bound
     by construction); this is the realistic "speed of light" for limb
     arithmetic, independent of spec-sheet assumptions;
  2. empirical HBM bandwidth — a streaming copy over a large array;
  3. the headline NTT (ops/ntt_pallas.py) at 2^24, translated into u32
     ops/s via the static per-butterfly op count of the Pallas kernels
     (field_pallas._mont_mul_digits + add/sub: counted below), reported
     as a fraction of (1);
  4. device Blake2b-512 (ops/blake2b.py) leaf hashing, translated into
     u32 ops/s via the per-compression ARX op count, as a fraction of (1).

Prints a human-readable report; run on the bench chip each round and
paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x) -> float:
    _ = int(np.asarray(x.reshape(-1)[:1])[0])
    return time.perf_counter()


# -- per-butterfly / per-compression static op counts -----------------------
#
# field_pallas._mont_mul_digits: 64 schoolbook steps x (mul, and, shift,
# 2 adds) = 320; 8 REDC steps x ~11 = 88; 8 normalize x 3 = 24;
# _cond_sub_p ~42  -> ~474 u32 ops.
# _add_digits ~74 (incl. cond-sub), _sub_digits ~60.
MONT_MUL_OPS = 474
BUTTERFLY_OPS = MONT_MUL_OPS + 74 + 60  # mul + add + sub = ~608

# ops/blake2b.py: 12 rounds x 8 G-functions; each G (64-bit words as u32
# pairs): 4x 64-bit adds (~6 u32 ops each: 2 add, carry detect/add), 4x
# 64-bit xors (2 ops), 4x rotations (~6 ops: shifts+or on the pair)
# ~= 4*6 + 4*2 + 4*6 = 56 ops -> 12*8*56 = 5376, plus init/final xors
# ~64 -> ~5440 u32 ops per 128-byte compression.
BLAKE2B_COMPRESS_OPS = 5440


# -- 1. empirical VPU u32 peak ----------------------------------------------


def _vpu_kernel(x_ref, o_ref, *, iters: int, lanes: int):
    a = x_ref[...]
    b = a | np.uint32(1)
    # `lanes` independent dependency chains: a single serial
    # multiply-add chain measures instruction LATENCY, not throughput
    # (round-2 fix: the serial version reported a "peak" the production
    # NTT exceeded by 2x).
    accs = [a + np.uint32(k) for k in range(lanes)]
    for _ in range(iters):
        accs = [acc * b + a for acc in accs]  # 2 u32 ops per element each
    out = accs[0]
    for acc in accs[1:]:
        out ^= acc
    o_ref[...] = out


def measure_vpu_u32(iters: int = 256, rows: int = 512, lanes: int = 8) -> float:
    """Achieved u32 ops/s on compute-bound independent multiply-add chains."""
    n = rows * 128 * 64  # 64 grid steps
    x = jnp.arange(n, dtype=jnp.uint32).reshape(64, rows, 128)
    spec = pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            partial(_vpu_kernel, iters=iters, lanes=lanes),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(64,),
            in_specs=[spec],
            out_specs=spec,
        )(x)

    y = run(x)
    t0 = _sync(y)
    reps = 8
    for _ in range(reps):
        y = run(y)
    t1 = _sync(y)
    ops = 2.0 * iters * lanes * n * reps
    return ops / (t1 - t0)


# -- 2. empirical HBM bandwidth ---------------------------------------------


def measure_hbm_bw(log2_bytes: int = 30) -> float:
    """Bytes/s for a read+write streaming pass (copy via elementwise add)."""
    n = 1 << (log2_bytes - 2)
    x = jnp.zeros((n,), dtype=jnp.uint32)

    @jax.jit
    def run(x):
        return x + np.uint32(1)

    y = run(x)
    t0 = _sync(y)
    reps = 8
    for _ in range(reps):
        y = run(y)
    t1 = _sync(y)
    return 2.0 * 4 * n * reps / (t1 - t0)  # read + write


# -- 3. NTT ------------------------------------------------------------------


def measure_ntt(log2n: int = 24, reps: int = 5) -> float:
    from stark_anatomy_tpu.ops import ntt_pallas as ntp
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    n = 1 << log2n
    rng = np.random.default_rng(0)
    x = jnp.asarray(random_felt_limbs(rng, (n,)))
    y = ntp.ntt(x)
    t0 = _sync(y)
    for _ in range(reps):
        y = ntp.ntt(y)
    t1 = _sync(y)
    return (n // 2) * log2n * reps / (t1 - t0)  # butterflies/s


# -- 4. Blake2b --------------------------------------------------------------


def measure_blake2b(log2n: int = 20, reps: int = 5) -> float:
    from stark_anatomy_tpu.ops.blake2b import blake2b_u32

    n = 1 << log2n
    msg = jnp.arange(n * 32, dtype=jnp.uint32).reshape(n, 32)
    d = blake2b_u32(msg, msg_len=128)
    t0 = _sync(d)
    for _ in range(reps):
        d = blake2b_u32(msg, msg_len=128)
    t1 = _sync(d)
    return n * reps / (t1 - t0)  # single-compression hashes/s


def measure_blake2b_pallas(log2n: int = 22, reps: int = 5) -> float | None:
    """The production Merkle-level compressor (ops/blake2b_pallas.py),
    plane-major layout as in iop/merkle.py. None off-TPU."""
    from stark_anatomy_tpu.ops import blake2b_pallas as bp

    n = 1 << log2n
    if not bp.supported(n, 128):
        return None
    msg = jnp.arange(32 * n, dtype=jnp.uint32).reshape(32, n)

    @jax.jit
    def level(planes):
        d = bp.blake2b_planes(planes, 128)  # (16, n)
        return jnp.concatenate([d, d], axis=0)  # feed back as (32, n)

    y = level(msg)
    t0 = _sync(y)
    for _ in range(reps):
        y = level(y)
    t1 = _sync(y)
    return n * reps / (t1 - t0)


# -- sharded-NTT communication model ----------------------------------------
#
# Published per-chip link numbers (jax-ml.github.io/scaling-book): v5e ICI
# 4.5e10 B/s unidirectional per chip per torus axis; v5p 9e10 B/s. Hosts
# WITHIN a pod (v5e: up to 256 chips, v5p: up to 8960) are on the ICI
# torus — "2 hosts" rides ICI, not ethernet; DCN (~2.5e10 B/s per HOST of
# 8 chips, i.e. ~3.1e9 per chip, on 2x100GbE) applies only across pods.
# These are model PARAMETERS; the all-to-all counts are pinned
# structurally in tests/test_mesh.py::test_sharded_ntt_all_to_all_counts.
FABRICS = (("v5e-ICI", 4.5e10), ("v5p-ICI", 9.0e10), ("x-pod-DCN", 2.5e10 / 8))
FELT_BYTES_ON_WIRE = 32  # 8 u32 limb planes


def comm_model(
    log2n: int = 24,
    bfly_per_s: float = 2.15e9,
    shard_counts=(4, 8, 16, 32, 64),
) -> None:
    """Analytic bytes-on-wire + predicted scaling efficiency table.

    The LDE chain (parallel/ntt_sharded.sharded_lde) is the
    communication-heavy prover unit: iNTT natural->cyclic (2 all-to-alls
    of the omicron codeword) + coset NTT cyclic->natural (2 all-to-alls
    of the FRI codeword). Each tiled all-to-all moves (S-1)/S of every
    device's local bytes across the fabric; per chip that is
    local_bytes * (S-1)/S through its own links, so per LDE

        t_comm  = 2 * 1.25 * local_bytes * (S-1)/S / link_bw
        t_comp  = 1.25 * (n/S) * log2(n) / bfly_per_s   (measured kernel rate)
        eff(S)  = t_comp / (t_comp + t_comm)            (no overlap assumed)

    (x1.25: the iNTT half runs on the n/4 omicron domain at blowup 4.)
    NTT-only efficiency is the worst case — Merkle commits, quotient
    arithmetic and FRI folds scale with zero all-to-alls, so full-prove
    efficiency is strictly higher than this table.
    """
    n = 1 << log2n
    print(
        f"\nsharded-LDE comm model @ n=2^{log2n} "
        f"(4 all-to-alls/LDE, {FELT_BYTES_ON_WIRE} B/element on wire, "
        f"kernel rate {bfly_per_s:.2e} bfly/s):"
    )
    hdr = "  S    bytes/chip   t_comp    " + "".join(
        f"  eff {name:<10s}" for name, _ in FABRICS
    )
    print(hdr)
    for s_count in shard_counts:
        local_bytes = n // s_count * FELT_BYTES_ON_WIRE
        wire = 1.25 * 2 * local_bytes * (s_count - 1) / s_count
        t_comp = 1.25 * (n // s_count) * log2n / bfly_per_s
        effs = []
        for _, bw in FABRICS:
            t_comm = wire / bw
            effs.append(t_comp / (t_comp + t_comm))
        print(
            f"  {s_count:<4d} {wire:>.3e}  {t_comp * 1e3:7.2f} ms"
            + "".join(f"  {100 * e:11.1f}%  " for e in effs)
        )
    print(
        "  (counts pinned by tests/test_mesh.py::test_sharded_ntt_all_to_all_counts;"
        " 2 hosts = 16 chips on the ICI columns)"
    )


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    vpu = measure_vpu_u32()
    print(f"empirical VPU u32 peak: {vpu:.3e} ops/s")
    bw = measure_hbm_bw()
    print(f"empirical HBM bandwidth: {bw / 1e9:.1f} GB/s")

    bfly = measure_ntt()
    ntt_ops = bfly * BUTTERFLY_OPS
    # HBM bound: the fused kernels stream the (8, n) codeword ~once per
    # stage-group; measure_ntt's achieved bytes/s is not separable here,
    # so report the compute fraction (the binding constraint at 2^24).
    print(
        f"NTT @ 2^24: {bfly:.3e} butterflies/s = {ntt_ops:.3e} u32 ops/s "
        f"= {100 * ntt_ops / vpu:.1f}% of empirical VPU peak "
        f"({BUTTERFLY_OPS} ops/butterfly)"
    )

    h = measure_blake2b()
    hash_ops = h * BLAKE2B_COMPRESS_OPS
    print(
        f"Blake2b-512 (jnp) @ 2^20 leaves: {h:.3e} hashes/s = {hash_ops:.3e} u32 ops/s "
        f"= {100 * hash_ops / vpu:.1f}% of empirical VPU peak "
        f"({BLAKE2B_COMPRESS_OPS} ops/compression)"
    )

    hp = measure_blake2b_pallas()
    if hp is not None:
        hp_ops = hp * BLAKE2B_COMPRESS_OPS
        print(
            f"Blake2b-512 (Pallas, production Merkle path) @ 2^22 msgs: "
            f"{hp:.3e} hashes/s = {hp_ops:.3e} u32 ops/s "
            f"= {100 * hp_ops / vpu:.1f}% of empirical VPU peak"
        )

    comm_model()


if __name__ == "__main__":
    main()
