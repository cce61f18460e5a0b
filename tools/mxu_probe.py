#!/usr/bin/env python
"""MXU feasibility probe for field arithmetic (BASELINE.md design note).

Question (VERDICT round 1, item 4): should the limb arithmetic move from
the VPU (current 8x16-bit u32 schoolbook, ops/limbs.py) to the MXU via
matmuls? The MXU only pays off where a matmul has a SHARED contraction
operand — i.e. a radix-B NTT step written as a (batch, B) x (B, B)
twiddle matmul — not for pointwise Montgomery products (those are
per-element rank-1 outer products with zero operand reuse, so the
systolic array would run at 1/B utilization).

This probe measures the one primitive such a matmul-NTT needs: an EXACT
unsigned-integer matmul on the MXU. 16-bit limbs are split into two
8-bit digits; digit values < 256 are exactly representable in bfloat16,
and the MXU forms their products and accumulates in float32
(preferred_element_type=float32), so a K<=256 contraction of 8x8-bit
products stays under 2^24 and is exact. One u16xu16->u32 matmul = 4
digit matmuls recombined with u32 shifts.

Reports:
  - exactness vs a numpy integer matmul (hard assert);
  - achieved limb-MACs/s (M*N*K per matmul) and the digit-matmul FLOPs/s
    the MXU actually sustained;
  - the equivalent butterflies/s if a radix-128 NTT stage ran at this
    rate (64 limb-MACs per butterfly-equivalent element-twiddle product,
    x2 for Montgomery reduction), for side-by-side comparison with the
    measured VPU NTT in tools/roofline.py.

Run on the bench chip; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"),
)

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    _ = int(np.asarray(x.reshape(-1)[:1])[0])
    return time.perf_counter()


@jax.jit
def u16_matmul_mxu(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact (M,K)u16 x (K,N)u16 -> (M,N)u32 mod 2^32 via 4 bf16 MXU matmuls.

    Requires K <= 256 so each digit-product contraction stays exact in
    float32 (255*255*256 < 2^24); the recombination shifts are u32.
    """
    a_lo = (a & 0xFF).astype(jnp.bfloat16)
    a_hi = (a >> 8).astype(jnp.bfloat16)
    b_lo = (b & 0xFF).astype(jnp.bfloat16)
    b_hi = (b >> 8).astype(jnp.bfloat16)

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32).astype(jnp.uint32)

    ll = mm(a_lo, b_lo)
    lh = mm(a_lo, b_hi)
    hl = mm(a_hi, b_lo)
    hh = mm(a_hi, b_hi)
    return ll + ((lh + hl) << 8) + (hh << 16)


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # -- exactness ------------------------------------------------------
    rng = np.random.default_rng(0)
    K = 128  # the radix of a matmul-NTT stage; 255^2 * 128 < 2^24 => exact
    a_np = rng.integers(0, 1 << 16, size=(512, K), dtype=np.uint16)
    b_np = rng.integers(0, 1 << 16, size=(K, 512), dtype=np.uint16)
    want = (a_np.astype(np.uint64) @ b_np.astype(np.uint64)).astype(np.uint32)
    got = np.asarray(u16_matmul_mxu(jnp.asarray(a_np), jnp.asarray(b_np)))
    assert np.array_equal(got, want), "MXU digit-sliced matmul is NOT exact"
    print(f"exactness: OK (512x{K}x512 u16 matmul == numpy, mod 2^32)")

    # -- throughput -----------------------------------------------------
    M = 1 << 15
    N = 512
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(M, K), dtype=np.uint16))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(K, N), dtype=np.uint16))
    y = u16_matmul_mxu(a, b)
    t0 = _sync(y)
    reps = 32
    for _ in range(reps):
        # Feed the output back as the next b operand, cast to uint16 so the
        # loop reuses the compilation warmed above (a uint32 operand would
        # retrace + recompile inside the timed region and benchmark an
        # unvalidated uint32-digit variant).
        y = u16_matmul_mxu(a, y[:K, :N].astype(jnp.uint16))
    t1 = _sync(y)
    dt = (t1 - t0) / reps
    limb_macs = M * N * K / dt
    digit_flops = 4 * 2 * M * N * K / dt  # 4 digit matmuls, 2 flops/MAC
    print(f"u16 matmul {M}x{K}x{N}: {dt * 1e3:.2f} ms/op")
    print(f"  limb-MACs/s: {limb_macs:.3e}")
    print(f"  MXU bf16 FLOPs/s sustained: {digit_flops:.3e}")

    # A radix-B matmul-NTT stage costs n*B field-MACs over log2(n)/log2(B)
    # stages = n*B*log2(n)/log2(B) total, vs (n/2)*log2(n) radix-2
    # butterflies: 2B/log2(B) field-MACs per butterfly-equivalent. Each
    # field-MAC is 64 limb-MACs for the product, ~2x with Montgomery
    # reduction folded in as extra matmul columns.
    field_macs = limb_macs / (64 * 2)
    for radix in (16, 128):
        inflation = 2 * radix / np.log2(radix)
        print(
            f"  radix-{radix} matmul-NTT ceiling at this rate: "
            f"{field_macs / inflation:.3e} butterflies/s "
            f"({inflation:.1f} field-MACs per radix-2 butterfly)"
        )


if __name__ == "__main__":
    main()
