#!/usr/bin/env python
"""Headline benchmark: NTT butterflies/sec on one chip (BASELINE.md).

Runs the full radix-2 NTT over F_p (p = 1 + 407*2^119) on a 2^24-point
codeword — the metric BASELINE.json names. The reference publishes no
numbers (SURVEY.md section 6); `_ESTABLISHED` below records our own first
measurement on the target chip, and vs_baseline reports the current run
against it (1.0 until established).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Environment knobs: BENCH_NTT_LOG2 (default 24), BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

# First measured value on the target chip (TPU v5e via axon), recorded by
# the round-1 run; later rounds report speedups against it.
_ESTABLISHED: float | None = None


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stark_anatomy_tpu.ops import ntt as nttmod
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    log2n = int(os.environ.get("BENCH_NTT_LOG2", "24"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n

    rng = np.random.default_rng(0)
    x = jnp.asarray(random_felt_limbs(rng, (n,)))  # Montgomery form is moot: uniform bits
    fn = jax.jit(nttmod.ntt)
    fn(x).block_until_ready()  # compile + warm

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)

    butterflies = (n // 2) * log2n
    value = butterflies / best
    vs = value / _ESTABLISHED if _ESTABLISHED else 1.0
    print(
        json.dumps(
            {
                "metric": f"ntt_butterflies_per_sec_per_chip_2e{log2n}",
                "value": value,
                "unit": "butterflies/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
