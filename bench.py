#!/usr/bin/env python
"""Headline benchmark: NTT butterflies/sec on one chip (BASELINE.md).

Runs the full radix-2 NTT over F_p (p = 1 + 407*2^119) on a 2^24-point
codeword — the metric BASELINE.json names — using the layout-aware Pallas
kernels (ops/ntt_pallas.py) on TPU, falling back to the jnp path
elsewhere. The reference publishes no numbers (SURVEY.md section 6);
`_ESTABLISHED` records our first measurement on the target chip and
vs_baseline reports the current run against it (1.0 until established).

Timing methodology: the transforms are CHAINED (y = ntt(y)) and synced by
fetching a word of the final result — block_until_ready alone returns
early over the axon TPU relay and under-reports wildly.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "vs_prev_round": N}

Environment knobs: BENCH_NTT_LOG2 (default 24), BENCH_REPS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
)

#: First measured value on the target chip (TPU v5e via axon), recorded by
#: the round-1 run (2026-08-17, Pallas NTT path); later rounds report
#: speedups against it. The pre-kernel jnp path measured 5.35e7.
_ESTABLISHED: float | None = 6.137e8

#: Previous round's measured value (BENCH_r04.json) — the JSON line carries
#: BOTH deltas so the driver artifact is self-interpreting (VERDICT r4
#: item 9): vs_baseline = progress since the kernel path was first
#: established, vs_prev_round = round-over-round delta. The kernel has been
#: at the measured VPU roof since round 3 (~95-97%, BASELINE.md), so
#: vs_prev_round ~ 1.0 is the expected steady state.
_PREV_ROUND: float | None = 2.1316e9


def main() -> None:
    import numpy as np
    import jax.numpy as jnp

    from stark_anatomy_tpu.ops import ntt_pallas as ntp
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    log2n = int(os.environ.get("BENCH_NTT_LOG2", "24"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    n = 1 << log2n

    rng = np.random.default_rng(0)
    x = jnp.asarray(random_felt_limbs(rng, (n,)))
    fn = ntp.ntt

    y = fn(x)
    _ = int(np.asarray(y[0, :1])[0])  # compile + real sync

    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(y)
    _ = int(np.asarray(y[0, :1])[0])
    dt = (time.perf_counter() - t0) / reps

    butterflies = (n // 2) * log2n
    value = butterflies / dt
    vs = value / _ESTABLISHED if _ESTABLISHED else 1.0
    vs_prev = value / _PREV_ROUND if _PREV_ROUND else 1.0
    print(
        json.dumps(
            {
                "metric": f"ntt_butterflies_per_sec_per_chip_2e{log2n}",
                "value": value,
                "unit": "butterflies/s",
                "vs_baseline": round(vs, 4),
                "vs_prev_round": round(vs_prev, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
