#!/usr/bin/env python
"""Phase-timing harness for the prover (development tool).

Proves a Rescue-Prime chain twice in one process (cold + warm) and prints
the per-phase telemetry for the warm run, plus a dispatch count when
STARK_ANATOMY_COUNT_DISPATCH=1.

    python tools/time_prove.py --chain 8189     # 2^18-row trace, F=2^22
    python tools/time_prove.py --chain 32765    # 2^20-row trace, F=2^24

Sizing rule: T = 32*chain + 1 (RescuePrime.rows_per_perm = 32) and the
omicron domain is next_pow2(T + num_randomizers) where num_randomizers
defaults to 4*queries, so pick the largest chain with
32*chain + 1 + 4*queries <= 2^k — e.g. 8189/32765 at 16 queries, but
32763 for production-80's 32 queries (one domain doubling OOMs a 16 GB
chip at F = 2^25). A chain that leaves a large padding gap
(e.g. the old 27-rows/perm fixture 9705 -> 213k padding rows at O = 2^19)
makes the transition-zerofier excluded-row product scan over every
padding row — a single multi-minute dispatch that the TPU worker watchdog
kills. Trace-domain utilisation is printed below; keep it near 100%.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8189)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument(
        "--profile", type=str, default=None,
        help="named soundness profile (iop/stark.py PROFILES); default is "
        "the historical 16-query blowup-4 config the round tables track",
    )
    args = ap.parse_args()

    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir
    from stark_anatomy_tpu.utils import telemetry

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=args.chain)
    if args.profile is not None:
        stark = Stark.from_profile(args.profile, air)
    else:
        stark = Stark(air, expansion_factor=4, num_colinearity_checks=16)
    print(
        f"security: {stark.security_level()} bits conjectured / "
        f"{stark.security_level(conjectured=False)} proven "
        f"({stark.num_colinearity_checks} queries @ blowup "
        f"{stark.expansion_factor} + {stark.grinding_bits} pow bits)"
    )
    util = stark.trace_length / stark.omicron_domain_length
    print(
        f"T={stark.trace_length} w={stark.num_registers} "
        f"O=2^{stark.omicron_domain_length.bit_length()-1} "
        f"F=2^{stark.fri_domain_length.bit_length()-1} "
        f"terms={air.num_constraints + stark.num_registers} "
        f"domain-util={util:.1%}"
    )
    if util < 0.9:
        print(
            f"WARNING: {stark.omicron_domain_length - stark.trace_length} padding "
            "rows -> the transition-zerofier scan multiplies one (8, F) term per "
            "padding row; pick the largest chain with 32*chain + 65 <= 2^k "
            "(e.g. 8189, 32765 — see module docstring)"
        )
    t0 = time.time()
    trace = rp.trace_bytes(1234567890, chain_length=args.chain)
    # The public output IS the trace's last row — rerunning the chain
    # via chain_output would double the sequential generation cost.
    output = int.from_bytes(trace[-1, 0].tobytes(), "little")
    boundary = air.boundary_constraints(output)
    gen_s = time.time() - t0
    print(f"trace gen {gen_s:.2f}s ({trace.shape[0]/gen_s:,.0f} rows/s)")

    proof = None
    dt = 0.0
    for rep in range(args.reps):
        telemetry.reset()
        t0 = time.time()
        proof = stark.prove(trace, boundary, randomizer_seed=b"timing")
        dt = time.time() - t0
        print(f"rep {rep}: proved in {dt:.2f}s ({len(proof)} bytes)")
    print(f"input-to-proof (trace gen + warm prove): {gen_s + dt:.2f}s")
    for name, stats in sorted(telemetry.report().items()):
        print(f"  {name}: {stats['seconds']:.2f}s x{stats['calls']}")
    if args.verify:
        t0 = time.time()
        ok = stark.verify(proof, boundary)
        print(f"verify {time.time()-t0:.2f}s: {ok}")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
