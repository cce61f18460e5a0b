#!/usr/bin/env python
"""Prove and verify a Rescue-Prime hash chain from the command line.

    python examples/prove_rescue.py --input 42 --chain 4 --out proof.bin

Proves knowledge of `input` such that iterating the Rescue-Prime
permutation `chain` times yields the printed output, then verifies the
proof (the verifier sees only the boundary: capacity-zero start + the
output). Runs on TPU when present, CPU otherwise — identical proof bytes.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", type=int, default=1234567890)
    ap.add_argument("--chain", type=int, default=1, help="permutation chain length")
    ap.add_argument(
        "--profile", type=str, default=None,
        help="named soundness profile (test | default | production-80 | "
        "production-128; iop/stark.py PROFILES). Overrides --checks.",
    )
    ap.add_argument("--checks", type=int, default=16, help="FRI colinearity checks")
    ap.add_argument("--out", type=str, default=None, help="write proof bytes here")
    ap.add_argument("--checkpoint-dir", type=str, default=None)
    ap.add_argument(
        "--seed", type=str, default=None,
        help="deterministic randomizer seed (utf-8). Default: fresh entropy "
        "per run (zero-knowledge). Required for checkpoint resume across "
        "process restarts.",
    )
    args = ap.parse_args()
    if args.checkpoint_dir and args.seed is None:
        ap.error("--checkpoint-dir needs --seed (resume must re-derive the "
                 "same randomizers after a restart)")

    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir
    from stark_anatomy_tpu.utils import telemetry

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=args.chain)
    if args.profile is not None:
        stark = Stark.from_profile(args.profile, air)
    else:
        stark = Stark(air, expansion_factor=4, num_colinearity_checks=args.checks)
    print(
        f"trace {stark.trace_length} rows x {stark.num_registers} registers; "
        f"LDE domain 2^{stark.fri_domain_length.bit_length() - 1}; "
        f"security {stark.security_level()} bits conjectured "
        f"/ {stark.security_level(conjectured=False)} proven "
        f"({stark.num_colinearity_checks} queries @ blowup "
        f"{stark.expansion_factor} + {stark.grinding_bits} pow bits)"
    )

    t0 = time.time()
    trace = rp.trace_bytes(args.input, chain_length=args.chain)
    # The public output is the trace's last row — re-running the chain
    # (rp.chain_output) would double the sequential generation cost.
    output = int.from_bytes(trace[-1, 0].tobytes(), "little")
    boundary = air.boundary_constraints(output)
    print(f"trace generated in {time.time() - t0:.2f}s; output = {output}")

    t0 = time.time()
    proof = stark.prove(
        trace, boundary,
        randomizer_seed=args.seed.encode() if args.seed is not None else None,
        checkpoint_dir=args.checkpoint_dir,
    )
    print(f"proved in {time.time() - t0:.2f}s; proof = {len(proof)} bytes")
    for name, stats in sorted(telemetry.report().items()):
        print(f"  {name}: {stats['seconds']:.2f}s")

    if args.out:
        with open(args.out, "wb") as fh:
            fh.write(proof)
        print(f"wrote {args.out}")

    t0 = time.time()
    ok = stark.verify(proof, boundary)
    print(f"verified in {time.time() - t0:.2f}s: {'ACCEPT' if ok else 'REJECT'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
