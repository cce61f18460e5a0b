"""REAL multi-process execution of the sharded prover (SURVEY.md §5.8).

Launches N=2 separate Python processes joined into one JAX runtime by a
localhost coordinator (`distributed.init`), each holding 4 virtual CPU
devices of an 8-device global mesh, and runs the FULL
`Stark.prove(mesh=...)` in both. This executes the branches no
single-process test can reach: cross-process `shard_map` collectives,
`Fri._gather_host`'s replicating all-gather on arrays whose shards live
in the other process (iop/fri.py), and the host-side query-phase gathers
on multi-process trees. Pass criteria: both processes produce the SAME
proof bytes, equal to the single-process single-device prover's, and
the proof verifies.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_prove_bit_identical(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    outs = [tmp_path / f"proof_{i}.bin" for i in range(2)]
    env = dict(os.environ)
    # The workers set their own XLA_FLAGS/backends; scrub the pytest
    # session's 8-device flag so each worker's 4-device split is real.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), "4", str(outs[i])],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-8000:]
    proofs = [o.read_bytes() for o in outs]
    assert proofs[0] == proofs[1], "controller proofs differ across processes"

    # Same bytes as the single-process prover (the in-session virtual
    # mesh path is already pinned against single-device by test_mesh.py,
    # so compare against the plain single-device prover directly).
    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    trace = rp.trace(4242)
    boundary = air.boundary_constraints(rp.hash(4242))
    single = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    want = single.prove(trace, boundary, randomizer_seed=b"mesh")
    assert proofs[0] == want, "multi-process proof differs from single-process"
    assert single.verify(proofs[0], boundary)
