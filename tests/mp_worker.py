"""Multi-process prover worker (launched by tests/test_multiprocess.py).

Runs ONE controller of an N-process JAX runtime on the CPU backend (M
virtual devices per process), executes the SAME `Stark.prove(mesh=...)`
as every other process over the global mesh, and writes the proof bytes
to the given output path. The test asserts every process produced
byte-identical proofs equal to the single-process prover's.

Usage: python mp_worker.py <coordinator> <num_processes> <process_id>
       <devices_per_process> <out_path>
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    coordinator, num_str, pid_str, dev_str, out_path = sys.argv[1:6]
    # XLA_FLAGS is read at first backend initialization (which has not
    # happened yet — the sitecustomize only imports jax), so setting it
    # here is early enough; JAX_PLATFORMS in the env is latched by the
    # sitecustomize import, so the platform is forced via jax.config.
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_str}"
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from stark_anatomy_tpu.parallel import distributed

    assert distributed.init(coordinator, int(num_str), int(pid_str))
    assert jax.process_count() == int(num_str), jax.process_count()
    assert len(jax.devices()) == int(num_str) * int(dev_str)

    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir
    from stark_anatomy_tpu.parallel.mesh import make_mesh

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    trace = rp.trace(4242)
    boundary = air.boundary_constraints(rp.hash(4242))
    mesh = make_mesh()  # all global devices
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2, mesh=mesh)
    proof = stark.prove(trace, boundary, randomizer_seed=b"mesh")
    assert stark.verify(proof, boundary)

    with open(out_path, "wb") as fh:
        fh.write(proof)
    print(f"worker {pid_str}: proof {len(proof)} bytes", flush=True)


if __name__ == "__main__":
    main()
