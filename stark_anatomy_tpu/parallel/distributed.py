"""Multi-controller (multi-host) initialization for pod-scale proving.

The reference has no distributed code of any kind (SURVEY.md section 0);
this subsystem is north-star-driven (SURVEY.md section 5.8): on a TPU pod
slice every host runs the SAME program, `jax.distributed.initialize`
wires the hosts into one XLA runtime, and `jax.devices()` then returns
the global device list so `parallel.mesh.make_mesh()` spans the slice.
The sharded prover (`Stark(..., mesh=...)`) then runs its device phases
unchanged — `shard_map` collectives (the four-step NTT's all-to-alls, the
sharded Merkle reduction) ride ICI across hosts exactly as they do across
the chips of one host — and its host-side phases (the FRI host tail, the
query-phase gathers, Merkle host tops) all-gather sharded values to a
fully-addressable replicated form first (parallel/mesh.py:host_gather) so
no process ever np.asarray's an array it only partially holds. The
multi-process path is executed for real by tests/test_multiprocess.py:
two separate OS processes joined by a localhost coordinator (4 virtual
CPU devices each) run the full `Stark.prove(mesh=...)` over the 8-device
global mesh and produce proof bytes identical to the single-process
prover. Real TPU pods differ only in transport (ICI/DCN instead of
localhost gRPC), which JAX owns below this layer.

Deployment recipe (one process per host):

    from stark_anatomy_tpu.parallel import distributed, make_mesh
    distributed.init()             # no-op off-pod / single-process
    mesh = make_mesh()             # all global devices
    stark = Stark(air, mesh=mesh)
    proof = stark.prove(trace, boundary, randomizer_seed=seed)

Every process computes identical proof bytes (the transcript math is
deterministic and every host holds the replicated proof-stream inputs);
process 0 is conventionally the one that persists/serves the proof.

On Cloud TPU the coordinator address / process count / process id are
auto-detected by JAX from the TPU metadata. Elsewhere (CPU/GPU fleets,
or tests) pass them explicitly or set the standard environment
variables (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID).
"""

from __future__ import annotations

import os

_INITIALIZED = False


def _runtime_already_initialized() -> bool:
    """True when jax.distributed.initialize has already run in-process."""
    try:
        from jax._src import distributed as _jdist

        return _jdist.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift
        return False


def init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    auto: bool = False,
) -> bool:
    """Initialize the multi-controller runtime (idempotent).

    Returns True when a multi-process runtime was (or already is)
    initialized, False when running single-process (the no-op path:
    nothing to coordinate, `jax.devices()` is already the full list).

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID environment variables. With NO explicit
    configuration the call is a no-op (single-process), so local
    development and tests never pay the distributed-service startup; on
    a Cloud TPU pod slice, pass auto=True to let
    `jax.distributed.initialize` discover the topology from the TPU
    metadata (every coordinate is then inferred per host).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    # A framework wrapper (or the user) may have called
    # jax.distributed.initialize already; re-initializing raises
    # RuntimeError. Detect the live client instead of relying only on our
    # own flag (ADVICE r3).
    if _runtime_already_initialized():
        _INITIALIZED = True
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env_np = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env_np) if env_np else None
    if process_id is None:
        env_pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env_pid) if env_pid else None

    if coordinator_address is None and not auto:
        if num_processes in (None, 1):
            return False  # single-process: nothing to initialize
        raise ValueError(
            "multi-process run requested but no coordinator_address given "
            "(set JAX_COORDINATOR_ADDRESS or pass it explicitly, or use "
            "auto=True on a Cloud TPU pod slice)"
        )

    import jax

    try:
        if auto and coordinator_address is None:
            jax.distributed.initialize()  # full TPU-metadata auto-detection
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except RuntimeError as exc:  # belt-and-braces vs _runtime_already_initialized
        if "already" not in str(exc).lower():
            raise
    _INITIALIZED = True
    return True


def process_index() -> int:
    """This controller's rank (0 on single-process runs)."""
    import jax

    return jax.process_index()


def is_controller() -> bool:
    """True on the process that should persist/serve the proof bytes."""
    return process_index() == 0
