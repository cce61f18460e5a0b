"""Device mesh construction for multi-chip scale-out.

The reference is single-threaded CPU Rust with zero parallelism
(SURVEY.md section 2, "parallelism-strategy inventory"); this subsystem is
driven by the north star: shard the NTT/LDE/hash pipeline over a
``jax.sharding.Mesh`` with XLA collectives riding ICI (SURVEY.md
section 5.8). One mesh axis ("shards") suffices for this workload — every
distributed op here is data-parallel over domain points except the NTT's
butterfly exchange, which is an all-to-all along that axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

SHARD_AXIS = "shards"


def make_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over the first `num_devices` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} present"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def codeword_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of an (8, n) limb codeword: contiguous blocks of the domain."""
    return NamedSharding(mesh, PartitionSpec(None, SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def host_gather(arr) -> np.ndarray:
    """Device array -> host numpy, safe under a multi-process runtime.

    On a multi-controller runtime (jax.distributed, one process per host)
    a mesh-sharded array's shards live in OTHER processes; np.asarray on
    it raises "spans non-addressable devices". Replicating through a
    jitted identity first (XLA lowers the resharding to an all-gather
    along the shard axis) makes the value fully addressable everywhere.
    Single-process arrays (host numpy, local device, fully-addressable
    sharded) pass straight through to np.asarray.
    """
    if isinstance(arr, np.ndarray):
        return arr
    if (
        jax.process_count() > 1
        and getattr(arr, "is_fully_addressable", True) is False
    ):
        sharding = getattr(arr, "sharding", None)
        mesh = getattr(sharding, "mesh", None)
        if mesh is not None and not isinstance(mesh, jax.sharding.AbstractMesh):
            arr = jax.jit(
                lambda x: x,
                out_shardings=NamedSharding(mesh, PartitionSpec()),
            )(arr)
        else:  # pragma: no cover - non-NamedSharding global array
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)
