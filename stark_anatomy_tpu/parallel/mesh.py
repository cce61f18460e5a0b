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
