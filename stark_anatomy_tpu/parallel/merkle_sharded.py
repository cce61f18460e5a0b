"""Sharded Merkle commitment: data-parallel leaf + subtree hashing.

Each device hashes its contiguous block of leaves and reduces it to a
subtree root entirely locally (leaf hashing and level reduction are
embarrassingly parallel — SURVEY.md section 2 inventory); only the S
subtree roots cross devices, and the top log2(S) levels finish on host
(hashlib — a handful of hashes). Roots and authentication paths are
bit-identical to the single-device iop/merkle.py tree for every mesh
shape, because contiguous-block sharding makes per-shard levels exact
slices of the global levels.
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import List, Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stark_anatomy_tpu.iop.merkle import MerkleTree, hash_felt_leaves
from stark_anatomy_tpu.ops.blake2b import merkle_node_hash
from stark_anatomy_tpu.parallel.mesh import SHARD_AXIS

from stark_anatomy_tpu.parallel.ntt_sharded import _shard_map


def _local_levels(*columns, levels_per_shard: int):
    """Device body: leaf digests + all subtree reduction levels."""
    leaves = hash_felt_leaves(columns)
    out = [leaves]
    cur = leaves
    for _ in range(levels_per_shard):
        pairs = cur.reshape(-1, 2, 16)
        cur = merkle_node_hash(pairs[:, 0, :], pairs[:, 1, :])
        out.append(cur)
    return tuple(out)


def commit_sharded(columns: Sequence, mesh) -> MerkleTree:
    """Commit to rows of field-element columns over a mesh.

    columns: sequence of (8, n) standard-form limb codewords sharded (or
    shardable) over `mesh`. Returns a MerkleTree whose root/levels/open()
    match iop/merkle.py MerkleTree.commit(hash_felt_leaves(columns))
    exactly.
    """
    n = int(columns[0].shape[-1])
    s = mesh.shape[SHARD_AXIS]
    per_shard = n // s
    if s == 1 or n % s or per_shard & (per_shard - 1) or per_shard == 0:
        # Tiny or non-divisible domains (FRI tail rounds): single-device
        # commit — identical tree, no sharding to exploit.
        return MerkleTree.commit(hash_felt_leaves(columns))
    levels_per_shard = per_shard.bit_length() - 1

    sharding = NamedSharding(mesh, P(None, SHARD_AXIS))
    cols = [jax.device_put(c, sharding) for c in columns]
    body = _shard_map(
        partial(_local_levels, levels_per_shard=levels_per_shard),
        mesh=mesh,
        in_specs=tuple(P(None, SHARD_AXIS) for _ in cols),
        out_specs=tuple(P(SHARD_AXIS, None) for _ in range(levels_per_shard + 1)),
    )
    device_levels = jax.jit(lambda *cs: body(*cs))(*cols)

    levels: List[np.ndarray] = [np.asarray(lv) for lv in device_levels]
    # Host top: reduce the S subtree roots.
    cur = levels[-1].astype("<u4")
    while cur.shape[0] > 1:
        nxt = np.empty((cur.shape[0] // 2, 16), dtype="<u4")
        for i in range(nxt.shape[0]):
            d = hashlib.blake2b(
                cur[2 * i].tobytes() + cur[2 * i + 1].tobytes(), digest_size=64
            ).digest()
            nxt[i] = np.frombuffer(d, dtype="<u4")
        levels.append(nxt)
        cur = nxt
    return MerkleTree(levels)
