"""Sharded Merkle commitment: data-parallel leaf + subtree hashing.

Each device hashes its contiguous block of leaves and reduces it to a
subtree root entirely locally (leaf hashing and level reduction are
embarrassingly parallel — SURVEY.md section 2 inventory); only the S
subtree roots cross devices, and the top log2(S) levels finish on host
(hashlib — a handful of hashes). Roots and authentication paths are
bit-identical to the single-device iop/merkle.py tree for every mesh
shape, because contiguous-block sharding makes per-shard levels exact
slices of the global levels.

On TPU the per-device body runs the SAME Pallas Blake2b pipeline as the
single-device fused commit (iop/merkle.py _commit_levels_traced): leaf
word planes -> plane-major kernel levels while the level size divides the
(rows, 128) tiling, then a row-major jnp tail (VERDICT r3 item 1 — no
jnp stand-ins on the mesh hot path). Plane levels are STORED plane-major
globally ((16, n_level), contiguous device blocks along lanes) and
MerkleTree gathers columns for opens, exactly like the fused path.
STARK_ANATOMY_MESH_KERNELS=interpret pins kernel-in-mesh bit-exactness
on the CPU mesh (tests/test_mesh.py).
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stark_anatomy_tpu.iop.merkle import (
    MerkleTree,
    _leaf_word_planes,
    hash_felt_leaves,
)
from stark_anatomy_tpu.ops.blake2b import merkle_node_hash
from stark_anatomy_tpu.parallel.mesh import SHARD_AXIS
from stark_anatomy_tpu.parallel.ntt_sharded import kernel_mode, smap


def _plane_flags(m: int, msg_len: int, use_kernels: bool, levels: int) -> Tuple[bool, ...]:
    """Which of the levels 0..levels (leaf first) are plane-major kernel
    levels. Level 0 needs m % 1024 == 0 messages and a single-block leaf
    encoding; each reduction needs the INPUT level size % 2048 == 0 (so the
    half-size message batch still fills whole (8, 128) tiles)."""
    flags: List[bool] = []
    if use_kernels and msg_len <= 128 and m % 1024 == 0:
        flags.append(True)
        sz = m
        while len(flags) <= levels and sz % 2048 == 0:
            sz //= 2
            flags.append(True)
    while len(flags) <= levels:
        flags.append(False)
    return tuple(flags)


def _local_levels(*columns, flags: Tuple[bool, ...], msg_len: int, interp: bool):
    """Device body: leaf digests + all subtree reduction levels.

    Output l is plane-major (16, sz) when flags[l], else row-major
    (sz, 16); digests are identical either way (layout is a pure
    bit-reinterpretation, pinned vs hashlib in tests/test_blake2b.py).
    """
    out = []
    if flags[0]:
        from stark_anatomy_tpu.iop.merkle import _bitrev_lanes
        from stark_anatomy_tpu.ops import blake2b_pallas as bp
        from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

        dig = bp.blake2b_planes(_leaf_word_planes(columns), msg_len, interpret=interp)
        # Same bit-reversed lane order as the fused single-device commit
        # (iop/merkle.py): each reduction becomes a free half/half lane
        # split instead of a per-level strided shuffle pass. The host
        # materialization in commit_sharded un-reverses each shard block,
        # so the stored MerkleTree levels stay natural-order.
        dig = _bitrev_lanes(dig)
        out.append(dig)
        cur = None
        for f in flags[1:]:
            if f:
                half = int(dig.shape[1]) // 2
                msg = jnp.concatenate([dig[:, :half], dig[:, half:]], axis=0)
                dig = bp.blake2b_planes(msg, 128, interpret=interp)
                out.append(dig)
            else:
                if cur is None:
                    # restore natural order (rev is an involution), then
                    # transpose for the row-major jnp tail
                    perm = jnp.asarray(
                        bit_reverse_indices(int(dig.shape[1])).astype(np.int32)
                    )
                    cur = jnp.transpose(jnp.take(dig, perm, axis=1))
                pairs = cur.reshape(-1, 2, 16)
                cur = merkle_node_hash(pairs[:, 0, :], pairs[:, 1, :])
                out.append(cur)
        return tuple(out)
    cur = hash_felt_leaves(columns)
    out = [cur]
    for _ in flags[1:]:
        pairs = cur.reshape(-1, 2, 16)
        cur = merkle_node_hash(pairs[:, 0, :], pairs[:, 1, :])
        out.append(cur)
    return tuple(out)


def commit_sharded(columns: Sequence, mesh, pair: bool = False) -> MerkleTree:
    """Commit to rows of field-element columns over a mesh.

    columns: sequence of (8, n) standard-form limb codewords sharded (or
    shardable) over `mesh`. Returns a MerkleTree whose root/levels/open()
    match iop/merkle.py MerkleTree.commit(hash_felt_leaves(columns))
    exactly. pair=True commits pair leaves (iop/merkle.py pair_columns):
    the halves are re-sharded over the full mesh (one resharding pass —
    row j and its partner j + n/2 start on different shards) and the
    local pipeline runs unchanged on the doubled column list.
    """
    if pair:
        from stark_anatomy_tpu.iop.merkle import pair_columns

        columns = pair_columns(columns)
    n = int(columns[0].shape[-1])
    s = mesh.shape[SHARD_AXIS]
    per_shard = n // s
    if s == 1 or n % s or per_shard & (per_shard - 1) or per_shard == 0:
        # Tiny or non-divisible domains (FRI tail rounds): single-device
        # commit — identical tree, no sharding to exploit.
        return MerkleTree.commit(hash_felt_leaves(columns))
    levels_per_shard = per_shard.bit_length() - 1

    use_k, interp = kernel_mode()
    msg_len = 16 * len(columns)
    flags = _plane_flags(per_shard, msg_len, use_k, levels_per_shard)

    sharding = NamedSharding(mesh, P(None, SHARD_AXIS))
    cols = [jax.device_put(c, sharding) for c in columns]
    body = smap(
        partial(_local_levels, flags=flags, msg_len=msg_len, interp=interp),
        mesh=mesh,
        in_specs=tuple(P(None, SHARD_AXIS) for _ in cols),
        out_specs=tuple(
            P(None, SHARD_AXIS) if f else P(SHARD_AXIS, None) for f in flags
        ),
    )
    device_levels = jax.jit(lambda *cs: body(*cs))(*cols)

    from stark_anatomy_tpu.parallel.mesh import host_gather

    # host_gather: on a multi-process runtime each level's shards live
    # across processes; a plain np.asarray would raise (tests/test_multiprocess.py).
    levels: List[np.ndarray] = [host_gather(lv) for lv in device_levels]
    plane_set = frozenset(i for i, f in enumerate(flags) if f)
    # The kernel body emits plane levels with each shard's lanes in
    # bit-reversed order (free half/half reductions on device); restore
    # natural order here — one host fancy-index per level — so the tree's
    # open/prefetch paths need no storage mapping.
    from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

    for idx in plane_set:
        arr = levels[idx]
        m_l = arr.shape[1] // s
        perm = bit_reverse_indices(m_l)
        levels[idx] = np.ascontiguousarray(
            arr.reshape(16, s, m_l)[:, :, perm].reshape(16, -1)
        )
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
    return MerkleTree(levels, plane_levels=plane_set)
