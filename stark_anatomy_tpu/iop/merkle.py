"""Merkle tree with device-batched Blake2b-512 hashing.

Behavioral contract from /root/reference/src/iop/types/merkle.rs:
- binary tree over pre-hashed 64-byte leaves, power-of-two leaf count
  (commit assert, merkle.rs:36);
- internal node = Blake2b-512(left || right) (merkle.rs:47-55);
- `open(index)` returns the authentication path ordered leaf-level -> root
  (merkle.rs:70-108);
- `verify` folds the leaf up by index parity — even: H(leaf||sib), odd:
  H(sib||leaf), index >>= 1 per level — and compares to the root
  (merkle.rs:110-154), asserting a non-empty path and index < 2^len
  (merkle.rs:122-126).

Design departures (same roots, same paths, same verify behavior):
- commit hashes each level as ONE batched device call
  (ops/blake2b.py:merkle_node_hash) instead of a sequential host loop;
- all levels are stored (O(N) memory), so `open` is O(log N) lookups
  instead of the reference's O(N log N) recursive re-commit
  (merkle.rs:85-101) — the returned path is element-for-element identical
  because the recommitted subtree root IS the stored internal node;
- `verify` is host-side hashlib (an intentionally independent
  implementation, cross-checked against the device hasher in tests).
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops.blake2b import blake2b_u32, merkle_node_hash
from stark_anatomy_tpu.ops.limbs import NUM_LIMBS

__all__ = [
    "MerkleTree",
    "hash_felt_leaves",
    "multiproof_plan",
    "verify_multiproof",
    "verify_path",
]

_DEVICE_MIN_BATCH = 8  # below this, host hashlib beats a device dispatch


def _is_pow2(n: int) -> bool:
    return n >= 1 and (n & (n - 1)) == 0


def limbs_to_leaf_words(columns: Sequence) -> jnp.ndarray:
    """Stack of limb arrays -> per-row little-endian message words.

    columns: sequence of (8, n) uint32 limb arrays (canonical standard form
    — Montgomery values must be converted first; canonical bytes are part of
    the proof format, utils/encoding.py). Returns (n, 4*len(columns)) uint32:
    row i's message is the concatenation of the 16-byte little-endian
    encodings of each column's element i.
    """
    words = []
    for col in columns:
        if col.shape[0] != NUM_LIMBS:
            raise ValueError("expected (8, n) limb arrays")
        c = col.astype(jnp.uint32)
        for j in range(4):  # 16-bit limbs (2j, 2j+1) -> little-endian u32 word j
            words.append(c[2 * j] | (c[2 * j + 1] << jnp.uint32(16)))
    return jnp.stack(words, axis=1)


_HASH_CHUNK = 1 << 19  # leaves per chunk: bounds Blake2b word-plane transients


def _hash_leaves_traced(columns: Sequence, msg_len: int) -> jnp.ndarray:
    """hash_felt_leaves body, safe to call inside a jit trace.

    Large batches hash through ``lax.map`` over fixed-size chunks — one
    sequential XLA loop instead of eager per-chunk dispatches + syncs, with
    the same bounded transient footprint (chunk boundaries cannot change
    per-leaf digests). Identical bytes to the eager path.
    """
    n = int(columns[0].shape[-1])
    if n <= _HASH_CHUNK:
        msg = limbs_to_leaf_words(columns)
        return blake2b_u32(msg, msg_len=msg_len)
    k = n // _HASH_CHUNK
    stacked = jnp.stack([jnp.asarray(c) for c in columns])  # (w, 8, n)
    chunks = stacked.reshape(len(columns), NUM_LIMBS, k, _HASH_CHUNK).transpose(
        2, 0, 1, 3
    )  # (k, w, 8, chunk)

    def _one(ch):
        return blake2b_u32(limbs_to_leaf_words(list(ch)), msg_len=msg_len)

    return jax.lax.map(_one, chunks).reshape(n, 16)


def _leaf_word_planes(columns: Sequence) -> jnp.ndarray:
    """Limb columns -> (4*len(columns), n) message word PLANES.

    Same words as limbs_to_leaf_words but plane-major — the layout the
    Pallas hasher consumes, and the natural orientation of limb columns
    (no batch-axis transpose of the whole message)."""
    planes = []
    for col in columns:
        if col.shape[0] != NUM_LIMBS:
            raise ValueError("expected (8, n) limb arrays")
        c = col.astype(jnp.uint32)
        for j in range(4):
            planes.append(c[2 * j] | (c[2 * j + 1] << jnp.uint32(16)))
    return jnp.stack(planes)


def _bitrev_lanes(x: jax.Array) -> jax.Array:
    """Bit-reversal permutation of the lane (minor) axis of (P, n) planes.

    Same rowperm -> transpose -> rowperm factorization as the NTT's
    ops/ntt_pallas.py _bit_reverse_fast (a flat lane gather of n elements
    moves one element per descriptor and would dominate the commit):
    i = hi*B + lo gives rev(i) = rev_b(lo)*A + rev_a(hi), two contiguous
    major-axis row gathers around one 2-D transpose."""
    from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

    p, n = int(x.shape[0]), int(x.shape[-1])
    bits = n.bit_length() - 1
    a_bits = bits // 2
    a, b = 1 << a_bits, 1 << (bits - a_bits)
    rev_a = jnp.asarray(bit_reverse_indices(a).astype(np.int32))
    rev_b = jnp.asarray(bit_reverse_indices(b).astype(np.int32))
    x2 = jnp.take(x.reshape(p, a, b), rev_a, axis=1)
    x2 = jnp.take(jnp.swapaxes(x2, 1, 2), rev_b, axis=1)
    return x2.reshape(p, n)


def _rev_bits(i: int, k: int) -> int:
    """Host-side k-bit reversal (the plane-level storage map)."""
    return int(format(i, f"0{k}b")[::-1], 2) if k else 0


@partial(jax.jit, static_argnames=("kinds",))
def _gather_flat_jit(arrays, idxs, kinds):
    """Many small gathers -> ONE flat uint32 vector, one dispatch.

    kinds (static) select the per-request layout: "col" = take along the
    lane axis of an (8, n) codeword, emitted row-major as (8, k); "plane"
    = take columns of a (16, m) digest plane level, emitted as (k, 16)
    rows; "row" = take rows of an (m, 16) level. The query phases issue
    hundreds of such gathers per proof — dispatching each separately
    cost ~2 ms of per-kernel overhead apiece on a remote device.
    """
    parts = []
    for arr, ix, kind in zip(arrays, idxs, kinds):
        if kind == "col":
            parts.append(jnp.take(arr, ix, axis=1).reshape(-1))
        elif kind == "plane":
            parts.append(jnp.transpose(jnp.take(arr, ix, axis=1)).reshape(-1))
        else:
            parts.append(jnp.take(arr, ix, axis=0).reshape(-1))
    return jnp.concatenate(parts)


def gather_requests(requests) -> List[np.ndarray]:
    """Execute gather requests [(device_array, lanes, kind)] as ONE
    jitted dispatch + ONE device->host transfer; returns host arrays
    shaped (8, k) for "col" and (k, 16) otherwise, in request order."""
    if not requests:
        return []
    from stark_anatomy_tpu.parallel.mesh import host_gather

    arrays = tuple(r[0] for r in requests)
    idxs = tuple(jnp.asarray(np.asarray(r[1], dtype=np.int32)) for r in requests)
    kinds = tuple(r[2] for r in requests)
    host = host_gather(_gather_flat_jit(arrays, idxs, kinds))
    out: List[np.ndarray] = []
    off = 0
    for arr, lanes, kind in requests:
        k = len(lanes)
        shp = (int(arr.shape[0]), k) if kind == "col" else (k, 16)
        sz = shp[0] * shp[1]
        out.append(host[off : off + sz].reshape(shp))
        off += sz
    return out


def pair_columns(columns: Sequence) -> List:
    """Codeword columns -> the PAIR-LEAF column list (grammar v3).

    Leaf j of a pair-leaf tree over length-n codewords packs rows j and
    j + n/2: exactly the index pair every FRI query and every STARK
    opening touches together (iop/fri.py, iop/stark.py), so committing
    them as ONE leaf halves the tree height by one level and collapses
    the two openings into one. Expressed as plain column splitting so the
    whole commit machinery (leaf rule, plane kernels, sharding) is
    unchanged: leaf j = hash_felts(row j of all columns ++ row j+n/2 of
    all columns).
    """
    n = int(columns[0].shape[-1])
    half = n // 2
    return [c[:, :half] for c in columns] + [c[:, half:] for c in columns]


def _commit_levels_traced(
    columns: Sequence, msg_len: int, store_leaves: bool = True, pair: bool = False
):
    """(all device levels as a tuple, first small level for the host tail).

    Trace-safe: leaf hashing + every device-side tree level in one traced
    computation. Level layout matches MerkleTree.commit exactly. With
    store_leaves=False the leaf-digest level is omitted from the outputs
    (XLA frees it after the first reduction) — at 2^24 leaves that level
    alone is 1 GB of HBM, and opens can recompute the handful of digests
    they need from the committed codeword columns instead.

    pair=True commits pair leaves (pair_columns) with the split INSIDE
    the trace, so XLA fuses the half-slices into the hash kernel instead
    of materializing copies; msg_len must already count both rows.

    On TPU the leaf hashing and every large level run through the Pallas
    compressor (ops/blake2b_pallas.py) in plane-major layout: ~15x the
    jnp hasher's throughput, and VMEM-resident state instead of ~100
    HBM word planes (an unchunked jnp 2^24 commit program reserved
    13.5 GB of XLA temp). Identical digests (pinned on-device by
    tests/test_tpu_smoke.py; the layouts are bit-reinterpretations).
    """
    from stark_anatomy_tpu.ops import blake2b_pallas as bp

    if pair:
        columns = pair_columns(columns)
    n = int(columns[0].shape[-1])
    plane_levels = []
    row_levels = []
    first = True
    if bp.supported(n, msg_len):
        # Plane-major all the way down: transposing a (16, m) digest array
        # to row-major costs multiple full passes on TPU (measured: the
        # transposes alone pushed the commit program to 13 GB of temp and
        # ~40x input bytes accessed). Levels are STORED plane-major AND in
        # BIT-REVERSED lane order: with children stored bit-reversed, the
        # pair of parent-storage-slot t is exactly (lane t, lane t + m/2)
        # — rev_k(2j) = rev_{k-1}(j), rev_k(2j+1) = rev_{k-1}(j) + m/2 —
        # so every reduction is a free first-half/second-half split and
        # the parent level comes out bit-reversed too. The previous
        # even/odd strided-lane slices cost a cross-lane shuffle pass per
        # level (measured ~0.9s of the 1.0s 2^24 commit; this layout
        # cuts the level loop to the hash kernels' ~50ms). MerkleTree
        # maps logical -> storage indices on open (bitrev_planes=True).
        dig = bp.blake2b_planes(_leaf_word_planes(columns), msg_len)  # (16, n)
        dig = _bitrev_lanes(dig)  # storage order
        while int(dig.shape[1]) > 2 * _DEVICE_MIN_BATCH and int(dig.shape[1]) % 2048 == 0:
            if store_leaves or not first:
                plane_levels.append(dig)
            first = False
            half = int(dig.shape[1]) // 2
            msg = jnp.concatenate([dig[:, :half], dig[:, half:]], axis=0)  # (32, m/2)
            dig = bp.blake2b_planes(msg, 128)
        # Restore natural order for the small row/top levels (the rev
        # permutation is an involution); one tiny gather.
        m0 = int(dig.shape[1])
        from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

        perm = jnp.asarray(bit_reverse_indices(m0).astype(np.int32))
        cur = jnp.transpose(jnp.take(dig, perm, axis=1))
    else:
        cur = _hash_leaves_traced(columns, msg_len)
    while int(cur.shape[0]) > 2 * _DEVICE_MIN_BATCH:
        if store_leaves or not first:
            row_levels.append(cur)
        first = False
        c = cur.reshape(-1, 2, 16)
        pairs = int(c.shape[0])
        if pairs > _HASH_CHUNK:
            # Chunk big jnp level reductions through lax.map: the jnp
            # compressor's word planes are ~100x the digest bytes and XLA
            # materializes them.
            k = pairs // _HASH_CHUNK
            cc = c.reshape(k, _HASH_CHUNK, 2, 16)
            cur = jax.lax.map(
                lambda blk: merkle_node_hash(blk[:, 0, :], blk[:, 1, :]), cc
            ).reshape(pairs, 16)
        else:
            cur = merkle_node_hash(c[:, 0, :], c[:, 1, :])
    return tuple(plane_levels), tuple(row_levels), cur


@partial(jax.jit, static_argnames=("msg_len", "store_leaves", "pair"))
def _commit_levels_jit(columns, msg_len: int, store_leaves: bool, pair: bool):
    return _commit_levels_traced(columns, msg_len, store_leaves, pair)


#: leaf counts >= this commit without storing the leaf-digest level.
_DROP_LEAVES_MIN = 1 << 22


def commit_columns_fused(
    columns: Sequence, store_leaves: bool | None = None, pair: bool = False
) -> "MerkleTree":
    """Merkle-commit standard-form codeword columns in ONE device dispatch.

    Bit-identical tree to ``MerkleTree.commit(hash_felt_leaves(columns))``
    (asserted by the golden-proof tests) but the leaf hashing and every
    device level launch as a single jitted computation — over a
    remote-device link the eager path's ~log(n) dispatches plus chunk
    syncs dominate commit latency. The small top finishes on host
    hashlib, as in MerkleTree.commit.

    pair=True commits PAIR leaves (see pair_columns; grammar v3): leaf j
    = hash of rows j and j + n/2 of every column — n/2 leaves, one level
    shorter, and the (j, j+n/2) openings every consumer makes collapse
    into one.

    Above _DROP_LEAVES_MIN leaves the leaf-digest level is not stored
    (opens recompute leaf digests from `columns`, which the prover keeps
    around anyway) — this halves tree HBM at production sizes, which is
    what lets a 2^24-domain prove run fully device-resident.
    """
    width = 2 * len(columns) if pair else len(columns)
    msg_len = 16 * width
    n = int(columns[0].shape[-1])
    n_leaves = n // 2 if pair else n
    from stark_anatomy_tpu.ops import blake2b_pallas as bp
    from stark_anatomy_tpu.ops.field_pallas import _on_tpu

    if _on_tpu() and msg_len > bp._MAX_MSG_LEN:
        import warnings

        warnings.warn(
            f"commit of {width} columns ({msg_len}-byte leaves) "
            f"exceeds the Pallas hasher's {bp._MAX_MSG_LEN}-byte message "
            "cap — falling back to the ~10x slower jnp leaf hasher. "
            "Raise ops/blake2b_pallas._MAX_MSG_LEN (with a smaller row "
            "tile) for AIRs this wide.",
            stacklevel=2,
        )
    if store_leaves is None:
        store_leaves = n_leaves < _DROP_LEAVES_MIN
    import os

    if n < int(os.environ.get("STARK_ANATOMY_FUSE_MIN", str(1 << 16))):
        # Small trees: the eager per-level path — its per-level jits are
        # SHARED across every tree with a level of that size, where the
        # one-graph-per-tree-shape fused path would compile a fresh ~50k-op
        # XLA graph for every FRI round (minutes of CPU compile in the
        # test/virtual-mesh environments for zero dispatch-latency benefit
        # at these sizes).
        leaf_cols = pair_columns(columns) if pair else columns
        tree = MerkleTree.commit(hash_felt_leaves(leaf_cols))
        tree.pair_leaves = pair
        if not store_leaves:
            cols = [jnp.asarray(c) for c in columns]
            tree.levels[0] = None
            tree.leaf_columns = cols
        return tree
    cols = [jnp.asarray(c) for c in columns]
    plane_dev, row_dev, top = _commit_levels_jit(
        tuple(cols), msg_len, store_leaves, pair
    )
    return assemble_fused_tree(plane_dev, row_dev, top, cols, store_leaves, pair)


def assemble_fused_tree(
    plane_dev, row_dev, top, cols, store_leaves: bool, pair: bool = False
) -> "MerkleTree":
    """MerkleTree from _commit_levels_traced outputs: stitch the device
    plane/row levels, finish the tiny top on host hashlib, and set the
    plane-level/dropped-leaf bookkeeping. Shared by commit_columns_fused
    and the fused FRI round (iop/fri.py), so both produce structurally
    identical trees."""
    levels: List = ([None] if not store_leaves else []) + list(plane_dev) + list(row_dev)
    offset = 0 if store_leaves else 1
    plane_set = frozenset(range(offset, offset + len(plane_dev)))
    cur = np.asarray(top, dtype="<u4")
    while cur.shape[0] > 1:
        levels.append(cur)
        nxt = np.empty((cur.shape[0] // 2, 16), dtype="<u4")
        for i in range(nxt.shape[0]):
            d = hashlib.blake2b(
                cur[2 * i].tobytes() + cur[2 * i + 1].tobytes(), digest_size=64
            ).digest()
            nxt[i] = np.frombuffer(d, dtype="<u4")
        cur = nxt
    levels.append(cur)
    return MerkleTree(
        levels,
        leaf_columns=None if store_leaves else cols,
        plane_levels=plane_set,
        bitrev_planes=True,
        pair_leaves=pair,
    )


def _host_reduce(cur: np.ndarray, sink) -> np.ndarray:
    """hashlib-reduce (m, 16) rows to the single top row, handing every
    intermediate level (including `cur`) to `sink`."""
    while cur.shape[0] > 1:
        sink(cur)
        nxt = np.empty((cur.shape[0] // 2, 16), dtype="<u4")
        for i in range(nxt.shape[0]):
            d = hashlib.blake2b(
                cur[2 * i].tobytes() + cur[2 * i + 1].tobytes(), digest_size=64
            ).digest()
            nxt[i] = np.frombuffer(d, dtype="<u4")
        cur = nxt
    return cur


class ChunkedPairCommit:
    """Streaming PAIR-leaf commit with host-resident levels.

    The big-domain prover (iop/stark.py _prove_big) commits 4 GB of
    boundary-quotient columns while most of a 16 GB chip is standing
    prover state; the one-graph fused commit's working set (message word
    planes + every digest level as outputs) cannot fit there. Feed
    aligned power-of-two chunks of PRE-SPLIT pair columns (all columns'
    lo rows then all columns' hi rows, the pair_columns order) via
    add(); each chunk is hashed and reduced to its subtree root on
    device and its levels materialize to HOST immediately. finish()
    assembles the MerkleTree (top levels on host hashlib). Digests are
    identical to commit_columns_fused(..., pair=True): chunk-local
    reductions of aligned chunks ARE the global tree's sub-blocks
    (pinned by tests/test_merkle.py).
    """

    def __init__(self, chunk_leaves: int, msg_len: int, prune_levels: int = 10):
        if chunk_leaves < 2048 or chunk_leaves & (chunk_leaves - 1):
            raise ValueError("chunk_leaves must be a power of two >= 2048")
        self.chunk_leaves = chunk_leaves
        self.msg_len = msg_len
        # Merkle cap: levels 1..prune_levels are NEVER materialized to
        # host — the bottom levels are ~all of a tree's bytes (a 2^25-leaf
        # tree's levels below 11 hold ~2 GB of digests, its levels above
        # ~130 MB), and openings rebuild the 2^prune-leaf subtree under a
        # needed node from the leaf columns in ~1 ms
        # (MerkleTree._subtree_digest). Roots/paths are unchanged.
        self.prune_levels = min(prune_levels, chunk_leaves.bit_length() - 2)
        chunk_levels = chunk_leaves.bit_length() - 1
        # Stored chunk arrays are global levels 1..chunk_levels-1 (leaf
        # digests dropped; the chunk root is the chunk_levels-level node).
        self._per_level: List[List[np.ndarray]] = [
            [] for _ in range(chunk_levels - 1)
        ]
        self._chunk_roots: List[np.ndarray] = []

    def add(self, pair_cols_chunk: Sequence) -> None:
        from stark_anatomy_tpu.ops.ntt import bit_reverse_indices
        from stark_anatomy_tpu.parallel.mesh import host_gather

        plane, rows, top = _commit_levels_jit(
            tuple(pair_cols_chunk), self.msg_len, False, False
        )
        lv = 1
        for p in plane:
            if lv > self.prune_levels:
                arr = host_gather(p).astype("<u4")
                arr = arr[:, bit_reverse_indices(arr.shape[1])].T
                self._per_level[lv - 1].append(np.ascontiguousarray(arr))
            lv += 1
        for r in rows:
            if lv > self.prune_levels:
                self._per_level[lv - 1].append(host_gather(r).astype("<u4"))
            lv += 1
        state = {"lv": lv}

        def sink(level_arr):
            if state["lv"] > self.prune_levels:
                self._per_level[state["lv"] - 1].append(level_arr)
            state["lv"] += 1

        self._chunk_roots.append(_host_reduce(host_gather(top).astype("<u4"), sink))

    def finish(self, leaf_columns: List) -> "MerkleTree":
        levels: List = [None]
        for lv, arrays in enumerate(self._per_level, start=1):
            levels.append(
                np.concatenate(arrays, axis=0) if lv > self.prune_levels else None
            )
        cur = np.concatenate(self._chunk_roots, axis=0)
        cur = _host_reduce(cur, lambda arr: levels.append(arr))
        levels.append(cur)
        return MerkleTree(levels, leaf_columns=leaf_columns, pair_leaves=True)


def commit_columns_chunked(
    columns: Sequence, chunk_leaves: int = 1 << 22
) -> "MerkleTree":
    """PAIR-leaf commit of full codeword columns via ChunkedPairCommit."""
    n = int(columns[0].shape[-1])
    half = n // 2
    n_chunks = max(1, half // max(chunk_leaves, 1))
    chunk_leaves = half // n_chunks
    if chunk_leaves < 2048:
        # Tiny trees: no chunking to exploit (and the dropped-leaf-level
        # bookkeeping assumes the device reduced at least once).
        return commit_columns_fused(columns, pair=True)
    cols = [jnp.asarray(c) for c in columns]
    builder = ChunkedPairCommit(chunk_leaves, 32 * len(columns))
    for k in range(n_chunks):
        lo = [c[:, k * chunk_leaves : (k + 1) * chunk_leaves] for c in cols]
        hi = [
            c[:, half + k * chunk_leaves : half + (k + 1) * chunk_leaves]
            for c in cols
        ]
        builder.add(lo + hi)
    return builder.finish(cols)


def hash_felt_leaves(columns: Sequence) -> jnp.ndarray:
    """Leaf digests for rows of field elements: (n, 16) uint32.

    Leaf i = Blake2b-512(le16(col0[i]) || le16(col1[i]) || ...) — the
    framework's canonical leaf encoding (utils/encoding.py:hash_felts).
    Large batches are hashed in chunks: the compressor's word planes and
    state temporaries are ~5x the message size, which at 2^24 leaves
    would exhaust HBM in one dispatch.
    """
    n = int(columns[0].shape[-1])
    if n <= _HASH_CHUNK:
        msg = limbs_to_leaf_words(columns)
        return blake2b_u32(msg, msg_len=16 * len(columns))
    out = []
    for start in range(0, n, _HASH_CHUNK):
        chunk = [c[:, start : start + _HASH_CHUNK] for c in columns]
        msg = limbs_to_leaf_words(chunk)
        out.append(blake2b_u32(msg, msg_len=16 * len(columns)))
        # Serialize chunks: async-queued chunks would stack transients.
        np.asarray(out[-1][:1, :1])
    return jnp.concatenate(out, axis=0)


class MerkleTree:
    """Committed Merkle tree; all levels stored, leaves at levels[0].

    Levels built on device STAY on device (a 2^24-leaf tree's levels are
    2GB of digests; transferring them eagerly would dominate commit time
    over a remote-device link). Host access goes through `_fetch`, which
    gathers the requested rows in one dispatch per level and caches them.
    """

    def __init__(
        self,
        levels: List,
        leaf_columns: List | None = None,
        plane_levels: frozenset = frozenset(),
        bitrev_planes: bool = False,
        pair_leaves: bool = False,
    ):
        """levels[0] may be None when leaf_columns is given: opens then
        recompute leaf digests from the codeword columns (host hashing of
        the gathered rows — byte-identical to the device hasher, pinned in
        tests/test_blake2b.py) instead of reading a stored 64-byte digest
        per leaf. The caller owns keeping `leaf_columns` alive/offloaded;
        use replace_leaf_columns after moving codewords to host.

        plane_levels: indices of levels stored PLANE-major as (16, m)
        word planes (the Pallas hash pipeline's layout — transposing to
        row-major on TPU costs full extra passes per level); digests for
        those levels are gathered as columns.

        bitrev_planes: plane levels are additionally stored in
        BIT-REVERSED lane order (the fused commit pipeline's layout —
        _commit_levels_traced — which makes every tree reduction a free
        half/half split instead of a strided lane shuffle); logical node
        i of an m-node plane level then lives at lane rev_log2(m)(i).

        pair_leaves: leaf_columns hold FULL-length codewords whose rows
        j and j + n/2 were committed as ONE leaf (pair_columns); only
        consulted when recomputing dropped leaf digests."""
        self.levels = levels
        self.leaf_columns = leaf_columns
        self.plane_levels = plane_levels
        self.bitrev_planes = bitrev_planes
        self.pair_leaves = pair_leaves
        if levels[0] is None and leaf_columns is None:
            raise ValueError("dropped leaf level requires leaf_columns")
        self._fetch_cache: dict = {}

    def _plane_lane(self, arr, i: int) -> int:
        """Logical node index -> storage lane of a plane-major level."""
        if not self.bitrev_planes:
            return i
        m = int(arr.shape[1])
        return _rev_bits(i, m.bit_length() - 1)

    def replace_leaf_columns(self, columns: List) -> None:
        """Repoint leaf recomputation at (e.g. host-offloaded) columns."""
        if self.levels[0] is None:
            self.leaf_columns = columns

    @classmethod
    def commit(cls, leaves, device: bool = True) -> "MerkleTree":
        """Build the tree from (n, 16) uint32 leaf digests (device or host).

        n must be a power of two (merkle.rs:36). Each reduction level is one
        batched device call; small tops (< _DEVICE_MIN_BATCH pairs) finish
        on host to avoid per-dispatch overhead. device=False keeps the
        whole reduction on host hashlib — used by verifiers that must not
        touch the device (e.g. the FRI last-codeword check, iop/fri.py).
        """
        n = int(leaves.shape[0])
        if not _is_pow2(n):
            raise ValueError("leaf count must be a power of two")
        levels: List = []
        current = leaves
        while device and int(current.shape[0]) > 2 * _DEVICE_MIN_BATCH:
            levels.append(current)
            c = jnp.asarray(current).reshape(-1, 2, 16)
            pairs = c.shape[0]
            if pairs <= _HASH_CHUNK:
                current = merkle_node_hash(c[:, 0, :], c[:, 1, :])
            else:
                current = jnp.concatenate(
                    [
                        merkle_node_hash(
                            c[s : s + _HASH_CHUNK, 0, :], c[s : s + _HASH_CHUNK, 1, :]
                        )
                        for s in range(0, pairs, _HASH_CHUNK)
                    ],
                    axis=0,
                )
        # Host tail: tiny levels, hashlib (host_gather: `current` may be a
        # mesh-sharded array whose shards live on other processes).
        from stark_anatomy_tpu.parallel.mesh import host_gather

        cur = host_gather(current).astype("<u4", copy=False)
        while cur.shape[0] > 1:
            levels.append(cur)
            nxt = np.empty((cur.shape[0] // 2, 16), dtype="<u4")
            for i in range(nxt.shape[0]):
                d = hashlib.blake2b(
                    cur[2 * i].tobytes() + cur[2 * i + 1].tobytes(), digest_size=64
                ).digest()
                nxt[i] = np.frombuffer(d, dtype="<u4")
            cur = nxt
        levels.append(cur)
        return cls(levels)

    @classmethod
    def commit_bytes(cls, leaves: Sequence[bytes], device: bool = True) -> "MerkleTree":
        """Commit from 64-byte leaf digests (host convenience/parity API)."""
        arr = np.stack([np.frombuffer(leaf, dtype="<u4") for leaf in leaves])
        return cls.commit(arr, device=device)

    @property
    def num_leaves(self) -> int:
        for lvl, arr in enumerate(self.levels):
            if arr is not None:
                m = int(
                    arr.shape[1] if lvl in self.plane_levels else arr.shape[0]
                )
                return m << lvl
        raise ValueError("tree has no materialized levels")

    def _leaf_digests(self, indices: List[int]) -> List[bytes]:
        """Recompute leaf digests from the codeword columns (dropped-leaf
        trees): one batched gather per column, then host hashing — the
        same canonical-encoding leaf rule as hash_felt_leaves. Pair-leaf
        trees gather both committed rows (j and j + n/2) per leaf."""
        from stark_anatomy_tpu.ops.limbs import limbs_to_int

        gather_idx = list(indices)
        if self.pair_leaves:
            h = self.num_leaves
            gather_idx = gather_idx + [i + h for i in indices]
        cols = []
        for col in self.leaf_columns:
            if isinstance(col, np.ndarray):
                cols.append(col[:, gather_idx])
            else:
                cols.append(
                    np.asarray(jnp.take(col, jnp.asarray(gather_idx), axis=1))
                )
        out = []
        k = len(indices)
        for pos in range(k):
            msg = b"".join(
                limbs_to_int(c[:, pos]).to_bytes(16, "little") for c in cols
            )
            if self.pair_leaves:
                msg += b"".join(
                    limbs_to_int(c[:, pos + k]).to_bytes(16, "little") for c in cols
                )
            out.append(hashlib.blake2b(msg, digest_size=64).digest())
        return out

    def _subtree_digest(self, level: int, index: int) -> bytes:
        """Node digest of a PRUNED level, recomputed from the leaf columns.

        Levels below the stored cut (Merkle cap scheme — the chunked
        big-domain commit prunes its bottom ~10 levels, iop/merkle.py
        ChunkedPairCommit) are never materialized; an opening rebuilds
        the 2^level-leaf subtree under the needed node: one batched leaf
        gather + hashlib upward. ~1 ms per node at the default cut.
        """
        lo = index << level
        digs = self._leaf_digests(list(range(lo, lo + (1 << level))))
        while len(digs) > 1:
            digs = [
                hashlib.blake2b(digs[2 * i] + digs[2 * i + 1], digest_size=64).digest()
                for i in range(len(digs) // 2)
            ]
        return digs[0]

    def _fetch(self, level: int, index: int) -> bytes:
        """Digest levels[level][index] as host bytes (batched-gather cache)."""
        key = (level, index)
        if key not in self._fetch_cache:
            arr = self.levels[level]
            if arr is None:
                self._fetch_cache[key] = (
                    self._leaf_digests([index])[0]
                    if level == 0
                    else self._subtree_digest(level, index)
                )
            elif level in self.plane_levels:
                from stark_anatomy_tpu.parallel.mesh import host_gather

                lane = self._plane_lane(arr, index)
                col = host_gather(jnp.asarray(arr)[:, lane]).astype("<u4")
                self._fetch_cache[key] = col.tobytes()
            elif isinstance(arr, np.ndarray):
                self._fetch_cache[key] = np.ascontiguousarray(
                    arr[index], dtype="<u4"
                ).tobytes()
            else:
                from stark_anatomy_tpu.parallel.mesh import host_gather

                row = host_gather(jnp.asarray(arr)[index]).astype("<u4")
                self._fetch_cache[key] = row.tobytes()
        return self._fetch_cache[key]

    def _prefetch_plan(self, leaf_indices: Sequence[int]):
        """(requests, fill) for the path rows the given opens need.

        requests are UN-dispatched (device_array, lanes, kind) gather
        descriptors for gather_requests — callers funnel MANY trees'
        requests through ONE jitted gather + ONE transfer (the per-kernel
        dispatch overhead, not the bytes, dominated the FRI query phase
        on a remote device). fill(host_rows_list) populates the digest
        cache from the request results, in order."""
        keys = []
        reqs = []
        for level, arr in enumerate(self.levels[:-1]):
            need = sorted({(i >> level) ^ 1 for i in leaf_indices})
            need = [i for i in need if (level, i) not in self._fetch_cache]
            if not need:
                continue
            if arr is None:
                if level == 0:
                    for i, d in zip(need, self._leaf_digests(need)):
                        self._fetch_cache[(level, i)] = d
                else:  # pruned level: rebuild each needed subtree
                    for i in need:
                        self._fetch_cache[(level, i)] = self._subtree_digest(
                            level, i
                        )
                continue
            plane = level in self.plane_levels
            lanes = (
                [self._plane_lane(arr, i) for i in need] if plane else need
            )
            if isinstance(arr, np.ndarray):
                if not plane:
                    continue
                rows = arr[:, lanes].T
                for pos, i in enumerate(need):
                    self._fetch_cache[(level, i)] = np.ascontiguousarray(
                        rows[pos], dtype="<u4"
                    ).tobytes()
                continue
            keys.append((level, need))
            reqs.append(
                (jnp.asarray(arr), lanes, "plane" if plane else "row")
            )

        def fill(host_rows) -> None:
            for (level, need), rows in zip(keys, host_rows):
                rows = np.asarray(rows).astype("<u4")
                for pos, i in enumerate(need):
                    self._fetch_cache[(level, i)] = rows[pos].tobytes()

        return reqs, fill

    def _prefetch(self, leaf_indices: Sequence[int]) -> None:
        """Gather every path row the given leaf opens need — one fused
        device gather, one transfer."""
        reqs, fill = self._prefetch_plan(leaf_indices)
        if reqs:
            fill(gather_requests(reqs))

    @property
    def root(self) -> bytes:
        return np.ascontiguousarray(self.levels[-1][0], dtype="<u4").tobytes()

    def open(self, index: int) -> List[bytes]:
        """Authentication path, leaf-level first (merkle.rs:70-108 order).

        Path element l is the sibling at level l: levels[l][(index >> l) ^ 1].
        """
        n = self.num_leaves
        if n < 2:
            raise ValueError("cannot open a tree with fewer than 2 leaves")
        if not 0 <= index < n:
            raise IndexError(f"leaf index {index} out of range for {n} leaves")
        path = []
        for level in range(len(self.levels) - 1):
            path.append(self._fetch(level, index ^ 1))
            index >>= 1
        return path

    def open_many(self, indices: Sequence[int]) -> List[List[bytes]]:
        """Paths for several leaves with batched device gathers."""
        self._prefetch(list(indices))
        return [self.open(i) for i in indices]

    def open_multi(self, indices: Sequence[int]) -> List[bytes]:
        """Deduplicated batch opening: the multiproof_plan node digests.

        Verify with verify_multiproof(root, {index: leaf_digest}, nodes,
        height). Every plan node is some index's path sibling, so the
        per-leaf _prefetch covers the gathers in one wave.
        """
        idx = sorted(set(int(i) for i in indices))
        n = self.num_leaves
        if not idx:
            raise ValueError("empty multiproof index set")
        if idx[0] < 0 or idx[-1] >= n:
            raise IndexError(f"leaf index out of range for {n} leaves")
        plan = multiproof_plan(idx, len(self.levels) - 1)
        self._prefetch(idx)
        return [self._fetch(level, i) for level, i in plan]

    def start_offload(self) -> None:
        """Begin async device->host copies of every level (non-blocking)."""
        for lv in self.levels:
            if lv is not None and not isinstance(lv, np.ndarray):
                try:
                    lv.copy_to_host_async()
                except AttributeError:  # pragma: no cover - older jax
                    pass

    def offload_to_host(self) -> None:
        """Move all levels to host memory, freeing their HBM.

        For very large trees (a 2^24-leaf tree holds ~2GB of digests) the
        prover offloads committed trees so later phases have headroom;
        opens then read host arrays directly. Call start_offload() earlier
        to overlap the copies with other device work.
        """
        self.levels = [
            lv if lv is None or isinstance(lv, np.ndarray) else np.asarray(lv)
            for lv in self.levels
        ]

    def verify(self, leaf: bytes, path: Sequence[bytes], index: int) -> bool:
        return verify_path(self.root, leaf, path, index)


def multiproof_plan(indices: Sequence[int], height: int) -> List[Tuple[int, int]]:
    """(level, index) of every node a batch opening must SUPPLY.

    Walking leaf-level up: at each level the known set is the indices
    whose digests the verifier can already compute (supplied leaves at
    level 0, then recomputed parents); a sibling that is itself known is
    free, otherwise it must ship. Canonical order: level ascending, then
    the known node's index ascending — both sides derive the plan from
    the same index set, so the node list needs no per-node labels (a
    third of the bytes of labeled per-leaf paths before any sharing).
    """
    if not indices:
        raise ValueError("empty multiproof index set")
    cur = sorted(set(indices))
    if cur[0] < 0 or cur[-1] >= (1 << height):
        raise ValueError("index out of range for tree height")
    out: List[Tuple[int, int]] = []
    for level in range(height):
        cur_set = set(cur)
        nxt = []
        for i in cur:
            if i & 1 and (i ^ 1) in cur_set:
                continue  # counted with its even partner
            if (i ^ 1) not in cur_set:
                out.append((level, i ^ 1))
            nxt.append(i >> 1)
        cur = sorted(set(nxt))
    return out


def verify_multiproof(
    root: bytes, leaves: dict, nodes: Sequence[bytes], height: int
) -> bool:
    """Fold a batch of leaves up one shared frontier; True iff it reaches
    `root` consuming EXACTLY the supplied nodes.

    leaves: {leaf_index: 64-byte digest}. Node order must match
    multiproof_plan(leaves.keys(), height); missing, extra, or reordered
    nodes all fail (the strictness the per-path verifier got from its
    pinned path lengths).
    """
    if not leaves:
        return False
    if any(not 0 <= i < (1 << height) for i in leaves):
        return False
    known = {int(i): bytes(d) for i, d in leaves.items()}
    pos = 0
    for _level in range(height):
        cur = sorted(known)
        nxt = {}
        for i in cur:
            if i & 1 and (i ^ 1) in known:
                continue
            if (i ^ 1) in known:
                sib = known[i ^ 1]
            else:
                if pos >= len(nodes):
                    return False
                sib = nodes[pos]
                pos += 1
            pair = known[i] + sib if i % 2 == 0 else sib + known[i]
            nxt[i >> 1] = hashlib.blake2b(pair, digest_size=64).digest()
        known = nxt
    if pos != len(nodes):
        return False
    return known.get(0) == root


def verify_path(root: bytes, leaf: bytes, path: Sequence[bytes], index: int) -> bool:
    """Fold `leaf` up `path` by index parity; True iff it reaches `root`.

    Mirrors merkle.rs:114-154 including its asserts: non-empty path, index
    within 2^len(path) (ValueError here instead of panic).
    """
    if not path:
        raise ValueError("empty authentication path")
    if not 0 <= index < (1 << len(path)):
        raise ValueError("index out of range for path length")
    current = leaf
    for sibling in path:
        if index % 2 == 0:
            current = hashlib.blake2b(current + sibling, digest_size=64).digest()
        else:
            current = hashlib.blake2b(sibling + current, digest_size=64).digest()
        index >>= 1
    return current == root
