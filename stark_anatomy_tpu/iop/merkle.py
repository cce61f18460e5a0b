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
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops.blake2b import blake2b_u32, merkle_node_hash
from stark_anatomy_tpu.ops.limbs import NUM_LIMBS

__all__ = ["MerkleTree", "hash_felt_leaves", "verify_path"]

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


_HASH_CHUNK = 1 << 21  # leaves per dispatch: bounds Blake2b transients to ~1GB


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

    def __init__(self, levels: List):
        self.levels = levels
        self._fetch_cache: dict = {}

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
        # Host tail: tiny levels, hashlib.
        cur = np.asarray(current, dtype="<u4")
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
        return int(self.levels[0].shape[0])

    def _fetch(self, level: int, index: int) -> bytes:
        """Digest levels[level][index] as host bytes (batched-gather cache)."""
        key = (level, index)
        if key not in self._fetch_cache:
            arr = self.levels[level]
            if isinstance(arr, np.ndarray):
                self._fetch_cache[key] = np.ascontiguousarray(
                    arr[index], dtype="<u4"
                ).tobytes()
            else:
                row = np.asarray(jnp.asarray(arr)[index]).astype("<u4")
                self._fetch_cache[key] = row.tobytes()
        return self._fetch_cache[key]

    def _prefetch(self, leaf_indices: Sequence[int]) -> None:
        """Gather every path row the given leaf opens need — one device
        gather + one transfer per level instead of one per digest."""
        for level, arr in enumerate(self.levels[:-1]):
            if isinstance(arr, np.ndarray):
                continue
            need = sorted({(i >> level) ^ 1 for i in leaf_indices})
            need = [i for i in need if (level, i) not in self._fetch_cache]
            if not need:
                continue
            rows = np.asarray(jnp.asarray(arr)[jnp.asarray(need)]).astype("<u4")
            for pos, i in enumerate(need):
                self._fetch_cache[(level, i)] = rows[pos].tobytes()

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

    def start_offload(self) -> None:
        """Begin async device->host copies of every level (non-blocking)."""
        for lv in self.levels:
            if not isinstance(lv, np.ndarray):
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
            lv if isinstance(lv, np.ndarray) else np.asarray(lv)
            for lv in self.levels
        ]

    def verify(self, leaf: bytes, path: Sequence[bytes], index: int) -> bool:
        return verify_path(self.root, leaf, path, index)


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
