"""FRI low-degree proof: device-folded commit, host query/verify.

The reference contains no FRI (SURVEY.md section 0); this implements the
split-and-fold FRI of Szepieniec's "Anatomy of a STARK" tutorial (the
protocol the reference repo is a port of, per the links at
/root/reference/src/field/types/field.rs:14), re-architected TPU-first:

- each folding round is pure device math on (8, n) Montgomery limb arrays:
  new[i] = 2^-1 * ((1 + alpha/d_i) * c[i] + (1 - alpha/d_i) * c[i+n/2]),
  d_i = offset * omega^i — one fused elementwise pass, no scalar loops;
- codeword commitments use the batched device Merkle/Blake2b pipeline
  (iop/merkle.py) with PAIR leaves (grammar v3): leaf i of a length-n
  codeword packs the canonical encodings of c[i] and c[i + n/2] — exactly
  the pair every colinearity query opens (utils/encoding.py leaf rule);
- the Fiat-Shamir transcript, index sampling, colinearity checks and path
  verification are host-side exact integer work (iop/proof_stream.py,
  ops/field.py) — tiny compared to folding/hashing.

Transcript item layout (all JSON-safe, see utils/encoding.py):
  {"fri_root": hex64}                          per round
  {"fri_last_codeword": [dec, ...]}            once
  {"pow_nonce": dec}                           once, iff grinding_bits > 0
  {"fri_points": [[a,b] dec, ...]}             per query round
  {"fri_multiproofs": [[hex64...] per tree]}   once (trees 0..rounds-2)

The multiproof grammar: each tree ships ONE deduplicated batch opening
(iop/merkle.py multiproof_plan) over the pair leaves the query phase
touches. Pair leaves (v3) halve the v2 shape twice over: the (i, i+n/2)
openings collapse to one leaf with one path on a one-level-shorter tree,
and the fold value c left the wire entirely — it is the NEXT round's own
opened a/b (or a fri_last_codeword slot), so the verifier reads it there
(see _verify). Grammar history in utils/encoding.py; goldens regenerated
per version.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.iop.merkle import MerkleTree, verify_multiproof
from stark_anatomy_tpu.iop.proof_stream import ProofStream, ProofStreamError
from stark_anatomy_tpu.ops import field_pallas as fp
from stark_anatomy_tpu.ops import ntt as nttmod
from stark_anatomy_tpu.ops.field import (
    PRIME,
    finv,
    host_intt,
    primitive_root_of_unity,
    sample_field_element,
    sample_indices,
)
from stark_anatomy_tpu.ops.limbs import (
    R_MOD_P,
    int_to_limbs,
    limbs_to_ints,
)
from stark_anatomy_tpu.utils.encoding import (
    digest_to_item,
    felt_to_item,
    hash_felts,
    item_to_digest,
    item_to_felt,
)


#: codeword length at/above which _commit_one streams through the chunked
#: host-resident committer (iop/merkle.py) instead of the one-graph fused
#: commit — see _commit_one. Module-level so tests can force the branch.
_CHUNKED_COMMIT_MIN = 1 << 26


def _const_mont(value: int, n: int) -> jnp.ndarray:
    """(8, n) broadcast of a host int in Montgomery form."""
    c = jnp.asarray(int_to_limbs(value * R_MOD_P % PRIME), dtype=jnp.uint32)
    return jnp.broadcast_to(c.reshape(8, 1), (8, n))


@lru_cache(maxsize=128)
def _inv_domain_mont(offset: int, omega: int, half: int) -> jnp.ndarray:
    """(8, half) table of d_i^{-1} = offset^{-1} * omega^{-i}, Montgomery."""
    tab = nttmod.powers(finv(omega), half)
    return fp.mont_mul(tab, _const_mont(finv(offset), half))


@jax.jit
def _fold_jit(cw: jnp.ndarray, alpha_m: jnp.ndarray, inv_dom: jnp.ndarray) -> jnp.ndarray:
    """Fold math as ONE dispatch (op-for-op the eager sequence, so values
    are bit-identical; fusing matters because each eager fp call is a
    separate round trip over a remote-device link)."""
    half = cw.shape[-1] // 2
    lo, hi = cw[:, :half], cw[:, half:]
    au = fp.mont_mul(jnp.broadcast_to(alpha_m.reshape(8, 1), (8, half)), inv_dom)
    one = _const_mont(1, half)
    t = fp.add(fp.mont_mul(fp.add(one, au), lo), fp.mont_mul(fp.sub(one, au), hi))
    return fp.mont_mul(_const_mont(finv(2), half), t)


@partial(jax.jit, static_argnames=("store_leaves",))
def _fold_commit_jit(cw, alpha_m, inv_dom, store_leaves: bool):
    """ONE dispatch for a full device FRI round: fold -> from_mont ->
    pair-leaf hash -> every Merkle level (VERDICT r3 item 3a). Values are
    op-for-op the eager fold + commit_columns_fused sequence, so bytes
    are identical; fusing removes two device round trips per round and
    lets XLA keep the fold output resident for the hash pipeline."""
    from stark_anatomy_tpu.iop.merkle import _commit_levels_traced

    folded = _fold_jit(cw, alpha_m, inv_dom)
    standard = fp.from_mont(folded)
    plane, rows, top = _commit_levels_traced((standard,), 32, store_leaves, pair=True)
    return folded, standard, plane, rows, top


def fold(codeword_mont: jnp.ndarray, alpha: int, offset: int, omega: int) -> jnp.ndarray:
    """One FRI fold on device. codeword: (8, n) Montgomery form.

    Returns the length-n/2 codeword of the alpha-combined even/odd parts,
    living on the squared domain offset^2 * <omega^2>.
    """
    n = codeword_mont.shape[-1]
    half = n // 2
    alpha_m = jnp.asarray(int_to_limbs(alpha * R_MOD_P % PRIME), dtype=jnp.uint32)
    return _fold_jit(
        codeword_mont, alpha_m, jnp.asarray(_inv_domain_mont(offset, omega, half))
    )


def gather_columns(arr, idx_list: List[int]) -> np.ndarray:
    """(8, n) limb array (host or device) -> (8, k) host columns.

    Host arrays use numpy fancy indexing directly; device arrays do one
    batched on-device gather + one small transfer. Never re-uploads an
    offloaded array.
    """
    if isinstance(arr, np.ndarray):
        return arr[:, idx_list]
    from stark_anatomy_tpu.parallel.mesh import host_gather

    return host_gather(jnp.take(arr, jnp.asarray(idx_list), axis=1))


def colinearity_check(points: List[Tuple[int, int]]) -> bool:
    """True iff the (exactly 3) points lie on one line over F_p."""
    (x0, y0), (x1, y1), (x2, y2) = points
    return ((y2 - y0) * (x1 - x0) - (y1 - y0) * (x2 - x0)) % PRIME == 0


@dataclass(frozen=True)
class Fri:
    """FRI prover/verifier for one fixed evaluation domain.

    offset: coset shift of the evaluation domain (must generate a coset
    disjoint from any trace domain above — the STARK layer passes the field
    generator); domain_length: power-of-two size of the top codeword;
    expansion_factor: blowup (codeword length / max degree bound);
    num_colinearity_tests: soundness repetitions.
    """

    offset: int
    domain_length: int
    expansion_factor: int
    num_colinearity_tests: int
    # Optional jax.sharding.Mesh: folds stay data-parallel over the mesh
    # and commitments reduce per-shard subtrees (parallel/merkle_sharded).
    # Proof bytes are mesh-independent; the verifier ignores it entirely.
    mesh: object = None
    #: proof-of-work bits ground into the transcript before query sampling
    #: (utils/encoding.py grind); adds this many bits to the FRI query
    #: soundness. 0 = no pow item in the transcript (grammar-compatible
    #: with pre-grinding proofs).
    grinding_bits: int = 0

    def __post_init__(self):
        if self.domain_length & (self.domain_length - 1):
            raise ValueError("domain_length must be a power of two")
        if self.expansion_factor & (self.expansion_factor - 1):
            raise ValueError("expansion_factor must be a power of two")
        # Degenerate round counts are configuration errors, not runtime
        # surprises: 0 rounds crashes the prover, 1 round emits no query
        # points (the verifier would accept a contentless transcript and
        # the STARK layer would then reject honest proofs).
        if self.num_rounds < 2:
            raise ValueError(
                f"FRI configuration degenerates to {self.num_rounds} round(s): "
                f"domain_length={self.domain_length} must exceed both "
                f"2*expansion_factor={2 * self.expansion_factor} and "
                f"8*num_colinearity_tests={8 * self.num_colinearity_tests}"
            )

    def security_bits(self, conjectured: bool = True) -> float:
        """Soundness of the FRI query phase, in bits (docs/SOUNDNESS.md §1).

        Each of the q = num_colinearity_tests queries independently probes
        the committed word at a transcript-random position (indices are
        sampled with rejection of duplicates per round, ops/field.py
        sample_indices). A word delta-far from the degree bound survives a
        query with probability <= 1 - delta, where the provable proximity
        regime reaches the Johnson bound delta = 1 - sqrt(rho) (rho =
        1/expansion_factor) and the standard conjecture (ethSTARK
        "conjectured soundness", also what winterfell/stone ship) reaches
        delta = 1 - rho. Hence per query:

          conjectured: -log2(rho)      = log2(expansion_factor) bits
          proven:      -log2(sqrt(rho)) = log2(expansion_factor)/2 bits

        Grinding multiplies the attacker's query-resampling cost by
        2^grinding_bits, adding grinding_bits to either count.
        """
        log_blowup = self.expansion_factor.bit_length() - 1
        per_query = log_blowup if conjectured else log_blowup / 2
        return self.num_colinearity_tests * per_query + self.grinding_bits

    def _gather_host(self, arr) -> np.ndarray:
        """Sharded/device array -> host numpy, safe under multi-process.

        Delegates to parallel/mesh.py host_gather: np.asarray on a
        mesh-sharded array requires every shard to be process-local; on a
        multi-host pod the shards live on other processes and it raises
        (ADVICE r3). host_gather replicates through a jitted identity
        first (an all-gather along the shard axis). Exercised for real by
        tests/test_multiprocess.py.
        """
        from stark_anatomy_tpu.parallel.mesh import host_gather

        return host_gather(arr)

    @property
    def omega(self) -> int:
        return primitive_root_of_unity(self.domain_length)

    @property
    def num_rounds(self) -> int:
        codeword_length = self.domain_length
        num = 0
        while (
            codeword_length > self.expansion_factor
            and 4 * self.num_colinearity_tests < codeword_length
        ):
            codeword_length //= 2
            num += 1
        return num

    def eval_domain(self) -> List[int]:
        """[offset * omega^i] as host ints (verifier-side)."""
        omega = self.omega
        out, cur = [], 1
        for _ in range(self.domain_length):
            out.append(self.offset * cur % PRIME)
            cur = cur * omega % PRIME
        return out

    # -- prover ------------------------------------------------------------

    def prove(
        self,
        codeword_mont: jnp.ndarray,
        proof_stream: ProofStream,
        checkpoint_dir: str | None = None,
        checkpoint_meta: dict | None = None,
    ) -> List[int]:
        """Commit + query phases. Returns the top-level query indices.

        codeword_mont: (8, domain_length) Montgomery-form limb array of the
        codeword to be proven close to degree < domain_length/expansion.

        checkpoint_dir/checkpoint_meta: when set, each committed round's
        canonical codeword is snapshotted (utils/checkpoint.py, stage
        "fri-r{r}"); a rerun with the same meta replays the completed
        rounds from disk — trees are re-hashed from the stored codewords
        (commitment is deterministic), so resume skips every completed
        fold and produces byte-identical transcripts. FRI+query is the
        longest prover phase at production sizes; without this a crash
        mid-FRI lost everything since the pre-FRI snapshot.
        """
        if codeword_mont.shape[-1] != self.domain_length:
            raise ValueError("codeword length != configured domain length")
        checkpoint_meta = checkpoint_meta or {}
        rounds = self.num_rounds
        omega, offset = self.omega, self.offset

        # Above this round size, committed artifacts are offloaded to host
        # immediately: the usable HBM on one chip cannot hold every round's
        # codeword + tree at production sizes.
        offload_threshold = int(
            __import__("os").environ.get("STARK_ANATOMY_OFFLOAD_N", str(1 << 25))
        )

        codewords_dev: List = []  # canonical-form limb codewords
        trees: List[MerkleTree] = []
        codeword = codeword_mont
        resume_from = 0
        if checkpoint_dir is not None:
            from stark_anatomy_tpu.utils import checkpoint as ckpt

            # Replay the longest consecutive prefix of snapshotted rounds:
            # re-commit each stored codeword (deterministic => identical
            # roots/transcript), re-derive the fold challenges, and leave
            # `codeword` as the fold of the last replayed round so the live
            # loop continues seamlessly at r = resume_from.
            snaps: List[np.ndarray] = []
            for r in range(rounds):
                snap = ckpt.load(checkpoint_dir, f"fri-r{r}", checkpoint_meta)
                if snap is None:
                    break
                snaps.append(snap["arrays"]["codeword"])
            resume_from = len(snaps)
            for r, arr in enumerate(snaps):
                standard = jnp.asarray(arr)
                tree = self._commit_one(standard)
                codewords_dev.append(standard)
                trees.append(tree)
                proof_stream.push({"fri_root": digest_to_item(tree.root)})
                if r == rounds - 1:
                    break
                alpha = sample_field_element(proof_stream.prover_fiat_shamir())
                if r == len(snaps) - 1:
                    # Last snapshotted round: fold it so the live loop can
                    # continue; earlier folds are skipped entirely (their
                    # results are the later snapshots).
                    codeword = fold(fp.to_mont(standard), alpha, offset, omega)
                omega = omega * omega % PRIME
                offset = offset * offset % PRIME
        # Below this size the remaining rounds run entirely on host: each
        # device round costs ~3 serialized round trips (fold dispatch,
        # commit dispatch, root fetch) regardless of size, while exact
        # host math on a few thousand values is sub-millisecond. Values
        # and transcripts are bit-identical (exact field arithmetic both
        # sides; leaf hashing parity is pinned in tests).
        host_tail_n = int(
            __import__("os").environ.get("STARK_ANATOMY_FRI_HOST_N", str(1 << 14))
        )
        import os as _os

        fuse_min = int(_os.environ.get("STARK_ANATOMY_FUSE_MIN", str(1 << 16)))
        from stark_anatomy_tpu.utils.telemetry import phase as _tphase

        pending = None  # (round, tree, standard) whose D2H copies are in flight
        prepared = None  # (standard, tree) produced by a fused fold+commit
        for r in range(resume_from, rounds):
            # The host tail applies on the mesh path too: np.asarray on a
            # sharded array gathers it, and below host_tail_n the rounds
            # are too small to shard profitably anyway — running them on
            # device would compile a fold + sharded-commit graph PER
            # remaining size for no wall-clock gain. Transcripts are
            # bit-identical either way (exact field math both sides).
            if codeword.shape[-1] <= host_tail_n:
                with _tphase("fri.host-tail"):
                    self._host_tail(
                        codeword, r, rounds, omega, offset, codewords_dev,
                        trees, proof_stream, checkpoint_dir, checkpoint_meta,
                    )
                break
            if prepared is not None:
                standard, tree = prepared
                prepared = None
            else:
                codeword = self._reshard(codeword)
                standard = fp.from_mont(codeword)
                tree = self._commit_one(standard)
            if checkpoint_dir is not None:
                from stark_anatomy_tpu.utils import checkpoint as ckpt

                ckpt.save(
                    checkpoint_dir, f"fri-r{r}", [],
                    {"codeword": self._gather_host(standard)}, checkpoint_meta,
                )
            if standard.shape[-1] >= offload_threshold:
                # Kick the copies off now; materialize (and free the HBM)
                # after the NEXT round's fold+commit has been dispatched so
                # the transfer overlaps device work.
                tree.start_offload()
                try:
                    standard.copy_to_host_async()
                except AttributeError:  # pragma: no cover - older jax
                    pass
                if pending is not None:
                    pr, ptree, pstd = pending
                    ptree.offload_to_host()
                    codewords_dev[pr] = self._gather_host(pstd)
                    ptree.replace_leaf_columns([codewords_dev[pr]])
                pending = (r, tree, standard)
            # Codewords stay resident (device below the offload threshold);
            # ints are extracted only at the handful of queried indices.
            codewords_dev.append(standard)
            trees.append(tree)
            with _tphase("fri.root-sync"):
                proof_stream.push({"fri_root": digest_to_item(tree.root)})
            if r == rounds - 1:
                break
            alpha = sample_field_element(proof_stream.prover_fiat_shamir())
            half = codeword.shape[-1] // 2
            if self.mesh is None and half > host_tail_n and half >= fuse_min:
                # Fused round: the NEXT round's codeword, canonical form,
                # and full tree in one dispatch (bytes identical to the
                # eager sequence — tests/test_stark.py fused-path pins).
                from stark_anatomy_tpu.iop.merkle import assemble_fused_tree
                from stark_anatomy_tpu.iop.merkle import _DROP_LEAVES_MIN

                alpha_m = jnp.asarray(
                    int_to_limbs(alpha * R_MOD_P % PRIME), dtype=jnp.uint32
                )
                inv_dom = jnp.asarray(_inv_domain_mont(offset, omega, half))
                store = half // 2 < _DROP_LEAVES_MIN  # pair trees: n/2 leaves
                codeword, std_next, plane, rows_dev, top = _fold_commit_jit(
                    codeword, alpha_m, inv_dom, store
                )
                with _tphase("fri.fused-assemble"):
                    prepared = (
                        std_next,
                        assemble_fused_tree(
                            plane, rows_dev, top, [std_next], store, pair=True
                        ),
                    )
            else:
                codeword = fold(codeword, alpha, offset, omega)
            omega = omega * omega % PRIME
            offset = offset * offset % PRIME
        if pending is not None:
            pr, ptree, pstd = pending
            ptree.offload_to_host()
            codewords_dev[pr] = self._gather_host(pstd)
            ptree.replace_leaf_columns([codewords_dev[pr]])

        with _tphase("fri.last-gather"):
            last_values = limbs_to_ints(self._gather_host(codewords_dev[-1]))
            proof_stream.push(
                {"fri_last_codeword": [felt_to_item(int(v)) for v in last_values]}
            )

        # Grinding: the nonce binds to the full commit-phase transcript and
        # enters the stream BEFORE index sampling, so re-rolling queries
        # costs 2^grinding_bits hashes per attempt (utils/encoding.py).
        if self.grinding_bits:
            from stark_anatomy_tpu.utils.encoding import grind, nonce_to_item

            with _tphase("fri.grind"):
                nonce = grind(
                    proof_stream.prover_fiat_shamir(), self.grinding_bits
                )
            proof_stream.push({"pow_nonce": nonce_to_item(nonce)})

        # Query phase: indices from the transcript AFTER the last codeword
        # (and the pow nonce, when grinding is configured).
        top_indices = sample_indices(
            proof_stream.prover_fiat_shamir(),
            self.domain_length // 2,
            self.domain_length >> rounds,
            self.num_colinearity_tests,
        )
        # Two passes: dispatch EVERY gather (codeword columns + Merkle path
        # rows for all rounds) asynchronously, transfer them in one
        # jax.device_get wave, then assemble the transcript from host data.
        # The naive per-round/per-level fetches were ~40 serialized round
        # trips per round — the dominant FRI cost over a remote link.
        #
        # Openings ship as ONE multiproof per tree (iop/merkle.py
        # multiproof_plan; VERDICT r3 item 5). Grammar v3 (pair leaves):
        # round r opens PAIR leaf i_r of tree r, which binds BOTH
        # colinearity values (a = c[i], b = c[i + half]) with one path;
        # the c value is never shipped at all — it IS the next round's a
        # or b (i_r folds to i_{r+1} = i_r mod half_{r+1}, so
        # c_r = a_{r+1} if i_r < half_{r+1} else b_{r+1}), or a direct
        # fri_last_codeword lookup on the final round. The last tree
        # ships nothing — the verifier rebuilds it from fri_last_codeword.
        from stark_anatomy_tpu.iop.merkle import gather_requests

        indices = list(top_indices)
        requests: List = []
        pending: List[dict] = []
        for r in range(rounds - 1):
            n = self.domain_length >> r
            indices = [i % (n // 2) for i in indices]
            a_idx = list(indices)
            b_idx = [i + n // 2 for i in indices]
            entry: dict = {"r": r, "a_idx": a_idx, "half": n // 2}
            cur = codewords_dev[r]
            if isinstance(cur, np.ndarray):
                entry["cur_cols"] = cur[:, a_idx + b_idx]
            else:
                entry["cur_slot"] = len(requests)
                requests.append((cur, a_idx + b_idx, "col"))
            d1, f1 = trees[r]._prefetch_plan(a_idx)
            entry["tree_base"] = len(requests)
            entry["tree_count"] = len(d1)
            entry["fill"] = f1
            requests.extend(d1)
            pending.append(entry)
        with _tphase("fri.query-gather"):
            # Every round's codeword columns + path rows in ONE jitted
            # gather + ONE transfer (iop/merkle.py gather_requests):
            # ~hundreds of separate gather kernels cost ~2 ms apiece of
            # dispatch/execution overhead on a remote device.
            fetched = gather_requests(requests)
        with _tphase("fri.query-emit"):
            for entry in pending:
                if "cur_slot" in entry:
                    entry["cur_cols"] = np.asarray(fetched[entry["cur_slot"]])
                base = entry["tree_base"]
                entry["fill"](fetched[base : base + entry["tree_count"]])
                self._emit_query_points(entry, proof_stream)
            multiproofs = []
            for entry in pending:
                opened = sorted(set(entry["a_idx"]))
                multiproofs.append(
                    [
                        digest_to_item(d)
                        for d in trees[entry["r"]].open_multi(opened)
                    ]
                )
            if rounds > 1:
                proof_stream.push({"fri_multiproofs": multiproofs})
        return top_indices

    def _host_tail(
        self, codeword_mont, start_round, rounds, omega, offset,
        codewords_dev, trees, proof_stream, checkpoint_dir, checkpoint_meta,
    ) -> None:
        """Run rounds start_round..rounds-1 in exact host arithmetic.

        One device->host transfer of the (small) current codeword, then
        pure-Python folds and hashlib commits — identical values, roots
        and snapshots to the device path (exact field math both sides;
        tests/test_fri.py pins fold parity, tests/test_blake2b.py pins
        hashing parity)."""
        from stark_anatomy_tpu.ops.limbs import ints_to_limbs
        from stark_anatomy_tpu.utils.encoding import hash_felts as _hash_felts

        values = [
            int(v) for v in limbs_to_ints(self._gather_host(fp.from_mont(codeword_mont)))
        ]
        for r in range(start_round, rounds):
            limbs = ints_to_limbs(values)  # (8, n) np — query-phase format
            h0 = len(values) // 2
            leaves = np.stack(
                [
                    np.frombuffer(
                        _hash_felts([values[i], values[i + h0]]), dtype="<u4"
                    )
                    for i in range(h0)
                ]
            )
            tree = MerkleTree.commit(leaves, device=False)
            tree.pair_leaves = True
            if checkpoint_dir is not None:
                from stark_anatomy_tpu.utils import checkpoint as ckpt

                ckpt.save(
                    checkpoint_dir, f"fri-r{r}", [],
                    {"codeword": limbs}, checkpoint_meta or {},
                )
            codewords_dev.append(limbs)
            trees.append(tree)
            proof_stream.push({"fri_root": digest_to_item(tree.root)})
            if r == rounds - 1:
                break
            alpha = sample_field_element(proof_stream.prover_fiat_shamir())
            # Native C fold when available (identical mod-p values; the
            # pure-Python big-int loop was ~0.4s of the warm 2^20 prove).
            from stark_anatomy_tpu import native

            values = native.fri_fold_values(
                values, alpha, finv(offset), finv(omega)
            )
            omega = omega * omega % PRIME
            offset = offset * offset % PRIME

    def _reshard(self, codeword_mont):
        """Re-lay a fold result out in contiguous blocks over the mesh.

        Folding halves the domain, so the natural output of a fold is
        unevenly spread; one device_put per round keeps every fold and
        commit data-parallel. No-op without a mesh or once the codeword
        is too small to divide evenly.
        """
        if self.mesh is None:
            return codeword_mont
        from stark_anatomy_tpu.parallel.mesh import SHARD_AXIS, codeword_sharding

        import jax

        if int(codeword_mont.shape[-1]) % self.mesh.shape[SHARD_AXIS]:
            return codeword_mont
        return jax.device_put(codeword_mont, codeword_sharding(self.mesh))

    def _commit_one(self, standard):
        """Pair-leaf commitment of one codeword (grammar v3): leaf i =
        hash(c[i] || c[i + n/2]) — exactly the pair every query opens.

        Codewords at/above 2^26 commit through the streaming chunked
        builder (iop/merkle.py): the one-graph fused commit's working set
        on top of the standing FRI state exceeds a 16 GB chip there, and
        the tree is born host-resident (which the offload machinery would
        do right after anyway)."""
        if self.mesh is not None:
            from stark_anatomy_tpu.parallel.merkle_sharded import commit_sharded

            return commit_sharded([standard], self.mesh, pair=True)
        from stark_anatomy_tpu.iop.merkle import (
            commit_columns_chunked,
            commit_columns_fused,
        )

        if int(standard.shape[-1]) >= _CHUNKED_COMMIT_MIN:
            return commit_columns_chunked([standard])
        return commit_columns_fused([standard], pair=True)

    def _emit_query_points(self, entry, proof_stream):
        """One query round's colinearity point values from prefetched host
        data (entry comes from the prove() gather wave). Only (a, b) ship
        (grammar v3): the fold result c is redundant — it is the next
        round's own a/b (or a fri_last_codeword slot), and the verifier
        reads it there. Openings travel separately as per-tree
        multiproofs."""
        from stark_anatomy_tpu.ops.limbs import limbs_to_int

        indices = entry["a_idx"]
        cur_cols = entry["cur_cols"]
        points = []
        for s, _ in enumerate(indices):
            a = limbs_to_int(cur_cols[:, s])
            b = limbs_to_int(cur_cols[:, s + len(indices)])
            points.append([felt_to_item(a), felt_to_item(b)])
        proof_stream.push({"fri_points": points})

    # -- verifier ----------------------------------------------------------

    def verify(self, proof_stream: ProofStream) -> Tuple[bool, List[Tuple[int, int]]]:
        """Replays the transcript. Returns (accept, top-level points).

        The returned (index, value) pairs of the TOP codeword let the STARK
        layer cross-check the combination polynomial at the queried spots.
        Malformed transcripts (bad encodings, wrong path lengths, truncated
        streams) are rejections — (False, []) — never exceptions.
        """
        try:
            return self._verify(proof_stream)
        except (KeyError, TypeError, ValueError, IndexError, ProofStreamError):
            return False, []

    def _verify(self, proof_stream: ProofStream) -> Tuple[bool, List[Tuple[int, int]]]:
        rounds = self.num_rounds
        omega, offset = self.omega, self.offset

        roots: List[bytes] = []
        alphas: List[int] = []
        for r in range(rounds):
            roots.append(item_to_digest(proof_stream.pull()["fri_root"]))
            if r == rounds - 1:
                break
            alphas.append(sample_field_element(proof_stream.verifier_fiat_shamir()))

        last_items = proof_stream.pull()["fri_last_codeword"]
        last_codeword = [item_to_felt(v) for v in last_items]
        last_len = self.domain_length >> (rounds - 1)
        if len(last_codeword) != last_len:
            return False, []

        # Last codeword must hash to the last commitment (pair leaves,
        # grammar v3). The whole verifier is host-only by design (zero
        # device dispatches: a STARK verifier must run anywhere,
        # instantly), so both the re-commit and the low-degree check below
        # use exact host arithmetic — the last codeword is small
        # (<= max(2*expansion, 8*checks) values).
        lh = last_len // 2
        last_leaves = np.stack(
            [
                np.frombuffer(
                    hash_felts([last_codeword[j], last_codeword[j + lh]]),
                    dtype="<u4",
                )
                for j in range(lh)
            ]
        )
        last_tree = MerkleTree.commit(last_leaves, device=False)
        if last_tree.root != roots[-1]:
            return False, []
        # ...and must be of low enough degree (interpolate on its coset:
        # coefficients of q(offset*x) rescaled by offset^-i).
        last_offset = pow(offset, 1 << (rounds - 1), PRIME)
        inv_off = finv(last_offset)
        q = host_intt(last_codeword)
        coeffs = [q[i] * pow(inv_off, i, PRIME) % PRIME for i in range(last_len)]
        degree_bound = last_len // self.expansion_factor  # max num coefficients
        if any(int(c) != 0 for c in coeffs[degree_bound:]):
            return False, []

        if self.grinding_bits:
            from stark_anatomy_tpu.utils.encoding import (
                item_to_nonce,
                pow_digest_ok,
            )

            # Seed = transcript digest BEFORE the nonce item; then the
            # nonce joins the stream so index sampling commits to it.
            seed = proof_stream.verifier_fiat_shamir()
            nonce = item_to_nonce(proof_stream.pull()["pow_nonce"])
            if not pow_digest_ok(seed, nonce, self.grinding_bits):
                return False, []

        top_indices = sample_indices(
            proof_stream.verifier_fiat_shamir(),
            self.domain_length // 2,
            self.domain_length >> rounds,
            self.num_colinearity_tests,
        )
        top_points: List[Tuple[int, int]] = []
        indices = list(top_indices)
        # Collect every round's (a, b) pairs FIRST: with pair leaves
        # (grammar v3) the fold value c is never on the wire — for query s
        # at round r it is round r+1's own opened a or b (i_r folds to
        # i_{r+1} = i_r mod half_{r+1}; a if i_r < half_{r+1}, else b), or
        # a direct fri_last_codeword slot on the final query round.
        rounds_idx: List[List[int]] = []
        rounds_pts: List[List[Tuple[int, int]]] = []
        for r in range(rounds - 1):
            half = (self.domain_length >> r) // 2
            indices = [i % half for i in indices]
            points_items = proof_stream.pull()["fri_points"]
            if len(points_items) != len(indices):
                return False, []
            pts = []
            for item in points_items:
                if len(item) != 2:
                    return False, []
                pts.append((item_to_felt(item[0]), item_to_felt(item[1])))
            rounds_idx.append(list(indices))
            rounds_pts.append(pts)
        # Colinearity checks + claimed-pair consistency. Two queries that
        # land on the same pair leaf must claim the same (a, b) — a
        # conflicting transcript is rejected before any hashing.
        claimed: List[dict] = [dict() for _ in range(rounds - 1)]
        for r in range(rounds - 1):
            half = (self.domain_length >> r) // 2
            omega_r = pow(self.omega, 1 << r, PRIME)
            offset_r = pow(self.offset, 1 << r, PRIME)
            alpha = alphas[r]
            next_half = half // 2
            for s, i in enumerate(rounds_idx[r]):
                ay, by = rounds_pts[r][s]
                if r + 1 < rounds - 1:
                    a2, b2 = rounds_pts[r + 1][s]
                    cy = a2 if i < next_half else b2
                else:
                    if not 0 <= i < len(last_codeword):
                        return False, []
                    cy = int(last_codeword[i])
                ax = offset_r * pow(omega_r, i, PRIME) % PRIME
                bx = offset_r * pow(omega_r, i + half, PRIME) % PRIME
                if not colinearity_check([(ax, ay), (bx, by), (alpha, cy)]):
                    return False, []
                prev = claimed[r].setdefault(i, (ay, by))
                if prev != (ay, by):
                    return False, []
                if r == 0:
                    top_points.append((i, ay))
                    top_points.append((i + half, by))
        # ONE multiproof per tree 0..rounds-2 binds every claimed pair
        # leaf; the last tree was rebuilt from fri_last_codeword above, so
        # the final round's c values are bound by that root directly.
        if rounds > 1:
            mp_items = proof_stream.pull()["fri_multiproofs"]
            if not isinstance(mp_items, list) or len(mp_items) != rounds - 1:
                return False, []
            for t in range(rounds - 1):
                # Pair tree over a length-(domain >> t) codeword: half the
                # leaves, one level shorter.
                height = (self.domain_length >> t).bit_length() - 2
                leaf_map = {
                    pos: hash_felts([ay, by])
                    for pos, (ay, by) in claimed[t].items()
                }
                nodes = [item_to_digest(d) for d in mp_items[t]]
                if not verify_multiproof(roots[t], leaf_map, nodes, height):
                    return False, []
        return True, top_points
