"""Real-TPU kernel equality smoke tests (auto-skip off-TPU).

The rest of the suite runs the Pallas kernels only in interpret mode on
the CPU backend (tests/conftest.py), which validates semantics but not
real lowering: tiling/layout bugs surface only on hardware. This module
asserts kernel == jnp ON DEVICE for one production-sized shape per
kernel family. Run with

    STARK_ANATOMY_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

(`make test-tpu`) in the bench environment each round; without the env
var the conftest pins the CPU backend and everything here skips.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="requires a real TPU (STARK_ANATOMY_TPU_TESTS=1 on hardware)",
)

_N = 1 << 20  # large enough to exercise multi-block grids and real tiling


@pytest.fixture(scope="module")
def limb_batch():
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    rng = np.random.default_rng(7)
    a = jnp.asarray(random_felt_limbs(rng, (_N,)))
    b = jnp.asarray(random_felt_limbs(rng, (_N,)))
    return a, b


def test_field_kernels_match_jnp_on_device(limb_batch):
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import field_pallas as fp

    a, b = limb_batch
    assert fp._on_tpu(), "smoke test running without the TPU kernel path"
    for name, kfn, jfn in [
        ("add", fp.add, fj.add),
        ("sub", fp.sub, fj.sub),
        ("mont_mul", fp.mont_mul, fj.mont_mul),
    ]:
        got = np.asarray(kfn(a, b))
        want = np.asarray(jfn(a, b))
        assert np.array_equal(got, want), f"{name} kernel != jnp on device"


def test_butterfly_kernel_matches_jnp_on_device(limb_batch):
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import field_pallas as fp

    a, b = limb_batch
    tw = fj.mont_mul(a, b)
    hi, lo = fp.butterfly(a, b, tw)
    t = fj.mont_mul(b, tw)
    assert np.array_equal(np.asarray(hi), np.asarray(fj.add(a, t)))
    assert np.array_equal(np.asarray(lo), np.asarray(fj.sub(a, t)))


def test_inv_kernel_matches_fermat_on_device(limb_batch):
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import field_pallas as fp

    a, _ = limb_batch
    inv = fp.inv(a)
    prod = np.asarray(fj.from_mont(fj.mont_mul(a, inv)))
    # a is sampled nonzero, so a * a^-1 == 1 everywhere.
    assert np.array_equal(prod[0], np.ones(_N, dtype=np.uint32))
    assert not prod[1:].any()


def test_ntt_pallas_matches_jnp_on_device():
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import ntt as nttmod
    from stark_anatomy_tpu.ops import ntt_pallas as ntp
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    rng = np.random.default_rng(11)
    x = fj.to_mont(jnp.asarray(random_felt_limbs(rng, (_N,))))
    got = np.asarray(ntp.ntt(x))
    want = np.asarray(nttmod.ntt_jnp(x))
    assert np.array_equal(got, want), "Pallas NTT != jnp NTT on device"
    back = np.asarray(ntp.intt(jnp.asarray(got)))
    assert np.array_equal(back, np.asarray(x)), "Pallas iNTT(NTT(x)) != x"


def test_blake2b_pallas_matches_jnp_on_device():
    # Interpret-mode execution of the unrolled compressor is impractically
    # slow on CPU, so the kernel's only equality coverage is on-device.
    from stark_anatomy_tpu.ops.blake2b import blake2b_u32
    from stark_anatomy_tpu.ops.blake2b_pallas import blake2b_planes

    rng = np.random.default_rng(29)
    n = 1 << 16
    # 256/512: multi-block in-kernel chaining (VERDICT r3 item 7) — the
    # wide-AIR leaf path; parity vs the jnp hasher == hashlib.
    for msg_len in (16, 32, 64, 128, 256, 512):
        k = (msg_len + 3) // 4
        words = rng.integers(0, 1 << 32, size=(n, k), dtype=np.uint64).astype(
            np.uint32
        )
        ref = np.asarray(blake2b_u32(jnp.asarray(words), msg_len=msg_len))
        got = np.asarray(blake2b_planes(jnp.asarray(words.T.copy()), msg_len)).T
        assert np.array_equal(got, ref), f"pallas != jnp at msg_len={msg_len}"


def test_fused_commit_matches_eager_on_device():
    from stark_anatomy_tpu.iop.merkle import (
        MerkleTree,
        commit_columns_fused,
        hash_felt_leaves,
    )
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    rng = np.random.default_rng(31)
    cols = [jnp.asarray(random_felt_limbs(rng, (1 << 16,))) for _ in range(2)]
    eager = MerkleTree.commit(hash_felt_leaves(cols))
    for store in (True, False):
        fused = commit_columns_fused(cols, store_leaves=store)
        assert fused.root == eager.root
        for i in (0, 1, 40000, (1 << 16) - 1):
            assert fused.open(i) == eager.open(i)


def test_mesh_body_kernels_match_jnp_on_device():
    # The mesh-path per-device bodies (VERDICT r3 item 1) on real
    # hardware: the grouped column-NTT kernel, the tables-threaded row
    # NTT, and the sharded-Merkle local-levels pipeline — each against
    # its jnp oracle at a production-like local shape. (shard_map itself
    # needs >1 chip; the bodies are the kernel-bearing part.)
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops import ntt as nttmod
    from stark_anatomy_tpu.ops import ntt_pallas as ntp
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs

    rng = np.random.default_rng(37)
    s, n2 = 8, 1 << 17
    # Row transform via eagerly built stage tables (what _row_transform
    # threads through the mesh).
    x = fj.to_mont(jnp.asarray(random_felt_limbs(rng, (n2,))))
    early, late = ntp.stage_tables(n2, False)
    got = np.asarray(ntp.ntt_with_tables(x, early, late, False))
    want = np.asarray(nttmod.ntt_jnp(x))
    assert np.array_equal(got, want), "ntt_with_tables != jnp on device"

    # Grouped size-S column transforms: n2/s independent size-s NTTs in
    # one early-kernel pass (what _col_transform dispatches).
    from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

    y = fj.to_mont(jnp.asarray(random_felt_limbs(rng, (n2 // s, s))))
    want3 = np.asarray(nttmod.ntt_jnp(y))  # batched over axis 1
    rev = jnp.asarray(bit_reverse_indices(s).astype(np.int32))
    flat = jnp.take(y, rev, axis=2).reshape(8, n2)
    early_s, _ = ntp.stage_tables(s, False)
    got3 = np.asarray(
        ntp.grouped_ntt_with_tables(flat, early_s, s, False)
    ).reshape(8, n2 // s, s)
    assert np.array_equal(got3, want3), "grouped column NTT != jnp on device"


def test_sharded_merkle_body_matches_jnp_on_device():
    from stark_anatomy_tpu.iop.merkle import MerkleTree, hash_felt_leaves
    from stark_anatomy_tpu.ops.limbs import random_felt_limbs
    from stark_anatomy_tpu.parallel import merkle_sharded as ms

    rng = np.random.default_rng(41)
    per_shard = 1 << 14
    cols = [jnp.asarray(random_felt_limbs(rng, (per_shard,))) for _ in range(2)]
    reference = MerkleTree.commit(hash_felt_leaves(cols))
    levels_per_shard = per_shard.bit_length() - 1
    flags = ms._plane_flags(per_shard, 32, True, levels_per_shard)
    assert flags[0]
    got = ms._local_levels(*cols, flags=flags, msg_len=32, interp=False)
    from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

    for lv, f in enumerate(flags):
        want = np.asarray(reference.levels[lv], dtype="<u4")
        arr = np.asarray(got[lv]).astype("<u4")
        if f:
            # Plane levels come out in BIT-REVERSED lane order (the free
            # half/half-reduction layout, iop/merkle.py _bitrev_lanes);
            # commit_sharded un-reverses on materialization — mirror that
            # here before comparing against the natural-order reference.
            arr = arr[:, bit_reverse_indices(arr.shape[1])].T
        np.testing.assert_array_equal(arr, want)


def test_zk_fused_phase_matches_eager_on_device():
    # _zk_phase_jit (one-dispatch zk codeword + commit) must produce the
    # same codeword and tree as the eager _zk_codeword + commit path —
    # this is what guarantees TPU proof bytes equal the CPU goldens now
    # that the TPU prover takes the fused branch.
    from stark_anatomy_tpu.iop.merkle import commit_columns_fused
    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=512)  # F = 2^16 >= default FUSE_MIN
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=4)
    seed = b"zk-fused-smoke"
    std_fused, tree_fused = stark._zk_commit_fused(seed)
    std_eager = stark._zk_codeword(seed)
    tree_eager = commit_columns_fused([std_eager], pair=True)  # grammar v3
    np.testing.assert_array_equal(np.asarray(std_fused), np.asarray(std_eager))
    assert tree_fused.root == tree_eager.root
    for i in (0, 1, 12345, stark.fri_domain_length // 2 - 1):
        assert tree_fused.open(i) == tree_eager.open(i)


def test_batch_inv_matches_ladder_on_device(limb_batch):
    # The batched-inversion scan (group prefix products + one recursive
    # inverse) must match the addition-chain ladder bit-for-bit on real
    # hardware, zeros included.
    from stark_anatomy_tpu.ops import field_pallas as fp

    a, _ = limb_batch
    a = np.array(np.asarray(a))
    zero_at = [0, 129, _N // 2, _N - 1]
    a[:, zero_at] = 0
    x = jnp.asarray(a)
    got = np.asarray(fp.inv(x))  # batch path (_N >= _BATCH_INV_MIN)
    # the ladder maps 0 -> 0 on its own (0^k = 0)
    want = np.asarray(fp._inv_ladder(x, fp._make_mul(False)))
    np.testing.assert_array_equal(got, want)
