"""Multi-device determinism: sharded ops == single-device ops, bit-exact.

Runs on the 8-virtual-device CPU mesh from conftest (SURVEY.md section 4's
simulated-mesh strategy). Exact integer math means ANY mismatch is a bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stark_anatomy_tpu.iop.merkle import MerkleTree, hash_felt_leaves
from stark_anatomy_tpu.ops import field_jnp as fj
from stark_anatomy_tpu.ops import ntt as nttmod
from stark_anatomy_tpu.ops.field import GENERATOR
from stark_anatomy_tpu.ops.limbs import ints_to_limbs
from stark_anatomy_tpu.parallel.mesh import codeword_sharding, make_mesh
from stark_anatomy_tpu.parallel.merkle_sharded import commit_sharded
from stark_anatomy_tpu.parallel.ntt_sharded import (
    CYCLIC,
    sharded_coset_evaluate,
    sharded_lde,
    sharded_ntt,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _random_codeword(n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    return fj.to_mont(jnp.asarray(ints_to_limbs(vals)))


@pytest.mark.parametrize("n", [256, 1024])
def test_sharded_ntt_matches_single_device(mesh8, n):
    x = _random_codeword(n)
    want = np.asarray(nttmod.ntt(x))
    xs = jax.device_put(x, codeword_sharding(mesh8))
    got = np.asarray(sharded_ntt(xs, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_intt_matches_and_roundtrips(mesh8):
    x = _random_codeword(512, seed=1)
    want = np.asarray(nttmod.intt(x))
    xs = jax.device_put(x, codeword_sharding(mesh8))
    got = np.asarray(sharded_ntt(xs, mesh8, inverse=True))
    np.testing.assert_array_equal(got, want)
    # round trip
    back = np.asarray(sharded_ntt(sharded_ntt(xs, mesh8), mesh8, inverse=True))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_sharded_coset_evaluate_matches(mesh8):
    coeffs = _random_codeword(128, seed=2)
    want = np.asarray(nttmod.coset_evaluate(coeffs, 512, GENERATOR))
    got = np.asarray(sharded_coset_evaluate(coeffs, 512, GENERATOR, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_merkle_matches_single_device(mesh8):
    rng = np.random.default_rng(3)
    n = 256
    cols_ints = [[int(x) for x in rng.integers(0, 1 << 62, size=n)] for _ in range(2)]
    cols = [jnp.asarray(ints_to_limbs(c)) for c in cols_ints]
    reference = MerkleTree.commit(hash_felt_leaves(cols))
    tree = commit_sharded(cols, mesh8)
    assert tree.root == reference.root
    for idx in (0, 1, 100, 255):
        assert tree.open(idx) == reference.open(idx)


def test_sharded_merkle_kernel_body_bit_exact(monkeypatch):
    # VERDICT r3 item 1 (hash half): the sharded commit's per-device body
    # runs the Pallas Blake2b pipeline. Interpret-executing the unrolled
    # compressor is impractically slow on CPU (a standing constraint —
    # see tests/test_tpu_smoke.py::test_blake2b_pallas_matches_jnp_on_device),
    # so here the kernel is swapped for its layout-equivalent jnp oracle
    # and the test pins everything AROUND it: the plane-flag schedule,
    # the even/odd level split, the plane->row transpose boundary, the
    # global-level assembly commit_sharded's out_specs perform, and opens
    # through the plane_levels bookkeeping — all bit-identical to the
    # single-device tree. Kernel==jnp itself is pinned on hardware by
    # tests/test_tpu_smoke.py (same body, interp=False).
    from stark_anatomy_tpu.ops import blake2b_pallas as bp
    from stark_anatomy_tpu.ops.blake2b import blake2b_u32
    from stark_anatomy_tpu.parallel import merkle_sharded as ms

    monkeypatch.setattr(
        bp,
        "blake2b_planes",
        lambda planes, msg_len, interpret=False: blake2b_u32(
            jnp.transpose(planes), msg_len=msg_len
        ).T,
    )

    rng = np.random.default_rng(12)
    s, per_shard = 8, 2048
    n = s * per_shard  # leaf + one reduction on kernels, rest jnp
    cols_ints = [[int(x) for x in rng.integers(0, 1 << 62, size=n)] for _ in range(2)]
    cols = [jnp.asarray(ints_to_limbs(c)) for c in cols_ints]
    reference = MerkleTree.commit(hash_felt_leaves(cols))
    levels_per_shard = per_shard.bit_length() - 1
    flags = ms._plane_flags(per_shard, 32, True, levels_per_shard)
    assert flags[0] and flags[1] and not flags[2]
    shards = []
    for d in range(s):
        block = [c[:, d * per_shard : (d + 1) * per_shard] for c in cols]
        shards.append(
            ms._local_levels(*block, flags=flags, msg_len=32, interp=True)
        )
    from stark_anatomy_tpu.ops.ntt import bit_reverse_indices

    levels = []
    for lv, f in enumerate(flags):
        parts = [np.asarray(sh[lv]) for sh in shards]
        if f:
            # The body emits each shard's plane lanes in BIT-REVERSED
            # order (free half/half reductions on device); commit_sharded
            # un-reverses at host materialization — model that here.
            perm = bit_reverse_indices(parts[0].shape[1])
            parts = [p[:, perm] for p in parts]
        levels.append(np.concatenate(parts, axis=1 if f else 0))
    # Assembled levels == the reference tree's levels (plane levels are
    # the same digests stored transposed).
    for lv, f in enumerate(flags):
        want = np.asarray(reference.levels[lv], dtype="<u4")
        got = levels[lv].T if f else levels[lv]
        np.testing.assert_array_equal(got.astype("<u4"), want)
    # And the MerkleTree built the way commit_sharded builds it (host
    # top + plane_levels bookkeeping) opens identically.
    cur = levels[-1].astype("<u4")
    import hashlib

    while cur.shape[0] > 1:
        nxt = np.empty((cur.shape[0] // 2, 16), dtype="<u4")
        for i in range(nxt.shape[0]):
            d = hashlib.blake2b(
                cur[2 * i].tobytes() + cur[2 * i + 1].tobytes(), digest_size=64
            ).digest()
            nxt[i] = np.frombuffer(d, dtype="<u4")
        levels.append(nxt)
        cur = nxt
    tree = MerkleTree(levels, plane_levels=frozenset({0, 1}))
    assert tree.root == reference.root
    for idx in (0, 1, 1000, n - 1):
        assert tree.open(idx) == reference.open(idx)


def test_sharded_merkle_traces_pallas_calls(mesh8, monkeypatch):
    # Structural pin: with kernels on, the traced sharded-commit body
    # contains the Pallas hash calls (plane levels in its out tree).
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from stark_anatomy_tpu.parallel import merkle_sharded as ms
    from stark_anatomy_tpu.parallel.mesh import SHARD_AXIS
    from stark_anatomy_tpu.parallel.ntt_sharded import smap

    flags = ms._plane_flags(2048, 32, True, 11)
    body = smap(
        partial(ms._local_levels, flags=flags, msg_len=32, interp=True),
        mesh=mesh8,
        in_specs=(P(None, SHARD_AXIS), P(None, SHARD_AXIS)),
        out_specs=tuple(
            P(None, SHARD_AXIS) if f else P(SHARD_AXIS, None) for f in flags
        ),
    )
    args = [jax.ShapeDtypeStruct((8, 8 * 2048), jnp.uint32)] * 2
    jaxpr = str(jax.make_jaxpr(lambda a, b: body(a, b))(*args))
    assert "pallas_call" in jaxpr


def test_mesh_size_1_fallback():
    mesh1 = make_mesh(1)
    x = _random_codeword(64, seed=4)
    np.testing.assert_array_equal(
        np.asarray(sharded_ntt(x, mesh1)), np.asarray(nttmod.ntt(x))
    )


def test_sharded_ntt_large_domain(mesh8):
    # 2^16-scale case: the four-step index bookkeeping at production-like
    # n2/S ratios, not just the toy sizes above.
    n = 1 << 16
    x = _random_codeword(n, seed=5)
    want = np.asarray(nttmod.ntt(x))
    xs = jax.device_put(x, codeword_sharding(mesh8))
    got = np.asarray(sharded_ntt(xs, mesh8))
    np.testing.assert_array_equal(got, want)


def _cyclic_to_natural(arr, s):
    # stored index i1*(n/S) + j holds element i1 + S*j.
    n = arr.shape[-1]
    stored = arr.reshape(arr.shape[0], s, n // s)
    return np.transpose(stored, (0, 2, 1)).reshape(arr.shape[0], n)


def test_sharded_ntt_cyclic_output_layout(mesh8):
    # natural->cyclic is the 2-all-to-all fast path; its stored order must
    # be exactly the documented k1*(n/S) + k2 permutation of the natural
    # transform (same VALUES, relabeled slots).
    n = 1024
    x = _random_codeword(n, seed=8)
    want = np.asarray(nttmod.ntt(x))
    xs = jax.device_put(x, codeword_sharding(mesh8))
    got = np.asarray(sharded_ntt(xs, mesh8, layout_out=CYCLIC))
    np.testing.assert_array_equal(_cyclic_to_natural(got, 8), want)


def test_sharded_intt_cyclic_roundtrip(mesh8):
    # iNTT natural->cyclic then NTT cyclic->natural is the LDE chain's
    # inner pair: must reproduce the input bit-exactly (2+2 all-to-alls).
    n = 512
    x = _random_codeword(n, seed=9)
    xs = jax.device_put(x, codeword_sharding(mesh8))
    coeffs = sharded_ntt(xs, mesh8, inverse=True, layout_out=CYCLIC)
    back = np.asarray(sharded_ntt(coeffs, mesh8, layout_in=CYCLIC))
    np.testing.assert_array_equal(back, np.asarray(x))
    # and the cyclic coefficients themselves match single-device intt.
    want = np.asarray(nttmod.intt(x))
    np.testing.assert_array_equal(_cyclic_to_natural(np.asarray(coeffs), 8), want)


def test_sharded_lde_matches_single_device(mesh8):
    # Full 4-all-to-all LDE: interpolate 512 evals, evaluate on the
    # 2048-point coset — bytes equal the single-device chain.
    n, L = 512, 2048
    x = _random_codeword(n, seed=10)
    want = np.asarray(nttmod.coset_evaluate(nttmod.intt(x), L, GENERATOR))
    xs = jax.device_put(x, codeword_sharding(mesh8))
    got = np.asarray(sharded_lde(xs, L, GENERATOR, mesh8))
    np.testing.assert_array_equal(got, want)


def test_sharded_ntt_kernels_in_mesh_interpret(mesh8, monkeypatch):
    # VERDICT r3 item 1: the mesh body must dispatch the Pallas kernels.
    # Force the kernel path in interpret mode on the CPU mesh and pin
    # bit-exactness vs the jnp mesh path AND the single-device transform.
    # n2 = 2048 (= minimum kernel-path local size) with S = 8 -> n = 2^14.
    from stark_anatomy_tpu.parallel import ntt_sharded

    n = 1 << 14
    x = _random_codeword(n, seed=11)
    want = np.asarray(nttmod.ntt(x))
    xs = jax.device_put(x, codeword_sharding(mesh8))
    monkeypatch.setenv("STARK_ANATOMY_MESH_KERNELS", "interpret")
    assert ntt_sharded.kernel_mode() == (True, True)
    got = np.asarray(sharded_ntt(xs, mesh8))
    np.testing.assert_array_equal(got, want)
    # the 2-all-to-all cyclic pair under kernels too (row + grouped col).
    coeffs = sharded_ntt(xs, mesh8, inverse=True, layout_out=CYCLIC)
    back = np.asarray(sharded_ntt(coeffs, mesh8, layout_in=CYCLIC))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_sharded_ntt_traces_pallas_calls(mesh8, monkeypatch):
    # Structural pin for VERDICT r3 item 1: with kernels on, the traced
    # sharded transform must actually CONTAIN the Pallas kernel calls
    # (both the row transform and the grouped column transform), not jnp
    # stand-ins. make_jaxpr only traces — no TPU needed.
    from stark_anatomy_tpu.parallel import ntt_sharded

    monkeypatch.setenv("STARK_ANATOMY_MESH_KERNELS", "interpret")
    fn = ntt_sharded._build(
        mesh8, 1 << 14, False, ntt_sharded.NATURAL, ntt_sharded.CYCLIC
    )
    jaxpr = str(jax.make_jaxpr(fn)(jax.ShapeDtypeStruct((8, 1 << 14), jnp.uint32)))
    assert "pallas_call" in jaxpr
    monkeypatch.setenv("STARK_ANATOMY_MESH_KERNELS", "off")
    fn = ntt_sharded._build(
        mesh8, 1 << 14, False, ntt_sharded.NATURAL, ntt_sharded.CYCLIC
    )
    jaxpr = str(jax.make_jaxpr(fn)(jax.ShapeDtypeStruct((8, 1 << 14), jnp.uint32)))
    assert "pallas_call" not in jaxpr


def test_sharded_ntt_all_to_all_counts(mesh8):
    # VERDICT r3 item 4: the layout-typed transforms must spend exactly
    # TWO all-to-alls (the factorized-transform minimum); only the
    # natural->natural convenience form pays the third reorder exchange.
    from stark_anatomy_tpu.parallel import ntt_sharded

    def count_a2a(lin, lout):
        fn = ntt_sharded._build(mesh8, 1 << 12, False, lin, lout)
        jaxpr = str(jax.make_jaxpr(fn)(jax.ShapeDtypeStruct((8, 1 << 12), jnp.uint32)))
        return jaxpr.count("all_to_all")

    assert count_a2a(ntt_sharded.NATURAL, ntt_sharded.CYCLIC) == 2
    assert count_a2a(ntt_sharded.CYCLIC, ntt_sharded.NATURAL) == 2
    assert count_a2a(ntt_sharded.NATURAL, ntt_sharded.NATURAL) == 3


def test_sharded_ntt_rejects_indivisible_shards(mesh8):
    # n = 32 on 8 shards: S | n but S does not divide n/S = 4 — the
    # four-step factorization is undefined; must fail loudly, not wrap.
    x = _random_codeword(32, seed=6)
    with pytest.raises(ValueError, match="divide"):
        sharded_ntt(jax.device_put(x, codeword_sharding(mesh8)), mesh8)


def test_sharded_ntt_cache_keys_on_devices_not_mesh_id():
    # VERDICT r3 weak 8: keying the compiled-transform cache on id(mesh)
    # could alias a dead mesh's reused id onto a new, differently-shaped
    # mesh. The key must be the device tuple: two distinct Mesh objects
    # over the same devices share one entry; different device subsets
    # (whose transform has different collective wiring) get their own.
    from stark_anatomy_tpu.parallel import ntt_sharded

    x = _random_codeword(256, seed=7)
    want = np.asarray(nttmod.ntt(x))
    mesh_a = make_mesh(4)
    got_a = np.asarray(
        sharded_ntt(jax.device_put(x, codeword_sharding(mesh_a)), mesh_a)
    )
    np.testing.assert_array_equal(got_a, want)
    key_a = (
        tuple(mesh_a.devices.flat),
        256,
        False,
        ntt_sharded.NATURAL,
        ntt_sharded.NATURAL,
        ntt_sharded.kernel_mode(),
    )
    assert key_a in ntt_sharded._BUILT
    # A brand-new Mesh over the SAME devices reuses the compiled entry...
    mesh_b = make_mesh(4)
    size_before = len(ntt_sharded._BUILT)
    got_b = np.asarray(
        sharded_ntt(jax.device_put(x, codeword_sharding(mesh_b)), mesh_b)
    )
    np.testing.assert_array_equal(got_b, want)
    assert len(ntt_sharded._BUILT) == size_before
    # ...while a different device count builds (and keys) its own.
    mesh_c = make_mesh(2)
    got_c = np.asarray(
        sharded_ntt(jax.device_put(x, codeword_sharding(mesh_c)), mesh_c)
    )
    np.testing.assert_array_equal(got_c, want)
    assert (
        tuple(mesh_c.devices.flat),
        256,
        False,
        ntt_sharded.NATURAL,
        ntt_sharded.NATURAL,
        ntt_sharded.kernel_mode(),
    ) in ntt_sharded._BUILT


def test_distributed_init_single_process(monkeypatch):
    # Single-process: init() is a no-op returning False; the mesh path
    # needs no multi-controller service. Controller rank is 0.
    from stark_anatomy_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.init() is False
    assert distributed.process_index() == 0
    assert distributed.is_controller()


def test_distributed_init_requires_coordinator(monkeypatch):
    # Asking for a multi-process run without a coordinator address is a
    # configuration error, not a silent single-process fallback.
    from stark_anatomy_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    with pytest.raises(ValueError, match="coordinator"):
        distributed.init(num_processes=4)


def test_full_prove_on_mesh_bit_identical(mesh8):
    # The north-star integration: Stark.prove(mesh=...) runs trace-LDE,
    # quotients, combination, every FRI fold, and every Merkle commit
    # sharded — and the proof BYTES equal the single-device prover's.
    from stark_anatomy_tpu.iop.stark import Stark
    from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir

    rp = RescuePrime()
    air = RescuePrimeAir(rp, chain_length=1)
    trace = rp.trace(4242)
    boundary = air.boundary_constraints(rp.hash(4242))
    single = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    want = single.prove(trace, boundary, randomizer_seed=b"mesh")
    sharded = Stark(air, expansion_factor=4, num_colinearity_checks=2, mesh=mesh8)
    got = sharded.prove(trace, boundary, randomizer_seed=b"mesh")
    assert got == want
    assert single.verify(got, boundary)
