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
    sharded_coset_evaluate,
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
    key_a = (tuple(mesh_a.devices.flat), 256, False)
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
    assert (tuple(mesh_c.devices.flat), 256, False) in ntt_sharded._BUILT


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
