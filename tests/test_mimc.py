"""MiMC AIR end-to-end: third model family through the generic STARK."""

import pytest

from stark_anatomy_tpu.iop.stark import Stark
from stark_anatomy_tpu.models.mimc import PERIOD, MiMCAir, mimc, round_constants
from stark_anatomy_tpu.ops.field import PRIME


@pytest.fixture(scope="module")
def setup():
    air = MiMCAir(num_steps=60)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    trace = air.trace(31337)
    boundary = air.boundary_constraints(mimc(31337, air.num_steps))
    proof = stark.prove(trace, boundary, randomizer_seed=b"mimc-test")
    return air, stark, trace, boundary, proof


def test_trace_matches_host_chain(setup):
    air, *_ = setup
    tr = air.trace(31337)
    cs = round_constants()
    assert tr[0][0] == 31337
    for t in range(air.num_steps):
        assert tr[t + 1][0] == pow((int(tr[t][0]) + cs[t % PERIOD]) % PRIME, 3, PRIME)
    assert int(tr[-1][0]) == mimc(31337, air.num_steps)


def test_round_constants_shape(setup):
    cs = round_constants()
    assert len(cs) == PERIOD and cs[0] == 0
    assert all(0 <= c < PRIME for c in cs)
    assert len(set(cs)) == PERIOD  # no accidental collisions


def test_honest_proof_verifies(setup):
    _, stark, _, boundary, proof = setup
    assert stark.verify(proof, boundary)


def test_wrong_output_rejected(setup):
    air, stark, _, _, proof = setup
    bad = air.boundary_constraints((mimc(31337, air.num_steps) + 1) % PRIME)
    assert not stark.verify(proof, bad)


def test_wrong_trace_rejected(setup):
    air, stark, trace, boundary, _ = setup
    bad_trace = trace.copy()
    bad_trace[5][0] = (int(bad_trace[5][0]) + 1) % PRIME
    proof = stark.prove(bad_trace, boundary, randomizer_seed=b"mimc-test")
    assert not stark.verify(proof, boundary)


def test_input_is_not_public(setup):
    # Only the output row is a boundary constraint: a verifier never
    # learns row 0 from the statement (the preimage stays witness-only).
    air, *_ = setup
    boundary = air.boundary_constraints(12345)
    assert all(cycle == air.cycle_count - 1 for (cycle, _, _) in boundary)


def test_proof_of_different_preimage_same_shape(setup):
    # Same AIR shape, different witness/statement: fresh prove+verify.
    air, stark, *_ = setup
    out = mimc(99, air.num_steps)
    proof = stark.prove(
        air.trace(99), air.boundary_constraints(out), randomizer_seed=b"p2"
    )
    assert stark.verify(proof, air.boundary_constraints(out))
    assert not stark.verify(proof, air.boundary_constraints((out + 1) % PRIME))
