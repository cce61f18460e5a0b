"""Fibonacci AIR end-to-end: the STARK layer is AIR-generic."""

import pytest

from stark_anatomy_tpu.iop.stark import Stark
from stark_anatomy_tpu.models.fibonacci import FibonacciAir
from stark_anatomy_tpu.ops.field import PRIME


@pytest.fixture(scope="module")
def setup():
    air = FibonacciAir(num_steps=40)
    stark = Stark(air, expansion_factor=4, num_colinearity_checks=2)
    trace = air.trace()
    boundary = air.boundary_constraints(air.output())
    proof = stark.prove(trace, boundary)
    return air, stark, trace, boundary, proof


def test_trace_is_fibonacci(setup):
    air, *_ = setup
    tr = air.trace()
    assert tr[0][0] == 1 and tr[0][1] == 1
    for t in range(air.num_steps):
        assert tr[t + 1][0] == tr[t][1]
        assert tr[t + 1][1] == (tr[t][0] + tr[t][1]) % PRIME


def test_honest_proof_verifies(setup):
    _, stark, _, boundary, proof = setup
    assert stark.verify(proof, boundary)


def test_wrong_output_rejected(setup):
    air, stark, _, _, proof = setup
    bad = air.boundary_constraints((air.output() + 1) % PRIME)
    assert not stark.verify(proof, bad)


def test_wrong_trace_rejected(setup):
    air, stark, trace, boundary, _ = setup
    bad_trace = trace.copy()
    bad_trace[7][1] = (int(bad_trace[7][1]) + 1) % PRIME
    proof = stark.prove(bad_trace, boundary)
    assert not stark.verify(proof, boundary)


def test_linear_degree_accounting(setup):
    # For a degree-1 AIR the boundary quotients dominate max_degree.
    _, stark, *_ = setup
    o = stark.omicron_domain_length
    assert stark.max_degree == o - 2
    assert stark.transition_quotient_degree < o - 2
