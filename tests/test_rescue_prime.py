"""Rescue-Prime instance: algebraic sanity + AIR constraint satisfaction."""

import numpy as np
import pytest

from stark_anatomy_tpu.models.rescue_prime import RescuePrime, RescuePrimeAir
from stark_anatomy_tpu.ops.field import PRIME, finv


@pytest.fixture(scope="module")
def rp():
    return RescuePrime()


def test_parameters(rp):
    assert rp.alpha * rp.alpha_inv % (PRIME - 1) == 1
    # MDS: all entries and the determinant nonzero (2x2 MDS criterion).
    m = rp.mds
    det = (m[0][0] * m[1][1] - m[0][1] * m[1][0]) % PRIME
    assert det != 0
    for row in m:
        for x in row:
            assert x % PRIME != 0
    # MDS inverse really is the inverse.
    mi = rp.mds_inv
    for i in range(2):
        for j in range(2):
            acc = sum(m[i][k] * mi[k][j] for k in range(2)) % PRIME
            assert acc == (1 if i == j else 0)
    assert len(rp.round_constants) == 2 * rp.m * rp.N
    assert len(set(rp.round_constants)) == len(rp.round_constants)


def test_hash_deterministic_and_spread(rp):
    a, b = rp.hash(1), rp.hash(2)
    assert a == rp.hash(1)
    assert a != b
    assert 0 <= a < PRIME


def test_trace_consistent_with_hash(rp):
    tr = rp.trace(5)
    assert tr.shape == (rp.rows_per_perm + 1, rp.m)
    assert tr[0][0] == 5 and tr[0][1] == 0
    assert tr[-1][0] == rp.hash(5)
    # rows N..rows_per_perm are copy rows (power-of-two padding)
    for t in range(rp.N, rp.rows_per_perm):
        assert list(tr[t]) == list(tr[rp.N])
    # chain of 3
    tr3 = rp.trace(5, chain_length=3)
    assert tr3.shape == (3 * rp.rows_per_perm + 1, rp.m)
    assert tr3[-1][0] == rp.chain_output(5, 3)


def test_air_constraints_hold_on_honest_trace(rp):
    air = RescuePrimeAir(rp, chain_length=2)
    tr = rp.trace(7, chain_length=2)
    t_len = air.cycle_count
    cols = air.constant_columns(t_len)
    for t in range(t_len - 1):
        consts = [cols[k][t] for k in range(2 * rp.m + 1)]
        cons = air.eval_transition_host(list(tr[t]), list(tr[t + 1]), consts)
        assert all(c == 0 for c in cons), f"row {t}: {cons}"


def test_air_constraints_catch_bad_transition(rp):
    air = RescuePrimeAir(rp, chain_length=1)
    tr = rp.trace(7)
    cols = air.constant_columns(air.cycle_count)
    consts = [cols[k][3] for k in range(2 * rp.m + 1)]
    bad_next = [(int(v) + 1) % PRIME for v in tr[4]]
    cons = air.eval_transition_host(list(tr[3]), bad_next, consts)
    assert any(c != 0 for c in cons)
    # ... and on a copy row (selector = 0): the copy constraint must fire.
    t_copy = rp.N  # first padding transition
    consts_c = [cols[k][t_copy] for k in range(2 * rp.m + 1)]
    assert consts_c[2 * rp.m] == 0
    bad_next_c = [(int(v) + 1) % PRIME for v in tr[t_copy + 1]]
    cons_c = air.eval_transition_host(list(tr[t_copy]), bad_next_c, consts_c)
    assert any(c != 0 for c in cons_c)


def test_device_constraints_match_host(rp):
    import jax.numpy as jnp

    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

    air = RescuePrimeAir(rp, chain_length=1)
    tr = rp.trace(9)
    t_len = air.cycle_count
    cols = air.constant_columns(t_len)
    n = t_len - 1  # evaluate all transitions at once on device
    cur = [
        fj.to_mont(jnp.asarray(ints_to_limbs([int(tr[t][j]) for t in range(n)])))
        for j in range(rp.m)
    ]
    nxt = [
        fj.to_mont(jnp.asarray(ints_to_limbs([int(tr[t + 1][j]) for t in range(n)])))
        for j in range(rp.m)
    ]
    consts = [
        fj.to_mont(jnp.asarray(ints_to_limbs([cols[k][t] for t in range(n)])))
        for k in range(2 * rp.m + 1)
    ]
    dev = air.eval_transition_device(cur, nxt, consts)
    for k in range(rp.m):
        vals = limbs_to_ints(np.asarray(fj.from_mont(dev[k])))
        assert all(int(v) == 0 for v in vals)
    # and host cross-check on a non-satisfying random input
    rng = np.random.default_rng(0)
    rnd_cur = [int(x) for x in rng.integers(1, 1 << 62, size=rp.m)]
    rnd_nxt = [int(x) for x in rng.integers(1, 1 << 62, size=rp.m)]
    rnd_c = [int(x) for x in rng.integers(1, 1 << 62, size=2 * rp.m + 1)]
    host = air.eval_transition_host(rnd_cur, rnd_nxt, rnd_c)
    curd = [fj.to_mont(jnp.asarray(ints_to_limbs([v]))) for v in rnd_cur]
    nxtd = [fj.to_mont(jnp.asarray(ints_to_limbs([v]))) for v in rnd_nxt]
    cd = [fj.to_mont(jnp.asarray(ints_to_limbs([v]))) for v in rnd_c]
    devd = air.eval_transition_device(curd, nxtd, cd)
    for k in range(rp.m):
        assert int(limbs_to_ints(np.asarray(fj.from_mont(devd[k])))[0]) == host[k]
