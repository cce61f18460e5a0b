"""Host field oracle: bit-exact conformance with the Rust reference.

Vectors from /root/reference/src/field/types/field.rs and
/root/reference/src/field/utils.rs (re-verified independently in SURVEY.md).
"""

import pytest

from stark_anatomy_tpu.ops.field import (
    GENERATOR,
    ONE,
    PRIME,
    TWO_ADICITY,
    ZERO,
    FieldElement,
    extended_euclidean,
    finv,
    primitive_root_of_unity,
    sample_field_element,
    sample_indices,
)


def test_prime_structure():
    assert PRIME == 1 + 407 * 2**119
    t, k = PRIME - 1, 0
    while t % 2 == 0:
        t //= 2
        k += 1
    assert k == TWO_ADICITY == 119
    assert t == 407 == 11 * 37


def test_pow_vector():
    # field.rs:139-151
    assert FieldElement(2).pow(FieldElement(160)).value == (
        242584109230747146804944788495759879579
    )


def test_add_vector():
    # field.rs:153-166
    assert (FieldElement(PRIME - 10) + FieldElement(12)).value == 2


def test_sub_vector():
    # field.rs:168-180
    assert (ZERO - FieldElement(12)).value == PRIME - 12


def test_mul_vector():
    # field.rs:182-194
    a = FieldElement(2**64 - 3)
    b = FieldElement(2**64 - 2)
    assert (a * b).value == 69784469778708083235216150296170332165


def test_div_vector():
    # field.rs:196-208
    a = FieldElement(2**64 - 3)
    b = FieldElement(2**64 - 2)
    assert (a / b).value == 263166645724356846472197722797662682189


@pytest.mark.parametrize("k", range(1, 12))
def test_inv_minus_family(k):
    # field.rs:120-137, 210-220: (1/(p-k)) * (p-k) == 1 for k = 1..11
    a = FieldElement(1)
    b = FieldElement(PRIME - k)
    assert ((a / b) * b).value == 1


def test_extended_euclidean_vector():
    # utils.rs:54-67: gcd(p-2, p) -> (1, s, t) with the exact signed values
    g, s, t = extended_euclidean(PRIME - 2, PRIME)
    assert g == 1
    assert s == 135248948571115190067962368383525060608
    assert t == -135248948571115190067962368383525060607
    assert s * (PRIME - 2) + t * PRIME == g


def test_extended_euclidean_small():
    # utils.rs:24-37: gcd(240, 46) -> (2, -9, 47)
    assert extended_euclidean(240, 46) == (2, -9, 47)
    # utils.rs:39-52: gcd(6543211245, 123456785) -> (5, 6850346, -363068429)
    assert extended_euclidean(6543211245, 123456785) == (5, 6850346, -363068429)


def test_div_by_zero_raises():
    # mirrors the reference panic at field.rs:101-103
    with pytest.raises(ZeroDivisionError):
        _ = ONE / ZERO
    with pytest.raises(ZeroDivisionError):
        finv(0)


def test_p_minus_one_squared():
    # base.rs:354-386: (p-1)^2 mod p == 1
    assert (FieldElement(PRIME - 1) * FieldElement(PRIME - 1)).value == 1


def test_generator_is_primitive():
    for q in (2, 11, 37):
        assert pow(GENERATOR, (PRIME - 1) // q, PRIME) != 1
    assert pow(GENERATOR, PRIME - 1, PRIME) == 1


@pytest.mark.parametrize("n", [1, 2, 4, 256, 1 << 16])
def test_primitive_root_of_unity(n):
    w = primitive_root_of_unity(n)
    assert pow(w, n, PRIME) == 1
    if n > 1:
        assert pow(w, n // 2, PRIME) != 1


def test_field_laws_random():
    import random

    rng = random.Random(0xA11CE)
    for _ in range(200):
        a = FieldElement(rng.randrange(PRIME))
        b = FieldElement(rng.randrange(PRIME))
        c = FieldElement(rng.randrange(PRIME))
        assert (a + b) == (b + a)
        assert (a * b) == (b * a)
        assert a * (b + c) == a * b + a * c
        assert (a - b) + b == a
        if not b.is_zero():
            assert (a / b) * b == a
        assert -(-a) == a
        assert a + (-a) == ZERO


def test_sampling_deterministic():
    x = sample_field_element(b"seed")
    assert 0 <= x < PRIME
    assert x == sample_field_element(b"seed")
    idx = sample_indices(b"seed", 1 << 10, number=32)
    assert len(set(idx)) == 32
    assert all(0 <= i < 1 << 10 for i in idx)
    assert idx == sample_indices(b"seed", 1 << 10, number=32)
