"""Host-side exact arithmetic in F_p, p = 1 + 407 * 2^119.

This is the scalar *oracle* layer: verifier-side math, transcript sampling,
twiddle generation, and the ground truth every device kernel is tested
against. Python integers are exact, so this layer is trivially bit-exact
with the Rust reference:

- prime:               /root/reference/src/field/types/field.rs:15
- FieldElement API:    /root/reference/src/field/types/field.rs:30-114
  (new reduces mod p; pow; is_zero; value; + - * /; division by zero raises,
   mirroring the reference panic at field.rs:101-103)
- extended_euclidean:  /root/reference/src/field/utils.rs:3-18

Conformance vectors (all asserted in tests/test_field.py):
- 2^160 mod p                         (field.rs:140-151)
- (2^64-3)*(2^64-2) mod p             (field.rs:183-194)
- (2^64-3)/(2^64-2) mod p             (field.rs:197-208)
- extended_euclidean(p-2, p).s mod p  (utils.rs:54-67)

Beyond the reference (the reference has no PartialEq/Neg/inverse/generator —
see SURVEY.md section 2 row 2) we add the pieces the STARK stack needs:
equality, negation, inverse, random sampling, a verified multiplicative
generator, and primitive 2^k-th roots of unity.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

# p = 1 + 407 * 2^119 (reference: field.rs:13-15). 128-bit prime, 2-adicity 119.
PRIME: int = 270497897142230380135924736767050121217
assert PRIME == 1 + 407 * 2**119

#: Smallest primitive root of F_p (full multiplicative generator; order p-1 =
#: 2^119 * 11 * 37). Verified in tests via g^((p-1)/q) != 1 for q in {2,11,37}.
#: Note: Szepieniec's tutorial value 85408008396924667383611388730472331217 is
#: NOT a full generator (its order misses the factors 11 and 37) but does have
#: full 2-adic order; we standardize on 3 and verify orders explicitly.
GENERATOR: int = 3

#: Maximum power-of-two subgroup order available for NTT domains.
TWO_ADICITY: int = 119


def extended_euclidean(a: int, b: int) -> Tuple[int, int, int]:
    """Extended Euclid: returns (g, s, t) with s*a + t*b == g == gcd(a, b).

    Mirrors /root/reference/src/field/utils.rs:3-18 (same iteration, same
    sign conventions for s and t as the signed I320 version).
    """
    old_r, r = a, b
    old_s, s = 1, 0
    old_t, t = 0, 1
    while r != 0:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
        old_t, t = t, old_t - q * t
    return old_r, old_s, old_t


def finv(value: int) -> int:
    """Modular inverse in F_p via extended Euclid (raises on zero)."""
    if value % PRIME == 0:
        raise ZeroDivisionError("Cannot divide by zero")
    _, s, _ = extended_euclidean(value % PRIME, PRIME)
    return s % PRIME


def primitive_root_of_unity(n: int) -> int:
    """omega of exact multiplicative order n, n a power of two <= 2^119.

    omega = GENERATOR^((p-1)/n); exactness follows from GENERATOR having
    order p-1 (verified in tests).
    """
    if n & (n - 1) != 0 or n < 1:
        raise ValueError(f"n must be a power of two, got {n}")
    if n > (1 << TWO_ADICITY):
        raise ValueError(f"no subgroup of order {n}: 2-adicity is {TWO_ADICITY}")
    return pow(GENERATOR, (PRIME - 1) // n, PRIME)


class FieldElement:
    """Element of F_p with the reference's operator semantics.

    API parity with /root/reference/src/field/types/field.rs:29-114, plus
    ==, -x, inverse() and a few conveniences the reference lacks.
    """

    __slots__ = ("value",)

    def __init__(self, value: int):
        # `new` reduces mod p (reference field.rs:30-35).
        self.value = value % PRIME

    # -- reference API ----------------------------------------------------
    @staticmethod
    def new(value: int) -> "FieldElement":
        return FieldElement(value)

    def pow(self, exponent: "FieldElement | int") -> "FieldElement":
        e = exponent.value if isinstance(exponent, FieldElement) else exponent
        return FieldElement(pow(self.value, e, PRIME))

    def is_zero(self) -> bool:
        return self.value == 0

    def __add__(self, rhs: "FieldElement") -> "FieldElement":
        return FieldElement(self.value + rhs.value)

    def __sub__(self, rhs: "FieldElement") -> "FieldElement":
        return FieldElement(self.value - rhs.value)

    def __mul__(self, rhs: "FieldElement") -> "FieldElement":
        return FieldElement(self.value * rhs.value)

    def __truediv__(self, rhs: "FieldElement") -> "FieldElement":
        # Division-by-zero raises, mirroring the reference panic
        # (field.rs:101-103). Inverse via extended Euclid (field.rs:109-111).
        if rhs.is_zero():
            raise ZeroDivisionError("Cannot divide by zero")
        return FieldElement(self.value * finv(rhs.value))

    # -- extensions beyond the reference ----------------------------------
    def __neg__(self) -> "FieldElement":
        return FieldElement(-self.value)

    def inverse(self) -> "FieldElement":
        return FieldElement(finv(self.value))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, FieldElement) and self.value == other.value

    def __hash__(self) -> int:
        return hash(self.value)

    def __repr__(self) -> str:
        return f"FieldElement({self.value})"


ZERO = FieldElement(0)
ONE = FieldElement(1)


def host_ntt(values: list[int], inverse: bool = False) -> list[int]:
    """Exact radix-2 NTT/iNTT on host ints (verifier-side, small sizes).

    Natural-order coefficients <-> evaluations on <omega_n>. Used where the
    verifier must stay free of device dispatches: the FRI last-codeword
    low-degree check and periodic-column interpolation (iop/stark.py).
    O(n log n) Python-int work — microseconds at the <= 2^12 sizes involved.
    """
    n = len(values)
    if n & (n - 1):
        raise ValueError(f"NTT size must be a power of two, got {n}")
    if n == 1:
        return [values[0] % PRIME]
    w = primitive_root_of_unity(n)
    if inverse:
        w = finv(w)
    # Iterative DIT with bit-reversed input.
    bits = n.bit_length() - 1
    out = [0] * n
    for i, v in enumerate(values):
        out[int(bin(i)[2:].zfill(bits)[::-1], 2)] = v % PRIME
    m = 2
    while m <= n:
        wm = pow(w, n // m, PRIME)
        for start in range(0, n, m):
            t = 1
            for j in range(m // 2):
                a = out[start + j]
                b = out[start + j + m // 2] * t % PRIME
                out[start + j] = (a + b) % PRIME
                out[start + j + m // 2] = (a - b) % PRIME
                t = t * wm % PRIME
        m *= 2
    if inverse:
        ninv = finv(n)
        out = [v * ninv % PRIME for v in out]
    return out


def host_intt(values: list[int]) -> list[int]:
    """Evaluations on <omega_n> -> coefficients, exact host ints."""
    return host_ntt(values, inverse=True)


def host_poly_eval(coeffs: list[int], x: int) -> int:
    """Horner evaluation of a coefficient list (low-order first) at x."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % PRIME
    return acc


def sample_field_element(data: bytes) -> int:
    """Canonical challenge -> field element mapping.

    The reference leaves the challenge-to-field mapping undefined (its
    fiat_shamir returns raw SHA-256 bytes, proof_stream.rs:51-64); this is
    our framework's pinned definition: big-endian integer of
    SHA-256(data) reduced mod p. Deterministic and documented so proofs are
    reproducible across hosts and mesh shapes.
    """
    return int.from_bytes(hashlib.sha256(data).digest(), "big") % PRIME


def sample_indices(
    seed: bytes, size: int, reduced_size: int | None = None, number: int | None = None
) -> list[int]:
    """Sample `number` indices in [0, size), distinct modulo `reduced_size`.

    Counter-mode SHA-256 expansion; rejection-free reduction is fine here
    (size is a power of two well below 2^256, bias < 2^-128). FRI folds
    index i of a length-n codeword to i mod n/2 each round, so query
    indices must stay distinct after folding down to the LAST codeword —
    `reduced_size` is that last length (defaults to `size`: plain
    distinctness).
    """
    if number is None:
        raise TypeError("number of indices is required")
    if reduced_size is None:
        reduced_size = size
    if number > reduced_size:
        raise ValueError("cannot sample more distinct indices than the reduced size")
    indices: list[int] = []
    seen = set()
    counter = 0
    while len(indices) < number:
        digest = hashlib.sha256(seed + counter.to_bytes(8, "big")).digest()
        idx = int.from_bytes(digest, "big") % size
        counter += 1
        if idx % reduced_size not in seen:
            seen.add(idx % reduced_size)
            indices.append(idx)
    return indices
