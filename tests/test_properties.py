"""Property-based tests (hypothesis) — the suite SURVEY.md §4 commits to.

Randomizes STRUCTURE where the pinned-vector suites test fixed points:

- field laws on random u128 pairs, cross-checked host oracle
  (ops/field.py) vs jnp limb kernels (ops/field_jnp.py) vs the native
  C++ batch library (native/field128.cpp via stark_anatomy_tpu.native);
- Merkle multiproof soundness under arbitrary node-list mutations
  (beyond the three hand-built mutations in tests/test_merkle.py);
- transcript item decoder fuzz: every accepted item must round-trip to
  the exact same bytes (canonical-encoding law), every perturbation
  must raise — never accept-and-reinterpret.

Settings: derandomized (CI must be reproducible — a flaky property run
would gate merges on luck), no deadline (first jit of a kernel shape can
take seconds on XLA:CPU; shapes are held FIXED below so each kernel
compiles once per session).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from stark_anatomy_tpu.ops.field import (
    PRIME,
    FieldElement,
    extended_euclidean,
    finv,
    sample_indices,
)

SETTINGS = dict(derandomize=True, deadline=None, max_examples=50)

felts = st.integers(min_value=0, max_value=PRIME - 1)
u128s = st.integers(min_value=0, max_value=(1 << 128) - 1)
#: fixed batch width so the jnp kernels compile exactly one shape
BATCH = 8
felt_batches = st.lists(felts, min_size=BATCH, max_size=BATCH)


# -- field laws: host oracle ------------------------------------------------


@settings(**SETTINGS)
@given(a=u128s, b=u128s, c=u128s)
def test_field_ring_laws_host(a: int, b: int, c: int):
    """Commutativity, associativity, distributivity on raw u128 inputs
    (FieldElement.new reduces mod p, field.rs:30-35)."""
    fa, fb, fc = FieldElement(a), FieldElement(b), FieldElement(c)
    assert fa + fb == fb + fa
    assert fa * fb == fb * fa
    assert (fa + fb) + fc == fa + (fb + fc)
    assert (fa * fb) * fc == fa * (fb * fc)
    assert fa * (fb + fc) == fa * fb + fa * fc
    assert fa - fa == FieldElement(0)
    assert fa + (-fa) == FieldElement(0)


@settings(**SETTINGS)
@given(a=felts)
def test_field_inverse_law_host(a: int):
    """a / a == 1 for a != 0; division by zero raises (field.rs:101-103)."""
    fa = FieldElement(a)
    if a % PRIME == 0:
        with pytest.raises(ZeroDivisionError):
            _ = FieldElement(1) / fa
    else:
        assert fa / fa == FieldElement(1)
        assert fa.inverse() * fa == FieldElement(1)
        assert FieldElement(finv(a)) == fa.inverse()


@settings(**SETTINGS)
@given(a=st.integers(min_value=1, max_value=(1 << 128) - 1), b=st.integers(min_value=1, max_value=(1 << 128) - 1))
def test_extended_euclidean_bezout(a: int, b: int):
    """s*a + t*b == g == gcd(a, b) (utils.rs:3-18 contract)."""
    import math

    g, s, t = extended_euclidean(a, b)
    assert g == math.gcd(a, b)
    assert s * a + t * b == g


# -- field laws: host vs jnp vs native, random batches ----------------------


@settings(**SETTINGS)
@given(a=felt_batches, b=felt_batches)
def test_field_host_vs_jnp_batch(a, b):
    from stark_anatomy_tpu.ops import field_jnp as fj
    from stark_anatomy_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

    import jax.numpy as jnp

    la = jnp.asarray(ints_to_limbs(a))
    lb = jnp.asarray(ints_to_limbs(b))
    assert list(limbs_to_ints(np.asarray(fj.add(la, lb)))) == [
        (x + y) % PRIME for x, y in zip(a, b)
    ]
    assert list(limbs_to_ints(np.asarray(fj.sub(la, lb)))) == [
        (x - y) % PRIME for x, y in zip(a, b)
    ]
    assert list(limbs_to_ints(np.asarray(fj.mul(la, lb)))) == [
        (x * y) % PRIME for x, y in zip(a, b)
    ]
    # Fermat inverse (0 -> 0 convention documented on fj.inv).
    assert list(limbs_to_ints(np.asarray(fj.inv(la, a_is_mont=False)))) == [
        finv(x) if x else 0 for x in a
    ]


@settings(**SETTINGS)
@given(a=felt_batches, b=felt_batches)
def test_field_host_vs_native_batch(a, b):
    from stark_anatomy_tpu import native

    assert native.add_batch(a, b) == [(x + y) % PRIME for x, y in zip(a, b)]
    assert native.sub_batch(a, b) == [(x - y) % PRIME for x, y in zip(a, b)]
    assert native.mul_batch(a, b) == [(x * y) % PRIME for x, y in zip(a, b)]
    nz = [x if x else 1 for x in a]  # inv_batch contract: nonzero inputs
    assert native.inv_batch(nz) == [finv(x) for x in nz]


# -- Merkle multiproof soundness under random mutations ---------------------


def _tree_and_proof(leaf_seed: int, indices):
    from stark_anatomy_tpu.iop.merkle import MerkleTree

    leaves = [
        hashlib.blake2b(bytes([leaf_seed & 0xFF]) + i.to_bytes(4, "big"), digest_size=64).digest()
        for i in range(64)
    ]
    tree = MerkleTree.commit_bytes(leaves, device=False)
    nodes = tree.open_multi(indices)
    leaf_map = {i: leaves[i] for i in indices}
    return tree, nodes, leaf_map


@settings(**SETTINGS)
@given(
    indices=st.sets(st.integers(min_value=0, max_value=63), min_size=1, max_size=8),
    seed=st.integers(min_value=0, max_value=255),
)
def test_multiproof_accepts_honest(indices, seed):
    from stark_anatomy_tpu.iop.merkle import verify_multiproof

    tree, nodes, leaf_map = _tree_and_proof(seed, sorted(indices))
    assert verify_multiproof(tree.root, leaf_map, nodes, 6)


@settings(**SETTINGS)
@given(
    indices=st.sets(st.integers(min_value=0, max_value=63), min_size=1, max_size=8),
    data=st.data(),
)
def test_multiproof_rejects_any_node_list_mutation(indices, data):
    """ANY change to the supplied node list must fail verification:
    dropped, duplicated, reordered, extra, or bit-flipped nodes."""
    from stark_anatomy_tpu.iop.merkle import verify_multiproof

    tree, nodes, leaf_map = _tree_and_proof(7, sorted(indices))
    kind = data.draw(
        st.sampled_from(["drop", "dup", "swap", "flip", "extra", "rotate"]),
        label="mutation",
    )
    mutated = list(nodes)
    if kind == "drop" and mutated:
        mutated.pop(data.draw(st.integers(0, len(mutated) - 1), label="pos"))
    elif kind == "dup" and mutated:
        pos = data.draw(st.integers(0, len(mutated) - 1), label="pos")
        mutated.insert(pos, mutated[pos])
    elif kind == "swap" and len(mutated) >= 2:
        i = data.draw(st.integers(0, len(mutated) - 2), label="pos")
        mutated[i], mutated[i + 1] = mutated[i + 1], mutated[i]
    elif kind == "flip" and mutated:
        pos = data.draw(st.integers(0, len(mutated) - 1), label="pos")
        byte = data.draw(st.integers(0, 63), label="byte")
        d = bytearray(mutated[pos])
        d[byte] ^= 1 + data.draw(st.integers(0, 254), label="xor")
        mutated[pos] = bytes(d)
    elif kind == "extra":
        mutated.append(hashlib.blake2b(b"extra", digest_size=64).digest())
    elif kind == "rotate" and len(mutated) >= 2:
        mutated = mutated[1:] + mutated[:1]
    if mutated == nodes:
        return  # mutation was a no-op (e.g. swap of equal digests)
    assert not verify_multiproof(tree.root, leaf_map, mutated, 6)


@settings(**SETTINGS)
@given(
    indices=st.sets(st.integers(min_value=0, max_value=63), min_size=1, max_size=8),
    wrong=st.integers(min_value=0, max_value=63),
)
def test_multiproof_rejects_wrong_leaf_value(indices, wrong):
    from stark_anatomy_tpu.iop.merkle import verify_multiproof

    tree, nodes, leaf_map = _tree_and_proof(7, sorted(indices))
    target = sorted(indices)[wrong % len(indices)]
    leaf_map = dict(leaf_map)
    leaf_map[target] = hashlib.blake2b(b"forged", digest_size=64).digest()
    assert not verify_multiproof(tree.root, leaf_map, nodes, 6)


# -- transcript item decoder fuzz -------------------------------------------

# JSON-safe printable perturbation alphabet: digits plus every character
# an attacker could slip into a decimal/hex item without breaking JSON.
_FUZZ_ALPHABET = "0123456789abcdefABCDEF+-_ .xXoe"


@settings(**SETTINGS)
@given(item=st.text(alphabet=_FUZZ_ALPHABET, min_size=0, max_size=60))
def test_item_to_felt_canonical_or_raise(item: str):
    """Decoder law: accepted => byte-exact round trip; else ValueError."""
    from stark_anatomy_tpu.utils.encoding import felt_to_item, item_to_felt

    try:
        value = item_to_felt(item)
    except ValueError:
        return
    assert 0 <= value < PRIME
    assert felt_to_item(value) == item  # one value, one encoding


@settings(**SETTINGS)
@given(value=felts, prefix=st.sampled_from(["+", " ", "0", "00", "-"]))
def test_item_to_felt_rejects_noncanonical_reencodings(value: int, prefix: str):
    from stark_anatomy_tpu.utils.encoding import item_to_felt

    item = prefix + str(value)
    if item == str(value):  # e.g. "0" + "" cases can't occur; guard anyway
        return
    with pytest.raises(ValueError):
        item_to_felt(item)


_B64_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/="
)


@settings(**SETTINGS)
@given(item=st.text(alphabet=_B64_ALPHABET, min_size=0, max_size=96))
def test_item_to_digest_canonical_or_raise(item: str):
    from stark_anatomy_tpu.utils.encoding import digest_to_item, item_to_digest

    try:
        digest = item_to_digest(item)
    except ValueError:
        return
    assert len(digest) == 64
    assert digest_to_item(digest) == item


@settings(**SETTINGS)
@given(data=st.binary(min_size=64, max_size=64), pos=st.integers(0, 87))
def test_item_to_digest_perturbed_encodings(data: bytes, pos: int):
    """Perturbing any character of a VALID digest item either raises or
    decodes to a digest whose canonical re-encoding is the perturbed
    string itself (impossible for pad positions, possible only for a
    same-length alphabet swap that changes the digest — never a second
    encoding of the SAME digest)."""
    import base64

    from stark_anatomy_tpu.utils.encoding import digest_to_item, item_to_digest

    item = base64.b64encode(data).decode()
    swap = "B" if item[pos] != "B" else "C"
    mutated = item[:pos] + swap + item[pos + 1 :]
    if mutated == item:
        return
    try:
        decoded = item_to_digest(mutated)
    except ValueError:
        return
    assert decoded != data  # accepted => genuinely different digest
    assert digest_to_item(decoded) == mutated


@settings(**SETTINGS)
@given(data=st.binary(min_size=0, max_size=140))
def test_item_to_nonce_canonical_or_raise(data: bytes):
    from stark_anatomy_tpu.utils.encoding import item_to_nonce, nonce_to_item

    item = data.decode("latin-1")
    try:
        nonce = item_to_nonce(item)
    except ValueError:
        return
    assert 0 <= nonce < (1 << 64)
    assert nonce_to_item(nonce) == item


@settings(**SETTINGS)
@given(value=felts)
def test_felt_bytes_roundtrip(value: int):
    from stark_anatomy_tpu.utils.encoding import bytes_to_felt, felt_to_bytes

    assert bytes_to_felt(felt_to_bytes(value)) == value


@settings(**SETTINGS)
@given(extra=st.integers(min_value=0, max_value=(1 << 128) - 1 - PRIME))
def test_bytes_to_felt_rejects_noncanonical(extra: int):
    """Any 16-byte encoding of value >= p must be rejected, not reduced."""
    from stark_anatomy_tpu.utils.encoding import bytes_to_felt

    data = (PRIME + extra).to_bytes(16, "little")
    with pytest.raises(ValueError):
        bytes_to_felt(data)


# -- transcript index sampling ----------------------------------------------


@settings(**SETTINGS)
@given(
    seed=st.binary(min_size=0, max_size=32),
    size_log=st.integers(min_value=3, max_value=12),
    data=st.data(),
)
def test_sample_indices_distinct_and_in_range(seed, size_log, data):
    size = 1 << size_log
    red_log = data.draw(st.integers(2, size_log), label="reduced_log")
    reduced = 1 << red_log
    number = data.draw(st.integers(1, min(reduced, 16)), label="number")
    idx = sample_indices(seed, size, reduced, number)
    assert len(idx) == number
    assert all(0 <= i < size for i in idx)
    assert len({i % reduced for i in idx}) == number  # distinct after folding
