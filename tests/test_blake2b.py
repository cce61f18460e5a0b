"""Device Blake2b-512 vs Python hashlib (the bit-exactness anchor).

The reference uses the `blake2` crate's unkeyed Blake2b-512 for all Merkle
hashing (/root/reference/src/iop/types/merkle.rs:1,47-55); hashlib.blake2b
(digest_size=64) is the same function (RFC 7693), so matching hashlib
bit-for-bit is matching the reference.
"""

import hashlib

import numpy as np
import pytest

from stark_anatomy_tpu.ops.blake2b import (
    blake2b_u32,
    bytes_to_digest_words,
    digests_to_bytes,
    merkle_node_hash,
    pack_bytes_to_u32,
)


def _oracle(msgs: list[bytes]) -> list[bytes]:
    return [hashlib.blake2b(m, digest_size=64).digest() for m in msgs]


def _device(msgs: list[bytes]) -> list[bytes]:
    length = len(msgs[0])
    data = np.stack([np.frombuffer(m, dtype=np.uint8) for m in msgs])
    words = pack_bytes_to_u32(data)
    return digests_to_bytes(np.asarray(blake2b_u32(words, msg_len=length)))


def test_rfc7693_abc_vector():
    # RFC 7693 appendix A: BLAKE2b-512("abc").
    expected = bytes.fromhex(
        "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1"
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"
    )
    assert _device([b"abc"])[0] == expected
    assert _oracle([b"abc"])[0] == expected


@pytest.mark.parametrize("length", [1, 4, 16, 63, 64, 65, 127, 128, 129, 256, 384])
def test_random_messages_match_hashlib(length):
    rng = np.random.default_rng(length)
    msgs = [rng.integers(0, 256, size=length, dtype=np.uint8).tobytes() for _ in range(17)]
    assert _device(msgs) == _oracle(msgs)


def test_node_hash_matches_hashlib_concat():
    rng = np.random.default_rng(7)
    left = [rng.integers(0, 256, size=64, dtype=np.uint8).tobytes() for _ in range(33)]
    right = [rng.integers(0, 256, size=64, dtype=np.uint8).tobytes() for _ in range(33)]
    lw = np.stack([bytes_to_digest_words(x) for x in left])
    rw = np.stack([bytes_to_digest_words(x) for x in right])
    got = digests_to_bytes(np.asarray(merkle_node_hash(lw, rw)))
    want = _oracle([l + r for l, r in zip(left, right)])
    assert got == want
