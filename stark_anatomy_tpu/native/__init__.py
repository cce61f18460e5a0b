"""ctypes bindings for the native host field library (native/field128.cpp).

The shared library is built on first use with the system g++ (the image
ships no pybind11; plain C ABI + ctypes keeps the binding dependency-free).
Every entry point has a pure-Python fallback with identical semantics, so
the package works without a compiler; `AVAILABLE` reports which path is
active. Correctness is pinned against the host oracle in
tests/test_native.py.

Batch values cross the boundary as numpy (n, 16) uint8 arrays of 16-byte
little-endian field elements — the framework's canonical encoding
(utils/encoding.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from stark_anatomy_tpu.ops.field import PRIME

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "field128.cpp")
_LIB = os.path.join(_REPO, "native", "libfield128.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name, extra in [
        ("felt_add_batch", [u8p, u8p, u8p, ctypes.c_size_t]),
        ("felt_sub_batch", [u8p, u8p, u8p, ctypes.c_size_t]),
        ("felt_mul_batch", [u8p, u8p, u8p, ctypes.c_size_t]),
        ("felt_pow_batch", [u8p, u8p, u8p, ctypes.c_size_t]),
        ("felt_inv_batch", [u8p, u8p, ctypes.c_size_t]),
        ("felt_powers", [u8p, u8p, ctypes.c_size_t]),
        (
            "rescue_chain_trace",
            [u8p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, u8p, u8p, u8p, u8p],
        ),
        ("fri_fold", [u8p, ctypes.c_uint64, u8p, u8p, u8p, u8p]),
        (
            "rescue_chain_output",
            [u8p, ctypes.c_uint64, ctypes.c_uint64, u8p, u8p, u8p, u8p],
        ),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = extra
        fn.restype = None
    _lib = lib
    return lib


AVAILABLE = _load() is not None


def _enc(values: List[int]) -> np.ndarray:
    out = np.empty((len(values), 16), dtype=np.uint8)
    for i, v in enumerate(values):
        out[i] = np.frombuffer((v % PRIME).to_bytes(16, "little"), dtype=np.uint8)
    return out


def _dec(buf: np.ndarray) -> List[int]:
    return [int.from_bytes(row.tobytes(), "little") for row in buf]


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _binary(name: str, a: List[int], b: List[int], py) -> List[int]:
    lib = _load()
    if lib is None:
        return [py(x, y) for x, y in zip(a, b)]
    ea, eb = _enc(a), _enc(b)
    out = np.empty_like(ea)
    getattr(lib, name)(_ptr(ea), _ptr(eb), _ptr(out), len(a))
    return _dec(out)


def add_batch(a: List[int], b: List[int]) -> List[int]:
    return _binary("felt_add_batch", a, b, lambda x, y: (x + y) % PRIME)


def sub_batch(a: List[int], b: List[int]) -> List[int]:
    return _binary("felt_sub_batch", a, b, lambda x, y: (x - y) % PRIME)


def mul_batch(a: List[int], b: List[int]) -> List[int]:
    return _binary("felt_mul_batch", a, b, lambda x, y: (x * y) % PRIME)


def pow_batch(base: List[int], exponent: int) -> List[int]:
    lib = _load()
    if lib is None:
        return [pow(x % PRIME, exponent, PRIME) for x in base]
    eb = _enc(base)
    ee = _enc([exponent % (1 << 128)])  # exponent < 2^128 by contract
    out = np.empty_like(eb)
    lib.felt_pow_batch(_ptr(eb), _ptr(ee), _ptr(out), len(base))
    return _dec(out)


def inv_batch(a: List[int]) -> List[int]:
    lib = _load()
    if lib is None:
        return [pow(x % PRIME, PRIME - 2, PRIME) for x in a]
    ea = _enc(a)
    out = np.empty_like(ea)
    lib.felt_inv_batch(_ptr(ea), _ptr(out), len(a))
    return _dec(out)


def powers(base: int, count: int) -> List[int]:
    lib = _load()
    if lib is None:
        out, cur = [], 1
        for _ in range(count):
            out.append(cur)
            cur = cur * base % PRIME
        return out
    eb = _enc([base])
    out = np.empty((count, 16), dtype=np.uint8)
    lib.felt_powers(_ptr(eb), _ptr(out), count)
    return _dec(out)


def fri_fold_values(
    values: List[int], alpha: int, offset_inv: int, omega_inv: int
) -> List[int]:
    """One FRI fold round on host values (iop/fri.py _host_tail):
    out[i] = 2^-1 * ((1+a_i)*v[i] + (1-a_i)*v[i+n/2]),
    a_i = alpha * offset_inv * omega_inv^i. Native C when available
    (~10x the pure-Python big-int loop); identical mod-p values."""
    n = len(values)
    half = n // 2
    lib = _load()
    if lib is None:
        inv2 = pow(2, PRIME - 2, PRIME)
        out, d_inv = [], offset_inv % PRIME
        for i in range(half):
            au = alpha * d_inv % PRIME
            out.append(
                inv2 * ((1 + au) * values[i] + (1 - au) * values[i + half]) % PRIME
            )
            d_inv = d_inv * omega_inv % PRIME
        return out
    ev = _enc(values)
    ea, eo, ew = _enc([alpha]), _enc([offset_inv]), _enc([omega_inv])
    out = np.empty((half, 16), dtype=np.uint8)
    lib.fri_fold(_ptr(ev), n, _ptr(ea), _ptr(eo), _ptr(ew), _ptr(out))
    return _dec(out)


def rescue_chain_output(rp, input_element: int, chain_length: int) -> List[int]:
    """Final Rescue-Prime chain state (the public boundary value) without
    materializing trace rows; falls back to the Python chain."""
    lib = _load()
    if lib is None or rp.m != 2:
        return None
    mds = _enc([rp.mds[i][j] for i in range(2) for j in range(2)])
    consts = _enc(rp.round_constants)
    ainv = _enc([rp.alpha_inv])
    inp = _enc([input_element])
    out = np.empty((2, 16), dtype=np.uint8)
    lib.rescue_chain_output(
        _ptr(inp), chain_length, rp.N, _ptr(mds), _ptr(consts), _ptr(ainv), _ptr(out)
    )
    return _dec(out)


def rescue_chain_trace_bytes(rp, input_element: int, chain_length: int) -> np.ndarray:
    """Native trace as (rows, m, 16) uint8 canonical encodings.

    The bytes stay bytes — at 2^20 rows, decoding to Python ints costs
    seconds; the prover's bulk path (iop/stark.py) consumes these directly
    via ops/limbs.py bytes_to_limbs.
    """
    lib = _load()
    if lib is None or rp.m != 2:
        from stark_anatomy_tpu.utils.encoding import felt_to_bytes

        rows = rp._trace_py(input_element, chain_length)
        out = np.empty((rows.shape[0], rp.m, 16), dtype=np.uint8)
        for t in range(rows.shape[0]):
            for j in range(rp.m):
                out[t, j] = np.frombuffer(felt_to_bytes(int(rows[t][j])), np.uint8)
        return out
    mds = _enc([rp.mds[i][j] for i in range(2) for j in range(2)])
    consts = _enc(rp.round_constants)
    ainv = _enc([rp.alpha_inv])
    inp = _enc([input_element])
    rows = chain_length * rp.rows_per_perm + 1
    out = np.empty((rows * rp.m, 16), dtype=np.uint8)
    lib.rescue_chain_trace(
        _ptr(inp), chain_length, rp.N, rp.rows_per_perm,
        _ptr(mds), _ptr(consts), _ptr(ainv), _ptr(out)
    )
    return out.reshape(rows, rp.m, 16)


def rescue_chain_trace(rp, input_element: int, chain_length: int) -> np.ndarray:
    """Native trace generation; falls back to rp._trace_py (same rows)."""
    lib = _load()
    if lib is None or rp.m != 2:
        return rp._trace_py(input_element, chain_length)
    out = rescue_chain_trace_bytes(rp, input_element, chain_length)
    values = _dec(out.reshape(-1, 16))
    return np.array(values, dtype=object).reshape(-1, rp.m)
