"""ctypes bindings for the native (C++) Merkle hashing engine.

Builds csrc/sha256_merkle.cpp on first use (g++ -O3, SHA-NI runtime dispatch)
and exposes:

* ``leaf_hash_batch(vals_u64, n_groups, leafs_per_node, fmt)`` -> (n,32) u8
* ``inner_levels(level0_digests, fan_in)`` -> all upper-level digests
* ``available()`` — False if no toolchain; callers fall back to hashlib.

Element formats (must match fields/host.py Display semantics, PARITY.md):
  fmt 0 base decimal; fmt 1 QuadExtField(a + b * u); fmt 2 nested Fp4.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "sha256_merkle.cpp")
_SO = os.path.join(_HERE, "csrc", "_sha256_merkle.so")

_lib = None
_lock = threading.Lock()
_NTHREADS = min(8, os.cpu_count() or 1)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return _lib
        lib.leaf_hash_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.inner_levels.restype = ctypes.c_size_t
        lib.inner_levels.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.sha256_oneshot.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        # Known-answer self-test before the backend is trusted: a stale or
        # foreign-architecture binary must never silently corrupt commitments
        # (ADVICE r1). Any failure (wrong digest, SIGILL surfaces as an
        # exception from the call) demotes to the hashlib/device fallbacks.
        try:
            import hashlib

            probe = b"ministark native self-test"
            out = np.empty(32, dtype=np.uint8)
            buf = np.frombuffer(bytearray(probe), dtype=np.uint8)
            lib.sha256_oneshot(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(probe),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if out.tobytes() != hashlib.sha256(probe).digest():
                _lib = False
                return _lib
        except Exception:
            _lib = False
            return _lib
        _lib = lib
        return _lib


def available() -> bool:
    return bool(_load())


def sha256_oneshot(data: bytes) -> bytes:
    lib = _load()
    assert lib
    out = np.empty(32, dtype=np.uint8)
    buf = np.frombuffer(bytearray(data), dtype=np.uint8)
    lib.sha256_oneshot(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.tobytes()


def leaf_hash_batch(vals: np.ndarray, leafs_per_node: int, fmt: int) -> np.ndarray:
    """vals: uint64 array of shape (n_elems, comps) or (n_elems,) for fmt 0.
    Returns (n_elems // leafs_per_node, 32) uint8 digests."""
    lib = _load()
    assert lib, "native hashing engine unavailable"
    comps = {0: 1, 1: 2, 2: 4}[fmt]
    v = np.ascontiguousarray(vals, dtype=np.uint64).reshape(-1)
    n_elems = v.size // comps
    assert n_elems % leafs_per_node == 0
    n_groups = n_elems // leafs_per_node
    out = np.empty((n_groups, 32), dtype=np.uint8)
    lib.leaf_hash_batch(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_groups, leafs_per_node, fmt, _NTHREADS,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def inner_levels(level0: np.ndarray, fan_in: int) -> np.ndarray:
    """level0: (n, 32) uint8 digests; returns ((n*fan_in^-1 + ... + 1), 32)."""
    lib = _load()
    assert lib
    n = level0.shape[0]
    total = 0
    m = n
    while m > 1:
        m //= fan_in
        total += m
    out = np.empty((total, 32), dtype=np.uint8)
    src = np.ascontiguousarray(level0, dtype=np.uint8)
    written = lib.inner_levels(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, fan_in,
        _NTHREADS, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert written == total
    return out
