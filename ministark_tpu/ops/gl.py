"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic on uint32-pair lanes.

Elements are canonical values packed as two uint32 words: arrays of shape
(..., 2) with [..., 0] = low word, [..., 1] = high word. The 128-bit products
are reduced with the Goldilocks identities 2^64 == 2^32 - 1 and 2^96 == -1
(mod p), entirely in uint32 lane ops — no 64-bit datapath needed.

All functions are elementwise and jit/pallas-composable. Bit-exact with the
host oracle (fields/host.py GOLDILOCKS_FP); see tests/test_ops_fields.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .u32 import U32, mul32_wide, mul64_wide

P = 18446744069414584321
P_LO = np.uint32(P & 0xFFFFFFFF)           # 0x00000001
P_HI = np.uint32(P >> 32)                  # 0xFFFFFFFF
EPS = np.uint32(0xFFFFFFFF)                # 2^32 - 1 == 2^64 mod p


def pack(values) -> np.ndarray:
    """Host helper: ints / uint64 array -> (..., 2) uint32 [lo, hi].

    Python ints > 2^63 - 1 make numpy silently produce float64 — always route
    non-integer dtypes through the exact object path."""
    arr = np.asarray(values)
    if not np.issubdtype(arr.dtype, np.integer):
        arr = np.asarray(values, dtype=object)
        lo = np.vectorize(lambda v: int(v) & 0xFFFFFFFF, otypes=[np.uint32])(arr)
        hi = np.vectorize(lambda v: (int(v) >> 32) & 0xFFFFFFFF, otypes=[np.uint32])(arr)
        return np.stack([lo, hi], axis=-1)
    arr = arr.astype(np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)


def unpack(arr) -> np.ndarray:
    """Device array -> object ndarray of Python ints."""
    a = np.asarray(arr)
    return a[..., 0].astype(object) + (a[..., 1].astype(object) << 32)


def _ge_p(lo, hi):
    """x >= p for 64-bit (lo, hi)."""
    return (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))


def _sub_p(lo, hi):
    """(lo,hi) - p, assuming x >= p."""
    new_lo = lo - P_LO
    borrow = (lo < P_LO).astype(U32)
    new_hi = hi - P_HI - borrow
    return new_lo, new_hi


def _cond_sub_p(lo, hi):
    geq = _ge_p(lo, hi)
    s_lo, s_hi = _sub_p(lo, hi)
    return jnp.where(geq, s_lo, lo), jnp.where(geq, s_hi, hi)


def add_planar(alo, ahi, blo, bhi):
    """(a + b) mod p on separate lo/hi word arrays -> (lo, hi)."""
    lo = alo + blo
    c = (lo < alo).astype(U32)
    hi = ahi + bhi
    c2 = (hi < ahi).astype(U32)
    hi = hi + c
    c2 = c2 | (hi < c).astype(U32)
    # carry out of 2^64: add 2^32 - 1 (== 2^64 mod p)
    lo2 = lo + jnp.where(c2.astype(bool), EPS, np.uint32(0))
    wrap = (lo2 < lo).astype(U32)
    hi = hi + wrap
    return _cond_sub_p(lo2, hi)


def add(a, b):
    """(a + b) mod p on (..., 2) uint32 arrays."""
    lo, hi = add_planar(a[..., 0], a[..., 1], b[..., 0], b[..., 1])
    return jnp.stack([lo, hi], axis=-1)


def sub_planar(alo, ahi, blo, bhi):
    """(a - b) mod p on separate lo/hi word arrays -> (lo, hi)."""
    lo = alo - blo
    bb = (alo < blo).astype(U32)
    hi = ahi - bhi
    b2 = (ahi < bhi).astype(U32)
    hi2 = hi - bb
    b2 = b2 | ((hi < bb) & (bb > 0)).astype(U32)
    # borrow out of 2^64: subtract 2^32 - 1 (== add p then renormalize)
    lo2 = lo - jnp.where(b2.astype(bool), EPS, np.uint32(0))
    wrap = ((lo < EPS) & b2.astype(bool)).astype(U32)
    hi3 = hi2 - wrap
    return lo2, hi3


def sub(a, b):
    """(a - b) mod p."""
    lo, hi = sub_planar(a[..., 0], a[..., 1], b[..., 0], b[..., 1])
    return jnp.stack([lo, hi], axis=-1)


def neg(a):
    zero = jnp.zeros_like(a)
    is_zero = (a[..., 0] == 0) & (a[..., 1] == 0)
    lo = P_LO - a[..., 0]
    borrow = (P_LO < a[..., 0]).astype(U32)
    hi = P_HI - a[..., 1] - borrow
    out = jnp.stack([lo, hi], axis=-1)
    return jnp.where(is_zero[..., None], zero, out)


def mul_planar(alo, ahi, blo, bhi):
    """(a * b) mod p on separate lo/hi word arrays -> (lo, hi)."""
    x0, x1, x2, x3 = mul64_wide(alo, ahi, blo, bhi)
    return _reduce128(x0, x1, x2, x3)


def mul(a, b):
    """(a * b) mod p via 128-bit product + Goldilocks reduction."""
    lo, hi = mul_planar(a[..., 0], a[..., 1], b[..., 0], b[..., 1])
    return jnp.stack([lo, hi], axis=-1)


def square(a):
    return mul(a, a)


def _reduce128(x0, x1, x2, x3):
    """(x0 + x1*2^32 + x2*2^64 + x3*2^96) mod p -> canonical (lo, hi).

    n == lo64 - x3 + x2 * (2^32 - 1)   (mod p)
    """
    # t = lo64 - x3 (borrow -> subtract EPS once more; cannot underflow twice)
    lo = x0 - x3
    bb = (x0 < x3).astype(U32)
    hi = x1 - bb
    b2 = (x1 < bb).astype(U32)
    lo2 = lo - jnp.where(b2.astype(bool), EPS, np.uint32(0))
    wrap = ((lo < EPS) & b2.astype(bool)).astype(U32)
    hi = hi - wrap

    # t += x2 * (2^32 - 1) = (x2 << 32) - x2
    m_lo, m_hi = mul32_wide(x2, EPS)
    lo3 = lo2 + m_lo
    c = (lo3 < lo2).astype(U32)
    hi2 = hi + m_hi
    c2 = (hi2 < hi).astype(U32)
    hi2 = hi2 + c
    c2 = c2 | (hi2 < c).astype(U32)
    # carry out of 2^64 -> add EPS
    lo4 = lo3 + jnp.where(c2.astype(bool), EPS, np.uint32(0))
    wrap = (lo4 < lo3).astype(U32)
    hi2 = hi2 + wrap

    return _cond_sub_p(lo4, hi2)


def from_u64(lo, hi):
    """Reduce an arbitrary 64-bit (lo, hi) value mod p."""
    lo, hi = _cond_sub_p(lo.astype(U32), hi.astype(U32))
    return jnp.stack([lo, hi], axis=-1)


def zeros(shape):
    return jnp.zeros(tuple(shape) + (2,), dtype=U32)


def pow_scalar(a, e: int):
    """a ** e for a static integer exponent (square-and-multiply chain)."""
    bits = [int(x) for x in bin(e)[2:]]
    result = None
    acc = a
    for bit in reversed(bits):
        if bit:
            result = acc if result is None else mul(result, acc)
        acc = square(acc)
    if result is None:
        one = jnp.zeros_like(a)
        return one.at[..., 0].set(1)
    return result


# ---------------------------------------------------------------------------
# Quadratic extension Fp2 = Fp[u]/(u^2 - 7): arrays of shape (..., 2, 2)
# with axis -2 = [c0, c1] (reference src/field.rs:50-62).
# ---------------------------------------------------------------------------

NONRESIDUE = 7


def _mul_nr(a):
    """multiply by the nonresidue 7 = 8 - 1 via shift-adds (cheaper than a
    full modmul, and keeps pallas kernels free of array constants)."""
    two = add(a, a)
    four = add(two, two)
    eight = add(four, four)
    return sub(eight, a)


def ext_add(a, b):
    return jnp.stack([add(a[..., 0, :], b[..., 0, :]), add(a[..., 1, :], b[..., 1, :])], axis=-2)


def ext_sub(a, b):
    return jnp.stack([sub(a[..., 0, :], b[..., 0, :]), sub(a[..., 1, :], b[..., 1, :])], axis=-2)


def ext_mul(a, b):
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    v0 = mul(a0, b0)
    v1 = mul(a1, b1)
    c0 = add(v0, _mul_nr(v1))
    c1 = sub(mul(add(a0, a1), add(b0, b1)), add(v0, v1))
    return jnp.stack([c0, c1], axis=-2)


def ext_scale_base(a, s):
    """extension element * base scalar (broadcast s over (..., 2, 2))."""
    return jnp.stack([mul(a[..., 0, :], s), mul(a[..., 1, :], s)], axis=-2)
