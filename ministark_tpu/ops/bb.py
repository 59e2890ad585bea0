"""BabyBear field (p = 15 * 2^27 + 1 = 2013265921) arithmetic on uint32 lanes.

Elements are canonical uint32 values (< p). Products are at most 62 bits,
reduced with a Barrett step: q = floor(x * M / 2^62) with M = floor(2^62 / p)
(fits in 32 bits), then up to two conditional subtractions. All elementwise
uint32 VPU ops; bit-exact with fields/host.py BABYBEAR_FP.

The quartic tower (Fp4 = Fp2[v]/(v^2 - (2013265910 + u)) over
Fp2 = Fp[u]/(u^2 - 11), reference src/field.rs:64-109) is represented as
arrays of shape (..., 4) in tower coefficient order (c00, c01, c10, c11).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .u32 import U32, mul32_wide, mul64_by_32_wide

P = 2013265921
P32 = np.uint32(P)
M_BARRETT = (1 << 62) // P  # 2290649224, fits u32
MB32 = np.uint32(M_BARRETT)


def pack(values) -> np.ndarray:
    arr = np.asarray(values)
    if not np.issubdtype(arr.dtype, np.integer):
        arr = np.asarray(values, dtype=object)
        return np.asarray(
            [int(v) for v in arr.ravel()], dtype=np.uint32
        ).reshape(arr.shape)
    return arr.astype(np.uint32)


def unpack(arr) -> np.ndarray:
    return np.asarray(arr).astype(object)


def add(a, b):
    s = a + b
    return jnp.where(s >= P32, s - P32, s)


def sub(a, b):
    return jnp.where(a >= b, a - b, a + P32 - b)


def neg(a):
    return jnp.where(a == 0, a, P32 - a)


def mul(a, b):
    """(a * b) mod p, inputs canonical (< p < 2^31)."""
    x_lo, x_hi = mul32_wide(a, b)  # x < 2^62
    # q = floor(x * M / 2^62); x*M < 2^94
    y0, y1, y2 = mul64_by_32_wide(x_lo, x_hi, MB32)
    q = (y1 >> 30) | (y2 << 2)  # bits 62.. of the 96-bit product
    # r = x - q*p (fits in low 32 bits after at most 2 corrections)
    qp_lo, _ = mul32_wide(q, P32)
    r = x_lo - qp_lo
    r = jnp.where(r >= P32, r - P32, r)
    r = jnp.where(r >= P32, r - P32, r)
    return r


def square(a):
    return mul(a, a)


def pow_scalar(a, e: int):
    result = None
    acc = a
    for bit in reversed([int(x) for x in bin(e)[2:]]):
        if bit:
            result = acc if result is None else mul(result, acc)
        acc = square(acc)
    if result is None:
        return jnp.ones_like(a)
    return result


def zeros(shape):
    return jnp.zeros(shape, dtype=U32)


# ---------------------------------------------------------------------------
# Extension towers
# ---------------------------------------------------------------------------

NR_FP2 = np.uint32(11)
NR_FP4_C0 = np.uint32(2013265910)  # Fp4 NONRESIDUE = Fp2(2013265910, 1)


def fp2_add(a, b):
    return add(a, b)


def fp2_mul(a, b):
    """(..., 2) arrays: Fp2 karatsuba with NR = 11."""
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    v0 = mul(a0, b0)
    v1 = mul(a1, b1)
    c0 = add(v0, mul(NR_FP2, v1))
    c1 = sub(mul(add(a0, a1), add(b0, b1)), add(v0, v1))
    return jnp.stack([c0, c1], axis=-1)


def _fp2_mul_nr4(a):
    """Fp2 element * Fp4-nonresidue (2013265910 + u)."""
    a0, a1 = a[..., 0], a[..., 1]
    # (a0 + a1 u)(k + u) = (a0 k + 11 a1) + (a1 k + a0) u,  k = 2013265910
    c0 = add(mul(a0, NR_FP4_C0), mul(NR_FP2, a1))
    c1 = add(mul(a1, NR_FP4_C0), a0)
    return jnp.stack([c0, c1], axis=-1)


def fp4_add(a, b):
    return add(a, b)


def fp4_sub(a, b):
    return sub(a, b)


def fp4_mul(a, b):
    """(..., 4) arrays in tower order (c0 = [..,:2], c1 = [..,2:])."""
    a0, a1 = a[..., :2], a[..., 2:]
    b0, b1 = b[..., :2], b[..., 2:]
    v0 = fp2_mul(a0, b0)
    v1 = fp2_mul(a1, b1)
    c0 = add(v0, _fp2_mul_nr4(v1))
    c1 = sub(fp2_mul(add(a0, a1), add(b0, b1)), add(v0, v1))
    return jnp.concatenate([c0, c1], axis=-1)


def fp4_scale_base(a, s):
    """(..., 4) * base scalar broadcast."""
    return mul(a, s[..., None]) if s.ndim == a.ndim - 1 else mul(a, s)
