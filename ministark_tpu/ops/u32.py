"""uint32 multi-word arithmetic primitives for TPU lanes.

TPUs have no native 64-bit integer datapath, so field elements are packed into
uint32 words (Goldilocks: [lo, hi] pairs; BabyBear: single word) and all wide
arithmetic is built from 16x16->32 partial products and explicit carries.
Everything here is elementwise (VPU) and shape-polymorphic; ops compose under
``jit`` and inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def mul32_wide(a, b):
    """Full 32x32 -> 64-bit product as (lo32, hi32), via 16-bit partials."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    carry_mid = (mid < lh).astype(U32)
    lo = ll + (mid << 16)
    carry_lo = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (carry_mid << 16) + carry_lo
    return lo, hi


def add64(a_lo, a_hi, b_lo, b_hi):
    """64-bit add -> (lo, hi, carry_out)."""
    lo = a_lo + b_lo
    c = (lo < a_lo).astype(U32)
    hi = a_hi + b_hi
    c2 = (hi < a_hi).astype(U32)
    hi = hi + c
    c2 = c2 + (hi < c).astype(U32)
    return lo, hi, c2


def sub64(a_lo, a_hi, b_lo, b_hi):
    """64-bit subtract -> (lo, hi, borrow_out)."""
    lo = a_lo - b_lo
    bb = (a_lo < b_lo).astype(U32)
    hi = a_hi - b_hi
    b2 = (a_hi < b_hi).astype(U32)
    hi2 = hi - bb
    b2 = b2 + (hi < bb).astype(U32)
    return lo, hi2, b2


def mul64_wide(a_lo, a_hi, b_lo, b_hi):
    """Full 64x64 -> 128-bit product as four u32 words (x0..x3, LE)."""
    p00_lo, p00_hi = mul32_wide(a_lo, b_lo)
    p01_lo, p01_hi = mul32_wide(a_lo, b_hi)
    p10_lo, p10_hi = mul32_wide(a_hi, b_lo)
    p11_lo, p11_hi = mul32_wide(a_hi, b_hi)

    x0 = p00_lo
    # x1 = p00_hi + p01_lo + p10_lo (collect carries into c1)
    t = p00_hi + p01_lo
    c1 = (t < p00_hi).astype(U32)
    x1 = t + p10_lo
    c1 = c1 + (x1 < t).astype(U32)
    # x2 = p01_hi + p10_hi + p11_lo + c1
    t = p01_hi + p10_hi
    c2 = (t < p01_hi).astype(U32)
    x2 = t + p11_lo
    c2 = c2 + (x2 < t).astype(U32)
    t = x2 + c1
    c2 = c2 + (t < x2).astype(U32)
    x2 = t
    x3 = p11_hi + c2
    return x0, x1, x2, x3


def mul64_by_32_wide(a_lo, a_hi, b):
    """64x32 -> 96-bit product as three u32 words."""
    p0_lo, p0_hi = mul32_wide(a_lo, b)
    p1_lo, p1_hi = mul32_wide(a_hi, b)
    x0 = p0_lo
    x1 = p0_hi + p1_lo
    c = (x1 < p0_hi).astype(U32)
    x2 = p1_hi + c
    return x0, x1, x2
