"""Limb/component-PLANAR field calculus for the VPU-hot polynomial kernels.

The packed public layout keeps field components on trailing axes
((m, 2, 2) for Goldilocks Fp2, (m, 4) for BabyBear Fp4). That layout is
fine for the MXU NTT (which converts internally) and for hashing, but any
slice/roll/select on the coefficient axis of a tiny-minor-dim array is
3-40x slower than the same operation with coefficients on the LANE axis
(scripts/slope_probe.py: fold 14.5 ms packed vs 0.33 ms planar at 2^21).

This module provides the planar calculus: a field element vector is ONE
uint32 array of shape (C, m) — component planes stacked on a leading axis,
coefficients minor. Conversions happen INSIDE the jitted op so XLA fuses
them with the work; all public APIs keep the packed layout.

Supported fields: Goldilocks base (C=2) / Fp2 (C=4: c0lo c0hi c1lo c1hi),
BabyBear base (C=1) / Fp4 (C=4: c00 c01 c10 c11). vmap-safe: every op
indexes planes from the front and coefficients from the back.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import bb as bb_ops
from . import gl as gl_ops

_ROW = 1024


# --------------------------------------------------------------- arithmetic
def _gl_base_mul(x, y):
    return jnp.stack(gl_ops.mul_planar(x[0], x[1], y[0], y[1]))


def _gl_base_add(x, y):
    return jnp.stack(gl_ops.add_planar(x[0], x[1], y[0], y[1]))


def _gl_base_sub(x, y):
    return jnp.stack(gl_ops.sub_planar(x[0], x[1], y[0], y[1]))


def _gl2_mul(x, y):
    v0 = gl_ops.mul_planar(x[0], x[1], y[0], y[1])
    v1 = gl_ops.mul_planar(x[2], x[3], y[2], y[3])
    sx = gl_ops.add_planar(x[0], x[1], x[2], x[3])
    sy = gl_ops.add_planar(y[0], y[1], y[2], y[3])
    s = gl_ops.mul_planar(*sx, *sy)
    # 7*v1 via shift-adds (nonresidue 7 = 8 - 1)
    d2 = gl_ops.add_planar(*v1, *v1)
    d4 = gl_ops.add_planar(*d2, *d2)
    d8 = gl_ops.add_planar(*d4, *d4)
    n7 = gl_ops.sub_planar(*d8, *v1)
    c0 = gl_ops.add_planar(*v0, *n7)
    vv = gl_ops.add_planar(*v0, *v1)
    c1 = gl_ops.sub_planar(*s, *vv)
    return jnp.stack([c0[0], c0[1], c1[0], c1[1]])


def _gl2_add(x, y):
    c0 = gl_ops.add_planar(x[0], x[1], y[0], y[1])
    c1 = gl_ops.add_planar(x[2], x[3], y[2], y[3])
    return jnp.stack([c0[0], c0[1], c1[0], c1[1]])


def _gl2_sub(x, y):
    c0 = gl_ops.sub_planar(x[0], x[1], y[0], y[1])
    c1 = gl_ops.sub_planar(x[2], x[3], y[2], y[3])
    return jnp.stack([c0[0], c0[1], c1[0], c1[1]])


def _bb_base_mul(x, y):
    return bb_ops.mul(x, y)


def _bb2_mul4(a0, a1, b0, b1):
    v0 = bb_ops.mul(a0, b0)
    v1 = bb_ops.mul(a1, b1)
    c0 = bb_ops.add(v0, bb_ops.mul(jnp.broadcast_to(bb_ops.NR_FP2, v1.shape), v1))
    c1 = bb_ops.sub(
        bb_ops.mul(bb_ops.add(a0, a1), bb_ops.add(b0, b1)), bb_ops.add(v0, v1)
    )
    return c0, c1


def _bb4_mul(x, y):
    v00, v01 = _bb2_mul4(x[0], x[1], y[0], y[1])
    v10, v11 = _bb2_mul4(x[2], x[3], y[2], y[3])
    s00, s01 = bb_ops.add(x[0], x[2]), bb_ops.add(x[1], x[3])
    t00, t01 = bb_ops.add(y[0], y[2]), bb_ops.add(y[1], y[3])
    s0, s1 = _bb2_mul4(s00, s01, t00, t01)
    # v1 * Fp4-nonresidue (k + u), k = NR_FP4_C0
    k = jnp.broadcast_to(bb_ops.NR_FP4_C0, v10.shape)
    nr = jnp.broadcast_to(bb_ops.NR_FP2, v10.shape)
    n0 = bb_ops.add(bb_ops.mul(v10, k), bb_ops.mul(nr, v11))
    n1 = bb_ops.add(bb_ops.mul(v11, k), v10)
    c00 = bb_ops.add(v00, n0)
    c01 = bb_ops.add(v01, n1)
    c10 = bb_ops.sub(s0, bb_ops.add(v00, v10))
    c11 = bb_ops.sub(s1, bb_ops.add(v01, v11))
    return jnp.stack([c00, c01, c10, c11])


def _bb_add(x, y):
    return bb_ops.add(x, y)


def _bb_sub(x, y):
    return bb_ops.sub(x, y)


@dataclass(frozen=True)
class PlanarCalc:
    C: int
    elem_axes: tuple
    mul: Callable
    add: Callable
    sub: Callable
    one_planes: np.ndarray          # (C,) uint32

    # ---- layout conversion (traced; fused into the surrounding jit).
    # Written for the LOGICAL shapes (m, *elem) <-> (C, m); batch axes are
    # supported via vmap, not via explicit leading dims.
    def to_planes(self, packed):
        """(m, *elem) -> (C, m)."""
        ne = len(self.elem_axes)
        a = jnp.transpose(packed, tuple(range(1, 1 + ne)) + (0,))
        return a.reshape(self.C, packed.shape[0])

    def from_planes(self, planes):
        """(C, m) -> (m, *elem)."""
        m = planes.shape[-1]
        a = planes.reshape(self.elem_axes + (m,))
        ne = len(self.elem_axes)
        return jnp.transpose(a, (ne,) + tuple(range(ne)))

    def scalar_planes(self, packed_scalar):
        """(*elem,) -> (C,)"""
        return packed_scalar.reshape(self.C)

    def bc(self, scalar_planes, like):
        """(C,) -> broadcast against (C, m...)."""
        extra = like.ndim - 1
        return jnp.broadcast_to(
            scalar_planes.reshape((self.C,) + (1,) * extra), like.shape
        )

    def one_bc(self, like):
        return self.bc(jnp.asarray(self.one_planes), like)


_GL2 = PlanarCalc(4, (2, 2), _gl2_mul, _gl2_add, _gl2_sub,
                  np.array([1, 0, 0, 0], dtype=np.uint32))
_GLB = PlanarCalc(2, (2,), _gl_base_mul, _gl_base_add, _gl_base_sub,
                  np.array([1, 0], dtype=np.uint32))
_BB4 = PlanarCalc(4, (4,), _bb4_mul, _bb_add, _bb_sub,
                  np.array([1, 0, 0, 0], dtype=np.uint32))
_BBB = PlanarCalc(1, (), _bb_base_mul, _bb_add, _bb_sub,
                  np.array([1], dtype=np.uint32))


def get_planar(k) -> "PlanarCalc | None":
    """Planar calculus for a FieldKernels registry entry, or None."""
    p = k.base_field.p
    if p == gl_ops.P:
        return _GL2 if k.elem_axes == (2, 2) else _GLB
    if p == bb_ops.P:
        if k.elem_axes == (4,):
            return _BB4
        return _BBB if k.elem_axes == () else None
    return None


# ------------------------------------------------------------ pipeline ops
def _mask_where(mask_m, a, b):
    """select along the coefficient (last) axis."""
    return jnp.where(jnp.broadcast_to(mask_m, a.shape), a, b)


def fold_planes(pc: PlanarCalc, pl, alpha_planes):
    """(C, m) -> (C, m/2): even + alpha * odd over coefficient parity."""
    C, m = pl.shape[-2], pl.shape[-1]
    if m % (2 * _ROW) == 0:
        w = pl.reshape(pl.shape[:-1] + (m // _ROW, _ROW))
        even = w[..., 0::2].reshape(pl.shape[:-1] + (m // 2,))
        odd = w[..., 1::2].reshape(pl.shape[:-1] + (m // 2,))
    else:
        even = pl[..., 0::2]
        odd = pl[..., 1::2]
        if odd.shape[-1] < even.shape[-1]:
            odd = jnp.concatenate(
                [odd, jnp.zeros_like(even[..., : even.shape[-1] - odd.shape[-1]])],
                axis=-1,
            )
    return pc.add(even, pc.mul(odd, pc.bc(alpha_planes, odd)))


def fold_factor_planes(pc: PlanarCalc, pl, alpha_planes, F: int):
    """(C, m) -> (C, m/F): sum_j alpha^j * c[F*i + j] (F-way coefficient
    fold, the production FRI round with folding factor F)."""
    m = pl.shape[-1]
    assert m % F == 0
    if m % (F * _ROW) == 0:
        w = pl.reshape(pl.shape[:-1] + (m // _ROW, _ROW))
        parts = [w[..., j::F].reshape(pl.shape[:-1] + (m // F,)) for j in range(F)]
    else:
        parts = [pl[..., j::F] for j in range(F)]
    acc = parts[0]
    a_pow = alpha_planes
    for j in range(1, F):
        # fence each step: unfenced chained fused field muls re-execute the
        # producer expression at every use — XLA:CPU's optimizer hangs for
        # MINUTES compiling the F=8 chain at n >= PLANAR_MIN without these
        # (hit in round 3 as a wedged fold8/arity8 fast prove). Barriers
        # change scheduling only; values are bit-identical.
        acc = jax.lax.optimization_barrier(
            pc.add(acc, pc.mul(parts[j], pc.bc(a_pow, parts[j])))
        )
        if j + 1 < F:
            a_pow = jax.lax.optimization_barrier(
                pc.mul(a_pow.reshape(pc.C, 1), alpha_planes.reshape(pc.C, 1))
            ).reshape(pc.C)
    return acc


def _powers_ladder(pc: PlanarCalc, x_planes, m: int):
    """(C,) scalar -> (C, m) = [1, x, ..., x^(m-1)] (exponent-bit ladder:
    log m fori iterations, each one mask-mul over the full (C, m) array)."""
    pw = pc.one_bc(jnp.zeros((pc.C, m), jnp.uint32))
    if m == 1:
        return pw
    x0 = jnp.broadcast_to(x_planes.reshape(pc.C, 1), (pc.C, 1))
    log_m = (m - 1).bit_length()
    idx = jnp.arange(m)

    def body(b, carry):
        pw, x2 = carry
        bit = ((idx >> b) & 1) == 1
        mult = pc.mul(pw, jnp.broadcast_to(x2, pw.shape))
        pw = _mask_where(bit, mult, pw)
        return pw, pc.mul(x2, x2)

    pw, _ = jax.lax.fori_loop(0, log_m, body, (pw, x0))
    return pw


def powers_planes(pc: PlanarCalc, x_planes, m: int):
    """(C,) scalar -> (C, m) = [1, x, ..., x^(m-1)].

    Hierarchical (outer-product) construction for large m: with
    i = r*_ROW + l, x^i = (x^_ROW)^r * x^l, so the table is ONE full-size
    multiply of two small ladder tables — log m full-array mul passes
    (the Hillis-Steele ladder) collapse to one. Exact: field muls are
    associative, so the grouping change is bit-identical."""
    if m <= 2 * _ROW or m % _ROW:
        return _powers_ladder(pc, x_planes, m)
    rows = m // _ROW
    lo = _powers_ladder(pc, x_planes, _ROW)               # (C, _ROW)
    x_row = lo[..., -1:]                                  # x^(_ROW-1)
    x_row = pc.mul(x_row, x_planes.reshape(pc.C, 1))      # x^_ROW, (C, 1)
    hi = _powers_ladder(pc, x_row.reshape(pc.C), rows)    # (C, rows)
    full = pc.mul(
        jnp.broadcast_to(hi[..., :, None], (pc.C, rows, _ROW)),
        jnp.broadcast_to(lo[..., None, :], (pc.C, rows, _ROW)),
    )
    return full.reshape(pc.C, m)


def _suffix_hillis(pc: PlanarCalc, pl):
    """S_i = sum_{j >= i} pl[..., j] (Hillis-Steele on the lane axis)."""
    m = pl.shape[-1]
    if m == 1:
        return pl
    log_m = (m - 1).bit_length()
    idx = jnp.arange(m)

    def body(t, a):
        s = jnp.int32(1) << t
        rolled = jnp.roll(a, -s, axis=-1)
        summed = pc.add(a, rolled)
        return _mask_where(idx + s < m, summed, a)

    return jax.lax.fori_loop(0, log_m, body, pl)


def suffix_sums_planes(pc: PlanarCalc, pl):
    """S_i = sum_{j >= i} pl[..., j].

    Two-level for large m (i = r*_ROW + l): within-row suffix over the
    _ROW-lane minor axis (log _ROW full passes), then a tiny suffix over
    the (m/_ROW) row totals broadcast-added back — instead of log m full
    passes. Exact: field adds are associative."""
    m = pl.shape[-1]
    if m <= 2 * _ROW or m % _ROW:
        return _suffix_hillis(pc, pl)
    rows = m // _ROW
    w = pl.reshape(pl.shape[:-1] + (rows, _ROW))
    sfx = _suffix_hillis(pc, w)                            # within rows
    totals = sfx[..., :, 0]                                # (C, rows)
    tails = _suffix_hillis(pc, totals)                     # (C, rows)
    # tails_after[r] = sum of totals of rows > r
    zero = jnp.zeros_like(tails[..., :1])
    tails_after = jnp.concatenate([tails[..., 1:], zero], axis=-1)
    out = pc.add(sfx, jnp.broadcast_to(tails_after[..., :, None], sfx.shape))
    return out.reshape(pl.shape)


def field_sum_planes(pc: PlanarCalc, pl):
    """(C, m) -> (C,) total sum.

    Pairwise tree reduction (pad to a power of two with zeros, halve the
    array each step): total element-adds ~2m vs the scan's m log m, and
    every intermediate shrinks. Exact: adds are associative, zero is the
    identity."""
    m = pl.shape[-1]
    if m == 1:
        return pl[..., 0]
    mp = 1 << (m - 1).bit_length()
    if mp != m:
        pad = jnp.zeros(pl.shape[:-1] + (mp - m,), dtype=pl.dtype)
        pl = jnp.concatenate([pl, pad], axis=-1)
    while mp > 1:
        h = mp // 2
        pl = pc.add(pl[..., :h], pl[..., h:])
        mp = h
    return pl[..., 0]


_ob = jax.lax.optimization_barrier


_SUFFIX_RADIX = 32


def _suffix_lanes(pc: PlanarCalc, x):
    """Suffix sums along the last axis, two-level: radix-_SUFFIX_RADIX
    chunk-local Hillis-Steele (log radix full passes) + a chunk-total suffix
    at 1/radix size + one broadcast add — 6 full passes for L=1024 instead
    of the flat scan's 10. Exact: field adds are associative."""
    L = x.shape[-1]
    if L <= _SUFFIX_RADIX or L % _SUFFIX_RADIX:
        return _suffix_hillis(pc, x)
    nch = L // _SUFFIX_RADIX
    w = x.reshape(x.shape[:-1] + (nch, _SUFFIX_RADIX))
    s = _suffix_hillis(pc, w)                      # within chunks
    tails = _suffix_hillis(pc, s[..., :, 0])       # chunk totals, suffixed
    after = jnp.concatenate(
        [tails[..., 1:], jnp.zeros_like(tails[..., :1])], axis=-1)
    out = pc.add(s, jnp.broadcast_to(after[..., :, None], s.shape))
    return out.reshape(x.shape)


def _blocked_div_tail(pc: PlanarCalc, u, lo, ilo, z_planes, zinv_planes):
    """Shared tail of the blocked (x - z) division. ``u``: (C, rows, L) with
    u_{r,l} = c_{r,l} * z^l (the LOCAL-power scaled coefficients); ``lo`` /
    ``ilo``: the (C, L) ladders of z^l / z^{-l}. Returns flat (C, m) where
    entry r*L+l = z^{-(rL+l)} * T_{rL+l} for the global suffix sums
    T_i = sum_{j>=i} c_j z^j — i.e. q_{i-1} at index i, remainder f(z) at 0.

    Identity: with i = r*L + l,
      z^{-i} T_i = z^{-l} * (S_{r,l} + V_r),
      S_{r,l} = sum_{j>=l} u_{r,j}                (within-row suffix)
      V_r     = (z^{-L})^r * W_{r+1},  W_r = sum_{r'>=r} S_{r',0} (z^L)^{r'}
    so the only FULL-LENGTH multiply here is the final z^{-l} scale; every
    power table is a _ROW- or rows-sized ladder. Exact modular arithmetic."""
    rows = u.shape[-2]
    # fence the suffix result: unfenced, XLA loop-fuses the whole
    # Hillis-Steele shifted-add chain into every downstream consumer and
    # re-executes it per use (measured on v5e: the final out-scale mul
    # read 1.3 ms composed vs 0.17 ms isolated; scripts/tpu_fold_bisect2.py)
    S = _ob(_suffix_lanes(pc, u))                       # (C, rows, L)
    tot = S[..., :, 0]                                  # (C, rows)
    zL = pc.mul(lo[..., -1:], pc.bc(z_planes, lo[..., -1:]))
    ziL = pc.mul(ilo[..., -1:], pc.bc(zinv_planes, ilo[..., -1:]))
    zLr = _powers_ladder(pc, zL.reshape(pc.C), rows)    # (z^L)^r
    ziLr = _powers_ladder(pc, ziL.reshape(pc.C), rows)  # (z^-L)^r
    wsum = _suffix_hillis(pc, pc.mul(tot, zLr))         # W_r
    w_next = jnp.concatenate(
        [wsum[..., 1:], jnp.zeros_like(wsum[..., :1])], axis=-1)
    V = _ob(pc.mul(w_next, ziLr))                       # (C, rows)
    SV = _ob(pc.add(S, jnp.broadcast_to(V[..., :, None], S.shape)))
    q_full = pc.mul(SV, jnp.broadcast_to(ilo[..., None, :], SV.shape))
    return q_full.reshape(u.shape[:-2] + (rows * u.shape[-1],))


def synth_div_planes(pc: PlanarCalc, pl, z_planes, zinv_planes):
    """Quotient of division by (x - z): q_i = z^{-(i+1)} sum_{j>=i+1} c_j z^j.
    pl: (C, m); zinv_planes: packed z^{-1}; returns (C, m-1).

    Blocked local-power formulation (_blocked_div_tail): 2 full-length
    multiplies (c * z^local in, z^-local out) instead of the 4 a
    global-power-table formulation needs. Mirrors
    poly_device.synth_div_suffix."""
    m = pl.shape[-1]
    if m <= 2 * _ROW or m % _ROW:
        # small m: global tables are fine (and rows would be tiny)
        pw = powers_planes(pc, z_planes, m)
        t = _ob(pc.mul(pl, pw))
        suf = suffix_sums_planes(pc, t)
        ipw = powers_planes(pc, zinv_planes, m)         # zinv^0 .. zinv^{m-1}
        inv_pw = _ob(pc.mul(ipw[..., : m - 1],
                            pc.bc(zinv_planes, ipw[..., : m - 1])))
        return pc.mul(suf[..., 1:], inv_pw)
    rows = m // _ROW
    w = pl.reshape(pl.shape[:-1] + (rows, _ROW))
    lo = _powers_ladder(pc, z_planes, _ROW)             # (C, L): z^l
    ilo = _powers_ladder(pc, zinv_planes, _ROW)         # (C, L): z^{-l}
    u = _ob(pc.mul(w, jnp.broadcast_to(lo[..., None, :], w.shape)))
    q_full = _blocked_div_tail(pc, u, lo, ilo, z_planes, zinv_planes)
    # flat index r*L+l holds q_{rL+l-1}; entry 0 is the remainder f(z)
    return q_full[..., 1:]


def fold_div_planes(pc: PlanarCalc, pl, z_planes, alpha_planes, dv_planes,
                    zinv_planes):
    """One full FRI fold round, planar end-to-end: even/odd fold with alpha,
    subtract the DEEP value at x^0, divide by (x - z); returns (C, m/2)
    (quotient is m/2 - 1 coefficients, padded with one zero).

    Fully fused: folded_j * z^j = even_j * z^j + odd_j * (alpha z^j), so the
    fold multiply and the division's in-scale multiply collapse into two
    half-length table multiplies — 3 half-length muls total for the whole
    round (fold+in-scale fused, out-scale), the mul-count floor for this
    formulation. Staying planar end-to-end also avoids two packed<->planar
    relayout passes per round."""
    m = pl.shape[-1]
    h = m // 2
    if h <= 2 * _ROW or h % _ROW:
        folded = fold_planes(pc, pl, alpha_planes)
        head = pc.sub(folded[..., :1], pc.bc(dv_planes, folded[..., :1]))
        folded = jnp.concatenate([head, folded[..., 1:]], axis=-1)
        q = synth_div_planes(pc, folded, z_planes, zinv_planes)
        return jnp.concatenate([q, jnp.zeros_like(q[..., :1])], axis=-1)
    rows = h // _ROW
    w = pl.reshape(pl.shape[:-1] + (m // _ROW, _ROW))
    even = w[..., 0::2].reshape(pl.shape[:-1] + (h,))
    odd = w[..., 1::2].reshape(pl.shape[:-1] + (h,))
    # (folded - dv) coefficient 0 = even_0 + alpha*odd_0 - dv: fold the DEEP
    # subtraction into even_0 before scaling (z^0 = 1 there)
    even = jnp.concatenate(
        [pc.sub(even[..., :1], pc.bc(dv_planes, even[..., :1])),
         even[..., 1:]], axis=-1)
    lo = _powers_ladder(pc, z_planes, _ROW)             # z^l
    ilo = _powers_ladder(pc, zinv_planes, _ROW)         # z^-l
    alo = pc.mul(lo, pc.bc(alpha_planes, lo))           # alpha * z^l
    we = even.reshape(pl.shape[:-1] + (rows, _ROW))
    wo = odd.reshape(pl.shape[:-1] + (rows, _ROW))
    u = _ob(pc.add(
        pc.mul(we, jnp.broadcast_to(lo[..., None, :], we.shape)),
        pc.mul(wo, jnp.broadcast_to(alo[..., None, :], wo.shape)),
    ))
    q_full = _blocked_div_tail(pc, u, lo, ilo, z_planes, zinv_planes)
    # flat index i holds q_{i-1} (entry 0 = remainder, exactly 0): shift
    # left by one and zero-pad the top coefficient
    return jnp.concatenate(
        [q_full[..., 1:], jnp.zeros_like(q_full[..., :1])], axis=-1)


def eval_even_odd_planes(pc: PlanarCalc, pl, z_planes):
    """(f_even(z), f_odd(z)) as (C,) plane scalars."""
    m = pl.shape[-1]
    if m % (2 * _ROW) == 0:
        w = pl.reshape(pl.shape[:-1] + (m // _ROW, _ROW))
        even = w[..., 0::2].reshape(pl.shape[:-1] + (m // 2,))
        odd = w[..., 1::2].reshape(pl.shape[:-1] + (m // 2,))
    else:
        even = pl[..., 0::2]
        odd = pl[..., 1::2]
        if odd.shape[-1] < even.shape[-1]:
            odd = jnp.concatenate(
                [odd, jnp.zeros_like(even[..., : even.shape[-1] - odd.shape[-1]])],
                axis=-1,
            )
    pw = powers_planes(pc, z_planes, even.shape[-1])
    fe = field_sum_planes(pc, _ob(pc.mul(even, pw)))
    fo = field_sum_planes(pc, _ob(pc.mul(odd, pw)))
    return fe, fo
