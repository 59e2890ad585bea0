"""MXU (systolic-array) NTT: small DFTs as exact int8 matmuls.

The TPU's MXU does s8 x s8 -> s32 matmuls at ~40x the VPU's elementwise
throughput (~300 TMAC/s measured on v5e), so the fastest TPU NTT maps the
FLOPs onto it instead of doing butterfly stages on the VPU (the
jaxite/TFHE-on-TPU recipe, re-derived for 64-bit Goldilocks):

* factor n into F1*...*Fk with every F <= 512 and apply the four-step
  decomposition recursively (one inter-level twiddle per split);
* each length-F NTT is ONE integer matmul: the input is CENTERED (values
  above the 8-byte balanced capacity map to v - p; see _params) and split
  into NA balanced signed bytes x = sum_a d_a 256^a (d_a in [-128, 127];
  the truncating u32->s8 cast of byte+carry IS the digit), and the DFT
  matrix is pre-scaled per digit, V^(a)[m, k] = root^(m*k) * 256^a mod p,
  each entry centered the same way and decomposed into NB balanced
  signed bytes:

    NTT(x)[k] = sum_b 2^(8b) * R_b[k]  (mod p),
    R[g, (b, k)] = sum_{a, m} d[a, g, m] * Vd[a, m, (b, k)]

  i.e. one (NA, G, F) x (NA, F, NB*F) s8 dot_general with s32 accumulation.
  Exact: |R_b| <= F * NA * 128 * 128 < 2^27 for F <= 512;
* the mod-p recombination sum_b R_b 2^(8b) runs on the VPU in uint32 word
  ops (offset to non-negative, byte-shift accumulate into three 32-bit
  words, one Goldilocks 96-bit reduction);
* inter-level twiddles W[i1, k2] = root^(i1*k2) are generated on device
  (ops/ntt_device._twiddle_matrix) and applied elementwise.

Layout rules (each worth 2-4x, measured on v5e through the HLO profiler):
* limb-PLANAR everywhere: a field array is a tuple of u32 word planes; a
  trailing (..., 2) limb axis forces an (8, 128)-tile relayout on every
  slice/stack/transpose. Conversion only at the public boundary.
* NO explicit transposes between levels: x is reshaped once to
  (B, F1, ..., Fk) and every level contracts ITS axis in place via
  dot_general (the operand transpose rides the MXU feed); frequency axes
  accumulate to the right and one final axis-reversing transpose restores
  natural order.
* digits stack on a new LEADING axis (pure concatenation, no interleave),
  and an optimization_barrier fences the stack from the dot -- without it
  XLA splits the dot into NA partial dots, each streaming the full s32
  accumulator through HBM (measured 16 x 0.47 ms at 2^21).
* per-digit matmul output planes are CONTIGUOUS column slices (b*F + k
  column order).

Result at n = 2^21, batch 2, Goldilocks on one v5e: ~3.2 ms device time
(~1.2 ms MXU, the rest VPU recombine/twiddle) vs ~13 ms for the VPU
butterfly Pallas kernels and ~16 ms for the XLA four-step.

Bit-exact with ops/ntt_device.get_ntt_fns and the host oracle
(tests/test_ntt_mxu.py). Reference hot spot this accelerates: ark-poly
fft/ifft used at /root/reference/src/air.rs:147-160, src/starks.rs:82-91,
src/fri.rs:345-352.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bb as bb_ops
from . import gl as gl_ops
from .ntt_device import _field_ops, _powers, _twiddle_matrix
from .u32 import U32

F_MAX = 512          # largest single-matmul DFT (log2 in [5, 9])
F_PREF = 8           # preferred log2 factor (256): small host tables
RT = 512             # fused-kernel rows (surviving positions) per block


# ---------------------------------------------------------------------------
# Per-field digit parameters
# ---------------------------------------------------------------------------


def _params(p: int):
    """(limbs, NA input byte digits, NB matrix byte digits) for modulus p.

    CENTERED representation (round 5): the balanced-byte count drops by
    one on BOTH sides. Greedy balanced base-256 in nd digits covers
    [-128*S, 127*S] with S = (256^nd - 1)/255. For Goldilocks, canonical
    values v > T = 127*(2^64-1)/255 (= 0x7F7F7F7F7F7F7F7F) are mapped to
    v - p — both branches then fit 8 digits (v <= T = +capacity;
    v - p > T - p = -9.2595e18 >= -128*S). The threshold is ASYMMETRIC
    because p/2 exceeds the positive capacity by ~0.4%. For BabyBear
    p - 1 < 127*(2^32-1)/255, so 4 digits cover the whole canonical
    range with no centering. MACs per (position, output) pair:
    GL 81 -> 64, BB 25 -> 16; one fewer recombine plane each."""
    if p == gl_ops.P:
        return 2, 8, 8      # centered 64-bit: 8 balanced signed bytes
    if p == bb_ops.P:
        return 1, 4, 4      # uncentered 31-bit: 4 balanced signed bytes
    raise ValueError(f"no MXU NTT for field modulus {p}")


# Goldilocks centering threshold: the exact positive capacity of 8
# balanced bytes, 127 * (2^64 - 1) / 255 = 0x7F7F7F7F7F7F7F7F.
_GL_CENTER_T = 127 * ((1 << 64) - 1) // 255


def factorize(n: int):
    """log2 factor list for n, each in [5, 9] (prefer <= F_PREF, balanced,
    descending). None if n unsupported."""
    L = n.bit_length() - 1
    if (1 << L) != n or L < 5:
        return None
    if L <= 9:
        return [L]
    k = -(-L // F_PREF)          # ceil
    if L < 5 * k:
        return None              # cannot happen for L >= 10
    base, rem = divmod(L, k)
    return [base + 1] * rem + [base] * (k - rem)


def supports(n: int) -> bool:
    return factorize(n) is not None


# ---------------------------------------------------------------------------
# Host-side table construction (cached per (p, root, F))
# ---------------------------------------------------------------------------


def _balanced_digits_u64(v: np.ndarray, nd: int) -> np.ndarray:
    """uint64 array -> (..., nd) int8 balanced base-256 digits."""
    v = v.astype(np.uint64).copy()
    out = np.zeros(v.shape + (nd,), dtype=np.int8)
    for b in range(nd):
        r = (v & np.uint64(255)).astype(np.int64)
        neg = r > 127
        r = np.where(neg, r - 256, r)
        v = (v >> np.uint64(8)) + neg.astype(np.uint64)
        out[..., b] = r.astype(np.int8)
    assert not v.any(), "digit count too small for value range"
    return out


def _balanced_digits_signed(v: np.ndarray, nd: int) -> np.ndarray:
    """object-int array (centered, possibly negative) -> (..., nd) int8
    balanced base-256 digits. Greedy balanced digits represent any
    |v| <= 2^(8*nd - 1) exactly; centered field values are far inside."""
    v = v.copy()
    out = np.zeros(v.shape + (nd,), dtype=np.int8)
    for b in range(nd):
        r = (v + 128) % 256 - 128          # exact object-int arithmetic
        out[..., b] = r.astype(np.int8)
        v = (v - r) // 256
    assert not v.any(), "digit count too small for centered value range"
    return out


@lru_cache(maxsize=None)
def _dft_digit_matrix(p: int, root: int, F: int):
    """(NA*F, NB*F) int8: row (a*F + m), col (b*F + k) holds
    digit_b(center(root^(m*k) * 256^a mod p)) -- plane-major on both
    sides so the traced code never interleaves digit and position axes;
    entries above the positive digit capacity are centered to v - p
    before digitizing (see _params)."""
    _, NA, NB = _params(p)
    row = np.empty(F, dtype=object)
    v = 1
    for k in range(F):
        row[k] = v
        v = (v * root) % p
    tbl = np.empty((F, F), dtype=object)
    tbl[0] = 1
    if F > 1:
        tbl[1] = row
    for m in range(2, F):
        tbl[m] = tbl[m - 1] * row % p
    digs = np.empty((NA, F, F, NB), dtype=np.int8)
    cap = 127 * ((1 << (8 * NB)) - 1) // 255   # positive digit capacity
    for a in range(NA):
        scaled = tbl * pow(256, a, p) % p if a else tbl
        centered = np.where(scaled > cap, scaled - p, scaled)
        digs[a] = _balanced_digits_signed(centered, NB)
    # (NA, F_m, F_k, NB) -> (NA, F_m, NB, F_k) -> (NA*F, NB*F)
    return np.transpose(digs, (0, 1, 3, 2)).reshape(NA * F, NB * F)


# recombination offset: R_b + OFF must be non-negative;
# |R_b| <= F*NA*128*128 < 2^27 for F <= 512
OFF = np.uint32(1 << 27)


@lru_cache(maxsize=None)
def _recombine_const(p: int) -> int:
    """sum_b OFF * 2^(8b) mod p -- subtracted after the offset accumulate."""
    _, _, NB = _params(p)
    return sum(int(OFF) << (8 * b) for b in range(NB)) % p


# ---------------------------------------------------------------------------
# Traced per-stage ops (planar: field arrays are tuples of u32 word planes)
# ---------------------------------------------------------------------------


def _digitize(planes, NA: int):
    """tuple of u32 planes -> (NA,) + shape int8 balanced byte digits
    stacked on a NEW LEADING axis (pure concatenation in memory -- no
    minor-axis interleave, no relayout).

    CENTERED (Goldilocks): canonical v > _GL_CENTER_T is mapped to v - p
    as a two's-complement wide subtract (see _params for why the
    threshold is the exact positive digit capacity, not p/2), then
    greedily digitized: x = sum_a d_a 256^a with d_a in [-128, 127] --
    the truncating u32->s8 cast of (byte + carry) IS the balanced digit,
    and the FINAL carry is dropped (for negative v_c the two's-complement
    wrap +2^64 is exactly the dropped carry's weight). BabyBear values
    fit 4 digits uncentered (final carry provably 0). NA = 8 for
    Goldilocks (2 words), 4 for BabyBear (1 word)."""
    if len(planes) == 2:
        lo, hi = planes
        H_LO = np.uint32(_GL_CENTER_T & 0xFFFFFFFF)
        H_HI = np.uint32(_GL_CENTER_T >> 32)
        P_LO = np.uint32(gl_ops.P & 0xFFFFFFFF)
        P_HI = np.uint32(gl_ops.P >> 32)
        big = (hi > H_HI) | ((hi == H_HI) & (lo > H_LO))
        borrow = (lo < P_LO).astype(U32)
        lo = jnp.where(big, lo - P_LO, lo)
        hi = jnp.where(big, hi - P_HI - borrow, hi)
        words = (lo, hi)
    else:
        words = planes
    c = jnp.zeros_like(words[0])
    digs = []
    for w in words:
        for i in range(4):
            t = ((w >> np.uint32(8 * i)) & np.uint32(255)) + c
            digs.append(t.astype(jnp.int8))
            c = (t > np.uint32(127)).astype(U32)
    assert len(digs) == NA
    return jnp.stack(digs, axis=0)


def _addc(a, b):
    s = a + b
    return s, (s < a).astype(U32)


def _accum_words(us):
    """Y = sum_b us[b] * 2^(8b) for us[b] < 2^28 -> three u32 words
    (Y < 2^28 * 2^64 * 256/255 < 2^96)."""
    zero = jnp.zeros_like(us[0])
    W = [zero, zero, zero]
    for b, u in enumerate(us):
        s = (8 * b) % 32
        j = (8 * b) // 32
        lo = (u << np.uint32(s)) if s else u
        hi = (u >> np.uint32(32 - s)) if s else None
        W[j], c = _addc(W[j], lo)
        if j + 1 < 3:
            add_hi = (hi + c) if hi is not None else c
            W[j + 1], c2 = _addc(W[j + 1], add_hi)
            if j + 2 < 3:
                W[j + 2] = W[j + 2] + c2
    return W


def _digit_planes(R, NB: int, F: int, PF: "int | None" = None):
    """(..., NB*PF) i32 matmul output -> NB offset u32 planes (..., F)
    (contiguous slices -- no strided gather). PF is the per-digit column
    stride: F for unpadded tables; 128 for the padded F=32 fused tables
    (Mosaic miscompiles 32-lane column slices at non-128-aligned offsets
    on real v5e -- scripts/tpu_f32_pad_probe.py; padding puts every slice
    start at b*128 while keeping width F)."""
    PF = F if PF is None else PF
    return [
        (R[..., b * PF:b * PF + F] + jnp.int32(OFF)).astype(U32)
        for b in range(NB)
    ]


def _recombine_gl(R, NB: int, F: int, kc: tuple, PF: "int | None" = None):
    """(..., NB*PF) i32 -> ((..., F) lo, hi) canonical Goldilocks planes."""
    W0, W1, W2 = _accum_words(_digit_planes(R, NB, F, PF))
    lo, hi = gl_ops._reduce128(W0, W1, W2, jnp.zeros_like(W2))
    klo, khi = kc
    return gl_ops.sub_planar(
        lo, hi,
        jnp.broadcast_to(klo, lo.shape), jnp.broadcast_to(khi, hi.shape),
    )


def _red32_bb(w):
    """u32 -> mod p (p > 2^30, so at most two conditional subtractions)."""
    P32 = bb_ops.P32
    w = jnp.where(w >= P32, w - P32, w)
    return jnp.where(w >= P32, w - P32, w)


def _recombine_bb(R, NB: int, F: int, kc, PF: "int | None" = None):
    """(..., NB*PF) i32 -> ((..., F),) canonical BabyBear plane.

    Y < 2^26 * 2^33 < 2^64: fold with 2^32 / 2^64 residues per word."""
    W0, W1, W2 = _accum_words(_digit_planes(R, NB, F, PF))
    p = bb_ops.P
    t32 = np.uint32((1 << 32) % p)
    t64 = np.uint32((1 << 64) % p)
    r0 = _red32_bb(W0)
    r1 = bb_ops.mul(_red32_bb(W1), jnp.broadcast_to(t32, W1.shape))
    r2 = bb_ops.mul(_red32_bb(W2), jnp.broadcast_to(t64, W2.shape))
    y = bb_ops.add(bb_ops.add(r0, r1), r2)
    return (bb_ops.sub(y, jnp.broadcast_to(np.uint32(kc), y.shape)),)


def _ntt_axis1(planes, Vd, NA: int, NB: int, kc):
    """Length-F DFT over AXIS 1 of each (B, F, rest...) plane, contracted in
    place by dot_general (the operand transpose rides the MXU feed -- no
    explicit relayout). Output planes are (B, rest..., F) with the new
    frequency axis MINOR; across levels the k-axes accumulate to the right.

    Vd: (NA, F, NB*F)."""
    F = Vd.shape[1]
    d = _digitize(planes, NA)                         # (NA, B, F, rest...)
    # fence: without it XLA splits the dot along the stacked digit axis into
    # NA partial dots, each streaming the full s32 accumulator through HBM
    d = jax.lax.optimization_barrier(d)
    R = jax.lax.dot_general(
        d, Vd, (((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                 # (B, rest..., NB*F)
    if len(planes) == 2:
        return _recombine_gl(R, NB, F, kc)
    return _recombine_bb(R, NB, F, kc)


def _mul_planes(planes, w_planes):
    """Elementwise field multiply of plane tuples (w broadcasts)."""
    if len(planes) == 2:
        wl = jnp.broadcast_to(w_planes[0], planes[0].shape)
        wh = jnp.broadcast_to(w_planes[1], planes[1].shape)
        return gl_ops.mul_planar(planes[0], planes[1], wl, wh)
    return (bb_ops.mul(planes[0], jnp.broadcast_to(w_planes[0], planes[0].shape)),)


# ---------------------------------------------------------------------------
# Fused Pallas level: digitize + int8 MXU dot + mod-p recombine (+ twiddle,
# + trailing scalar) in ONE VMEM-resident kernel. The XLA lowering of
# _ntt_axis1 streams the (NA, ...) digit stack and the (..., NB*F) s32
# accumulator through HBM between the VPU and MXU stages (~9x the payload
# each way); keeping them in VMEM leaves one read + one write of the field
# planes per level. Gated by MINISTARK_MXU_FUSED (see make_mxu_ntt_fns).
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def fused_supports(n: int) -> bool:
    """Fused Pallas levels for every MXU-supported size >= 2^14.

    F=32 (factor-5) levels need padded digit tables: Mosaic miscompiles the
    recombine's 32-lane column slices at non-128-aligned offsets on real
    v5e (~7.6% wrong lanes at n=2^17=[6,6,5]; root-caused by
    scripts/tpu_f32_pad_probe.py — the same level with digit planes padded
    to 128 columns is bit-exact). _build_tables pads those tables
    (PF=128), re-validated on hardware by scripts/tpu_fused_sweep.py."""
    f = factorize(n)
    return f is not None and n >= (1 << 14) and min(f) >= 5


def _make_fused_kernel(nl, NA, NB, F, rt, kc_np, has_tw, scalar_np,
                       has_pre, PF):
    """Kernel over one (F, rt) tile of positions: x planes -> out planes.

    ref order: nl x-planes, [nl coset-premultiply planes], Vd,
    [nl expanded (rt, F) twiddle planes], nl out-planes.

    PF: per-digit column stride of Vd (see _digit_planes — 128 for padded
    F=32 tables, F otherwise)."""

    def kernel(*refs):
        i = 0
        x_planes = tuple(refs[j][0] for j in range(nl))          # (F, rt)
        i = nl
        if has_pre:
            pre = tuple(refs[i + j][...] for j in range(nl))     # (F, rt)
            x_planes = _mul_planes(x_planes, pre)
            i += nl
        vd = refs[i][...]                                        # (NA*F, NB*F)
        i += 1
        tw_refs = None
        if has_tw:
            tw_refs = refs[i:i + nl]
            i += nl
        o_refs = refs[i:]

        d = _digitize(x_planes, NA).reshape(NA * F, rt)
        # no optimization_barrier here: the fence only matters for the XLA
        # lowering of _ntt_axis1 (HBM-split dots); Mosaic keeps everything
        # in VMEM and cannot lower the primitive (KernelType.TC rejects it)
        R = jax.lax.dot_general(
            d, vd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                        # (rt, NB*PF)
        if nl == 2:
            out = _recombine_gl(R, NB, F, kc_np, PF)
        else:
            out = _recombine_bb(R, NB, F, kc_np, PF)
        if has_tw:
            out = _mul_planes(out, tuple(r[...] for r in tw_refs))
        if scalar_np is not None:
            out = _mul_planes(
                out, tuple(jnp.full((1, 1), s, U32) for s in scalar_np)
            )
        for r, t in zip(o_refs, out):
            r[0] = t

    return kernel


def _fused_level(planes, Vd, NA, NB, kc_np, tw_flat, scalar_np,
                 interpret, pre=None):
    """One NTT level, fused: planes (B, F, rest...) -> (B, rest..., F).

    tw_flat: tuple of (R, F) u32 twiddle planes PRE-EXPANDED to one row per
    output row (row r = f*K_prod + k_idx uses twiddle row f; the expansion
    `repeat(tw, K_prod, axis=0)` happens once at construction in
    _build_tables) or None. Expanded rows keep every BlockSpec at
    (rt, F) — Mosaic requires last-two block dims divisible by (8, 128) or
    full, which the old rt//K_prod row blocks violated once K_prod > rt/8.
    pre: tuple of (n,) planes multiplied into the input before digitizing
    (coset scaling fused into level 0)."""
    nl = len(planes)
    B, F = planes[0].shape[0], planes[0].shape[1]
    R = planes[0].size // (B * F)
    rest = planes[0].shape[2:]
    rt = min(RT, R)
    xs = tuple(t.reshape(B, F, R) for t in planes)
    vd2 = Vd.reshape(-1, Vd.shape[-1])                           # (NA*F, NB*PF)
    PF = vd2.shape[-1] // NB                                     # column stride

    in_specs = [
        pl.BlockSpec((1, F, rt), lambda b, r: (b, 0, r),
                     memory_space=pltpu.VMEM)
        for _ in range(nl)
    ]
    args = list(xs)
    if pre is not None:
        for t in pre:
            in_specs.append(pl.BlockSpec(
                (F, rt), lambda b, r: (0, r), memory_space=pltpu.VMEM
            ))
            args.append(t.reshape(F, R))
    in_specs.append(
        pl.BlockSpec(vd2.shape, lambda b, r: (0, 0), memory_space=pltpu.VMEM)
    )
    args.append(vd2)
    if tw_flat is not None:
        for t in tw_flat:
            in_specs.append(pl.BlockSpec(
                (rt, F), lambda b, r: (r, 0), memory_space=pltpu.VMEM
            ))
            args.append(t)

    kern = _make_fused_kernel(nl, NA, NB, F, rt, kc_np, tw_flat is not None,
                              scalar_np, pre is not None, PF)
    out = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, R, F), jnp.uint32) for _ in range(nl)
        ),
        grid=(B, R // rt),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, rt, F), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(nl)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return tuple(t.reshape((B,) + rest + (F,)) for t in out)


def _make_pipe_kernel(nl, NA, NB, F, rt, kc_np, has_tw, scalar_np,
                      has_pre, PF, T, guards=True):
    """Skewed-pipeline twin of _make_fused_kernel: at grid step t the body
    digitizes tile t (VPU), matmuls tile t-1 (MXU) and recombines tile t-2
    (VPU), double-buffered through VMEM scratch. The three slices touch
    DIFFERENT buffers, so Mosaic's scheduler is free to overlap the MXU
    dot with the VPU stages instead of serializing them as the straight
    kernel's dataflow forces (the named 2.8x-off-bound gap,
    BENCHMARKS.md speed-of-light bullet 1). Grid axis 1 runs T+2 steps
    (two pipeline-drain steps); BlockSpec index maps clamp into range."""

    def kernel(*refs):
        i = 0
        x_refs = refs[:nl]
        i = nl
        pre_refs = None
        if has_pre:
            pre_refs = refs[i:i + nl]
            i += nl
        vd_ref = refs[i]
        i += 1
        tw_refs = None
        if has_tw:
            tw_refs = refs[i:i + nl]
            i += nl
        o_refs = refs[i:i + nl]
        i += nl
        d_buf = refs[i]          # (2, NA*F, rt) int8 scratch
        r_buf = refs[i + 1]      # (2, rt, NB*PF) int32 scratch

        t = pl.program_id(1)

        def _dig():
            x_planes = tuple(r[0] for r in x_refs)
            if has_pre:
                x_planes = _mul_planes(
                    x_planes, tuple(r[...] for r in pre_refs))
            d_buf[t % 2] = _digitize(x_planes, NA).reshape(NA * F, rt)

        def _dot():
            r_buf[(t - 1) % 2] = jax.lax.dot_general(
                d_buf[(t - 1) % 2], vd_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        def _rec():
            R = r_buf[(t - 2) % 2]
            if nl == 2:
                out = _recombine_gl(R, NB, F, kc_np, PF)
            else:
                out = _recombine_bb(R, NB, F, kc_np, PF)
            if has_tw:
                out = _mul_planes(out, tuple(r[...] for r in tw_refs))
            if scalar_np is not None:
                out = _mul_planes(
                    out, tuple(jnp.full((1, 1), s, U32) for s in scalar_np)
                )
            for r, v in zip(o_refs, out):
                r[0] = v

        if guards:
            pl.when(t < T)(_dig)
            pl.when((t >= 1) & (t <= T))(_dot)
            pl.when(t >= 2)(_rec)
        else:
            # guard-free: every stage runs every step. The prologue/epilogue
            # work is garbage-on-garbage — the dot reads an uninitialized
            # d_buf slot at t=0, the recombine writes garbage to out block 0
            # at t<2 — but the clamped out index map revisits block 0 until
            # t=2 writes the real tile, and Pallas only flushes an out
            # block when its index CHANGES (t=3). One basic block gives the
            # Mosaic scheduler maximal freedom to overlap MXU and VPU work
            # (the @pl.when regions serialize as control-flow boundaries).
            _dig()
            _dot()
            _rec()

    return kernel


def _fused_level_pipe(planes, Vd, NA, NB, kc_np, tw_flat, scalar_np,
                      interpret, pre=None):
    """Pipelined _fused_level: same signature/semantics, skewed grid."""
    nl = len(planes)
    B, F = planes[0].shape[0], planes[0].shape[1]
    R = planes[0].size // (B * F)
    rest = planes[0].shape[2:]
    rt = min(RT, R)
    T = R // rt
    xs = tuple(t.reshape(B, F, R) for t in planes)
    vd2 = Vd.reshape(-1, Vd.shape[-1])
    PF = vd2.shape[-1] // NB

    def clamp_in(b, t):
        return (b, 0, jnp.minimum(t, T - 1))

    def clamp_row(b, t):
        return (jnp.clip(t - 2, 0, T - 1), 0)

    def clamp_out(b, t):
        return (b, jnp.clip(t - 2, 0, T - 1), 0)

    in_specs = [
        pl.BlockSpec((1, F, rt), clamp_in, memory_space=pltpu.VMEM)
        for _ in range(nl)
    ]
    args = list(xs)
    if pre is not None:
        for t_ in pre:
            in_specs.append(pl.BlockSpec(
                (F, rt), lambda b, t: (0, jnp.minimum(t, T - 1)),
                memory_space=pltpu.VMEM,
            ))
            args.append(t_.reshape(F, R))
    in_specs.append(
        pl.BlockSpec(vd2.shape, lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(vd2)
    if tw_flat is not None:
        for t_ in tw_flat:
            in_specs.append(pl.BlockSpec(
                (rt, F), clamp_row, memory_space=pltpu.VMEM
            ))
            args.append(t_)

    kern = _make_pipe_kernel(
        nl, NA, NB, F, rt, kc_np, tw_flat is not None,
        scalar_np, pre is not None, PF, T,
        guards=os.environ.get("MINISTARK_MXU_PIPE", "0") != "2",
    )
    out = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, R, F), jnp.uint32) for _ in range(nl)
        ),
        grid=(B, T + 2),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, rt, F), clamp_out, memory_space=pltpu.VMEM)
            for _ in range(nl)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NA * F, rt), jnp.int8),
            pltpu.VMEM((2, rt, NB * PF), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return tuple(t.reshape((B,) + rest + (F,)) for t in out)


def _mxu_core_fused(planes, factors, v_mats, tws_flat, NA, NB, kc_np,
                    scalar_np, interpret, pre=None):
    """Fused-kernel twin of _mxu_core: same factor walk, one pallas_call per
    level (coset pre-scale, twiddle and any trailing scalar all ride the
    level kernels). MINISTARK_MXU_PIPE=1 (trace-time) swaps in the
    skewed-pipeline level kernel (_fused_level_pipe)."""
    level_fn = (_fused_level_pipe
                if os.environ.get("MINISTARK_MXU_PIPE", "0") in ("1", "2")
                else _fused_level)
    B = planes[0].shape[0]
    n = planes[0].shape[1]
    Fs = [1 << lf for lf in factors]
    k = len(Fs)
    planes = tuple(t.reshape((B,) + tuple(Fs)) for t in planes)
    for lvl in range(k):
        last = lvl == k - 1
        planes = level_fn(
            planes, v_mats[lvl], NA, NB, kc_np, tws_flat[lvl],
            scalar_np if last else None, interpret,
            pre=pre if lvl == 0 else None,
        )
    perm = (0,) + tuple(range(k, 0, -1))
    return tuple(jnp.transpose(t, perm).reshape(B, n) for t in planes)


# ---------------------------------------------------------------------------
# Full transform: recursive four-step over the factor list
# ---------------------------------------------------------------------------


def _mxu_core(planes, factors, v_mats, tws, NA, NB, kc):
    """planes: tuple of (B, n) u32 planes, natural order -> NTT planes.

    Recursive four-step (i = i1 + M*i2, k = k2 + F*k1):
      X[k2 + F*k1] = sum_i1 w1^(i1*k1) [w^(i1*k2) sum_i2 x[i1+M*i2] w2^(i2*k2)]
    flattened into one loop over factors: reshape x to (B, F1, ..., Fk)
    (axis j = level-j decimation index), contract each level's axis in
    place with _ntt_axis1, apply that level's twiddle (tables pre-shaped to
    the surviving axes), and finish with ONE axis-reversing transpose
    (frequency index k = K1 + F1*(K2 + F2*(...)) => natural order is
    (Kk, ..., K1) row-major)."""
    B = planes[0].shape[0]
    n = planes[0].shape[1]
    Fs = [1 << lf for lf in factors]
    k = len(Fs)
    planes = tuple(t.reshape((B,) + tuple(Fs)) for t in planes)
    for lvl in range(k):
        planes = _ntt_axis1(planes, v_mats[lvl], NA, NB, kc)
        if tws[lvl] is not None:
            planes = _mul_planes(planes, tuple(w[None] for w in tws[lvl]))
        # fence the level: chained fused field muls re-execute producers
        planes = tuple(jax.lax.optimization_barrier(t) for t in planes)
    perm = (0,) + tuple(range(k, 0, -1))
    return tuple(jnp.transpose(t, perm).reshape(B, n) for t in planes)


def _build_tables(field, n: int, root: int):
    """Device tables for one direction:
    (factors, v_mats, twiddle planes, flat twiddle planes, padded v_mats).

    v_pads[i]: the fused-kernel twin of v_mats[i] — for F < 64 the digit
    columns are zero-padded to a 128 stride ((NA, F, NB*128), slices start
    at b*128) because Mosaic miscompiles 32-lane column slices at
    non-128-aligned offsets on real v5e (scripts/tpu_f32_pad_probe.py);
    F >= 64 levels are hardware-validated unpadded and alias v_mats[i].

    v_mats[i]: (NA, F_i, NB*F_i) digit matrix. tws[i]: plane tuple shaped
    (F_{i+1}, ..., F_{k-1}) + (1,)*i + (F_i,) -- the level-i twiddle
    w^(i1*K) laid out over the axes that survive level i (the (1,)*i block
    broadcasts over the already-produced K_0..K_{i-1} axes). tws_flat[i]:
    the same table expanded HERE to (R_i, F_i) planes -- one row per level
    output row -- via repeat(W, K_prod, axis=0) with K_prod = prod of the
    already-transformed factors F_0..F_{i-1} (level-i output row
    r = i1*K_prod + k_idx uses twiddle row i1 = r // K_prod). This is what
    lets every fused-level BlockSpec stay (rt, F) at index (r, 0)."""
    ops = _field_ops(field)
    p = field.p
    limbs, NA, NB = _params(p)
    factors = factorize(n)
    Fs = [1 << lf for lf in factors]
    v_mats, tws, tws_flat, v_pads = [], [], [], []
    rem = n
    r = root
    k_prod = 1                                # prod of transformed factors
    for i, F in enumerate(Fs):
        M = rem // F
        root_f = pow(r, M, p)                 # w2 = w^M, order F
        vd = _dft_digit_matrix(p, root_f, F)
        v_mats.append(jnp.asarray(vd.reshape(NA, F, NB * F)))
        if F < 64:
            PF = 128
            vdp = np.zeros((NA * F, NB, PF), dtype=np.int8)
            vdp[:, :, :F] = vd.reshape(NA * F, NB, F)
            v_pads.append(jnp.asarray(vdp.reshape(NA, F, NB * PF)))
        else:
            v_pads.append(v_mats[-1])
        if i < len(Fs) - 1:
            r_packed = jnp.asarray(ops.pack([r])[0])
            W = jax.jit(
                lambda rp, M=M, F=F: _twiddle_matrix(ops, rp, M, F)
            )(r_packed)                       # (M, F[, limbs]) interleaved
            ts = tuple(Fs[i + 1:]) + (1,) * i + (F,)

            def _expand(plane):               # (M, F) -> (M*K_prod, F)
                if k_prod == 1:
                    return plane
                return jnp.repeat(plane, k_prod, axis=0)

            if limbs == 2:
                tws.append((W[..., 0].reshape(ts), W[..., 1].reshape(ts)))
                tws_flat.append((_expand(W[..., 0]), _expand(W[..., 1])))
            else:
                tws.append((W.reshape(ts),))
                tws_flat.append((_expand(W),))
            r = pow(r, F, p)                  # w1 = w^F, order M
        else:
            tws.append(None)
            tws_flat.append(None)
        rem = M
        k_prod *= F
    return factors, v_mats, tws, tws_flat, v_pads


def make_mxu_ntt_fns(field, n: int):
    """(fft, ifft, coset_fft, coset_ifft) matching ops/ntt_device signatures:
    (batch, n[, limbs]) uint32 arrays, natural order in and out."""
    assert supports(n), f"MXU NTT unsupported for n={n}"
    ops = _field_ops(field)
    p = field.p
    limbs, NA, NB = _params(p)
    root = int(field.get_root_of_unity(n))
    root_inv = int(field.inv(root))
    n_inv = int(field.inv(field.from_int(n)))

    factors, v_f, tw_f, twf_f, vp_f = _build_tables(field, n, root)
    _, v_i, tw_i, twf_i, vp_i = _build_tables(field, n, root_inv)
    if limbs == 2:
        kp = gl_ops.pack([_recombine_const(p)])[0]
        kc = (jnp.asarray(kp[0]), jnp.asarray(kp[1]))
        kc_np = (np.uint32(kp[0]), np.uint32(kp[1]))
        nip = gl_ops.pack([n_inv])[0]
        n_inv_planes = (jnp.asarray(nip[0]), jnp.asarray(nip[1]))
        n_inv_np = (np.uint32(nip[0]), np.uint32(nip[1]))
    else:
        kc = int(_recombine_const(p))
        kc_np = np.uint32(kc)
        n_inv_planes = (jnp.asarray(np.uint32(n_inv)),)
        n_inv_np = (np.uint32(n_inv),)

    # default "auto": fused Pallas levels on real TPU (validated bit-exact
    # on hardware at 2^20/2^21, round 3), XLA lowering elsewhere; tests
    # force "1" to run the kernels in interpret mode on CPU.
    env = os.environ.get("MINISTARK_MXU_FUSED", "auto")
    use_fused = fused_supports(n) and (
        env == "1" or (env == "auto" and _on_tpu())
    )
    interpret = not _on_tpu()

    def to_planes(x):
        if limbs == 2:
            return (x[..., 0], x[..., 1])
        return (x,)

    def from_planes(planes):
        if limbs == 2:
            return jnp.stack(planes, axis=-1)
        return planes[0]

    if use_fused:
        def core_fwd(planes, pre=None):
            return _mxu_core_fused(planes, factors, vp_f, twf_f, NA, NB,
                                   kc_np, None, interpret, pre=pre)

        def core_inv(planes):   # n_inv rides the last level's kernel
            return _mxu_core_fused(planes, factors, vp_i, twf_i, NA, NB,
                                   kc_np, n_inv_np, interpret)
    else:
        def core_fwd(planes, pre=None):
            if pre is not None:
                planes = _mul_planes(planes, tuple(t[None] for t in pre))
            return _mxu_core(planes, factors, v_f, tw_f, NA, NB, kc)

        def core_inv(planes):
            y = _mxu_core(planes, factors, v_i, tw_i, NA, NB, kc)
            return _mul_planes(y, n_inv_planes)

    @jax.jit
    def fft(x):
        return from_planes(core_fwd(to_planes(x)))

    @jax.jit
    def ifft(x):
        return from_planes(core_inv(to_planes(x)))

    @jax.jit
    def coset_fft(x, offset):
        pw = _powers(ops, offset, n)          # (n[, limbs]) interleaved
        return from_planes(core_fwd(to_planes(x), pre=to_planes(pw)))

    @jax.jit
    def coset_ifft(x, offset_inv):
        y = core_inv(to_planes(x))
        pw = _powers(ops, offset_inv, n)
        return from_planes(_mul_planes(y, to_planes(pw[None])))

    return fft, ifft, coset_fft, coset_ifft
