"""VMEM-resident four-step NTT as Pallas TPU kernels.

The four-step factorization n = n1*n2 views coefficients x[i2*n1 + i1] as an
(n2, n1) row-major matrix and computes

  X[k2 + n2*k1] = sum_i1 w^(i1*k2) * w1^(i1*k1) * [sum_i2 A[i2,i1] w2^(i2*k2)]

with w of order n, w1 = w^n2 (order n1), w2 = w^n1 (order n2). Two Pallas
passes, each keeping a full transform column-block resident in VMEM:

  pass 1: for each lane tile of i1 columns, ALL log2(n2) DIT butterfly
          stages over the leading axis (lanes = independent columns, so the
          VPU never shuffles within a lane), then the inter-pass twiddle
          w^(i1*k2) built IN VMEM by a product ladder (never touches HBM);
  pass 2: reads row tiles of the pass-1 output, transposes them in VMEM,
          and runs all log2(n1) DIF stages.

Ordering is arranged so no in-kernel permutation is ever needed: pass 1 is
decimation-in-time (its bit-reversed input row order is folded into the one
XLA prep gather), pass 2 is decimation-in-frequency (its bit-reversed output
row order is folded into the one XLA finish gather). HBM traffic is ~5
read+write passes of the array total, vs log2(n) passes for the stage-by-
stage XLA path (ops/ntt_device.py) — this is the ">=80% of roofline"
BASELINE item for the LDE-NTT (reference hot spot: ark-poly fft, used at
/root/reference/src/air.rs:147-160, src/starks.rs:82-91, src/fri.rs:345-352).

Field elements are limb-PLANAR here: (limbs, batch, n) uint32 planes
(Goldilocks limbs=2, BabyBear limbs=1), because a trailing (..., 2) limb axis
would waste 64x of every (8, 128) TPU tile (round-1 lesson,
ops/pallas_kernels.py). Conversion to the engine's (batch, n, limbs)
interleaved layout rides the prep/finish gathers.

Bit-exact with ops/ntt_device.get_ntt_fns (tests/test_ntt_pallas.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bb as bb_ops
from . import gl as gl_ops
from .ntt_device import _bitrev_indices, _field_ops, _powers

TL = 128                 # lane-tile width
PALLAS_MIN = 1 << 14     # below this the fori/four-step XLA paths win
PALLAS_MAX = 1 << 22     # above this the per-pass VMEM block exceeds budget


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


class _Planar:
    """Field ops over tuples of per-limb uint32 arrays."""

    def __init__(self, field):
        if field.p == gl_ops.P:
            self.nlimbs = 2
            self._gl = True
        elif field.p == bb_ops.P:
            self.nlimbs = 1
            self._gl = False
        else:
            raise ValueError(f"no planar kernels for modulus {field.p}")

    def add(self, a, b):
        if self._gl:
            return gl_ops.add_planar(a[0], a[1], b[0], b[1])
        return (bb_ops.add(a[0], b[0]),)

    def sub(self, a, b):
        if self._gl:
            return gl_ops.sub_planar(a[0], a[1], b[0], b[1])
        return (bb_ops.sub(a[0], b[0]),)

    def mul(self, a, b):
        if self._gl:
            return gl_ops.mul_planar(a[0], a[1], b[0], b[1])
        return (bb_ops.mul(a[0], b[0]),)

    def one_like(self, shape):
        if self._gl:
            return (jnp.ones(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))
        return (jnp.ones(shape, jnp.uint32),)


def _split_sizes(n: int):
    """(n1, n2) with n = n1*n2, n2 <= n1, both multiples of TL."""
    log_n = n.bit_length() - 1
    n2 = 1 << (log_n // 2)
    n1 = n // n2
    return n1, n2


def supports(n: int) -> bool:
    if n < PALLAS_MIN or n > PALLAS_MAX:
        return False
    n1, n2 = _split_sizes(n)
    return n1 % TL == 0 and n2 % TL == 0


@lru_cache(maxsize=None)
def _stage_table_host(p: int, root: int, m: int):
    """(log2(m), m//2) twiddle table; row r holds w^(j << (L-1-r)) for
    j < 2^r (the stage with butterfly half-width 2^r), zero-padded."""
    L = m.bit_length() - 1
    out = np.zeros((L, m // 2), dtype=object)
    for r in range(L):
        h = 1 << r
        step = pow(root, 1 << (L - 1 - r), p)
        v = 1
        for j in range(h):
            out[r, j] = v
            v = (v * step) % p
    return out


def _pack_planar_table(ops, table_obj) -> np.ndarray:
    """object-int ndarray -> (limbs,) + shape uint32 planes."""
    packed = ops.pack(table_obj)          # shape + (limbs,) or shape
    a = np.asarray(packed, dtype=np.uint32)
    if a.ndim == table_obj.ndim:          # single-limb field
        return a[None]
    return np.moveaxis(a, -1, 0)


def _butterfly_dit(P: _Planar, x, tw_ref, L: int, n: int, lanes: int):
    """All DIT stages over the leading axis; x: tuple of (n, lanes),
    bit-reversed row order in, natural order out."""
    for s in range(1, L + 1):
        h = 1 << (s - 1)
        g = n >> s
        xr = tuple(t.reshape(g, 2, h, lanes) for t in x)
        u = tuple(t[:, 0] for t in xr)
        v = tuple(t[:, 1] for t in xr)
        tw = tuple(tw_ref[i, s - 1, :h].reshape(1, h, 1)
                   for i in range(P.nlimbs))
        wv = P.mul(v, tuple(jnp.broadcast_to(t, v[0].shape) for t in tw))
        top = P.add(u, wv)
        bot = P.sub(u, wv)
        x = tuple(
            jnp.concatenate([a, b], axis=1).reshape(n, lanes)
            for a, b in zip(top, bot)
        )
    return x


def _butterfly_dif(P: _Planar, x, tw_ref, L: int, n: int, lanes: int):
    """All DIF stages over the leading axis; natural order in, bit-reversed
    row order out."""
    for s in range(L, 0, -1):
        h = 1 << (s - 1)
        g = n >> s
        xr = tuple(t.reshape(g, 2, h, lanes) for t in x)
        u = tuple(t[:, 0] for t in xr)
        v = tuple(t[:, 1] for t in xr)
        tw = tuple(tw_ref[i, s - 1, :h].reshape(1, h, 1)
                   for i in range(P.nlimbs))
        top = P.add(u, v)
        diff = P.sub(u, v)
        bot = P.mul(diff, tuple(jnp.broadcast_to(t, diff[0].shape) for t in tw))
        x = tuple(
            jnp.concatenate([a, b], axis=1).reshape(n, lanes)
            for a, b in zip(top, bot)
        )
    return x


def _pow_ladder(P: _Planar, base, n: int):
    """T[k] = base^k for k < n; base: tuple of (1, lanes). Built by
    doubling: rows [m, 2m) = rows [0, m) * base^m — O(n) muls, all in VMEM."""
    lanes = base[0].shape[-1]
    T = P.one_like((1, lanes))
    pm = base
    m = 1
    while m < n:
        grown = P.mul(T, tuple(jnp.broadcast_to(t, (m, lanes)) for t in pm))
        T = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(T, grown))
        pm = P.mul(pm, pm)
        m *= 2
    return T


def _make_pass1_kernel(P: _Planar, L2: int, n2: int):
    def kernel(x_ref, tw_ref, wpow_ref, o_ref):
        x = tuple(x_ref[i, 0] for i in range(P.nlimbs))         # (n2, TL)
        x = _butterfly_dit(P, x, tw_ref, L2, n2, TL)
        # inter-pass twiddle w^(i1*k2): ladder over the per-lane base w^i1
        base = tuple(wpow_ref[i, 0:1, :] for i in range(P.nlimbs))  # (1, TL)
        T = _pow_ladder(P, base, n2)                             # (n2, TL)
        x = P.mul(x, T)
        for i in range(P.nlimbs):
            o_ref[i, 0] = x[i]

    return kernel


def _make_pass2_kernel(P: _Planar, L1: int, n1: int):
    def kernel(x_ref, tw_ref, o_ref):
        # block (limbs, 1, TL, n1): TL rows of k2, all i1 — transpose in VMEM
        x = tuple(x_ref[i, 0].T for i in range(P.nlimbs))        # (n1, TL)
        x = _butterfly_dif(P, x, tw_ref, L1, n1, TL)
        for i in range(P.nlimbs):
            o_ref[i, 0] = x[i]

    return kernel


def _make_passes(field, n: int, root: int):
    """Jitted planar transform (limbs, batch, n) -> (limbs, batch, n) for a
    given root of order n (forward or inverse)."""
    ops = _field_ops(field)
    P = _Planar(field)
    p = field.p
    n1, n2 = _split_sizes(n)
    L1, L2 = n1.bit_length() - 1, n2.bit_length() - 1
    nl = P.nlimbs

    root1 = pow(root, n2, p)
    root2 = pow(root, n1, p)
    tw2 = jnp.asarray(_pack_planar_table(ops, _stage_table_host(p, root2, n2)))
    tw1 = jnp.asarray(_pack_planar_table(ops, _stage_table_host(p, root1, n1)))
    wrow = np.zeros((1, n1), dtype=object)
    v = 1
    for i in range(n1):
        wrow[0, i] = v
        v = (v * root) % p
    wpow = jnp.asarray(_pack_planar_table(ops, wrow))            # (nl, 1, n1)
    rev1 = jnp.asarray(_bitrev_indices(n1))
    rev2 = jnp.asarray(_bitrev_indices(n2))

    interpret = not _on_tpu()
    k1 = _make_pass1_kernel(P, L2, n2)
    k2 = _make_pass2_kernel(P, L1, n1)
    # The unrolled stage chain holds several block-sized temporaries live at
    # once; the default 16 MB scoped-vmem budget is too tight for 1-2 MB
    # blocks (v5e has 128 MB VMEM per core).
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def pass1(a, tw2_, wpow_):
        batch = a.shape[1]
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((nl, batch, n2, n1), jnp.uint32),
            grid=(batch, n1 // TL),
            in_specs=[
                pl.BlockSpec((nl, 1, n2, TL), lambda b, t: (0, b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, L2, n2 // 2), lambda b, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, 1, TL), lambda b, t: (0, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nl, 1, n2, TL), lambda b, t: (0, b, 0, t),
                                   memory_space=pltpu.VMEM),
            compiler_params=cparams,
            interpret=interpret,
        )(a, tw2_, wpow_)

    def pass2(c, tw1_):
        batch = c.shape[1]
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((nl, batch, n1, n2), jnp.uint32),
            grid=(batch, n2 // TL),
            in_specs=[
                pl.BlockSpec((nl, 1, TL, n1), lambda b, t: (0, b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, L1, n1 // 2), lambda b, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nl, 1, n1, TL), lambda b, t: (0, b, 0, t),
                                   memory_space=pltpu.VMEM),
            compiler_params=cparams,
            interpret=interpret,
        )(c, tw1_)

    def transform(xp, tw1_, tw2_, wpow_, rev1_, rev2_):
        batch = xp.shape[1]
        a = xp.reshape(nl, batch, n2, n1)[:, :, rev2_, :]
        c = pass1(a, tw2_, wpow_)
        d = pass2(c, tw1_)
        return d[:, :, rev1_, :].reshape(nl, batch, n)

    def run(xp):
        return transform(xp, tw1, tw2, wpow, rev1, rev2)

    return run


def make_pallas_ntt_fns(field, n: int):
    """(fft, ifft, coset_fft, coset_ifft) matching ops/ntt_device signatures:
    (batch, n[, limbs]) interleaved uint32 arrays, natural order.

    Each entry point is ONE jitted computation end to end (layout conversion,
    coset scaling, both Pallas passes): stray eager ops cost a tunnel
    dispatch each in this environment, which dwarfed the kernels themselves
    (~4 ms per eager moveaxis vs ~26 us per Pallas pass at 2^20)."""
    assert supports(n), f"pallas four-step unsupported for n={n}"
    ops = _field_ops(field)
    P = _Planar(field)
    nl = P.nlimbs
    root = field.get_root_of_unity(n)
    root_inv = field.inv(root)
    fwd = _make_passes(field, n, int(root))
    inv = _make_passes(field, n, int(root_inv))
    n_inv_packed = jnp.asarray(ops.pack([field.inv(field.from_int(n))])[0])

    def to_planar(x):
        if nl == 1:
            return x[None]
        return jnp.moveaxis(x, -1, 0)       # (2, batch, n)

    def from_planar(y):
        if nl == 1:
            return y[0]
        return jnp.moveaxis(y, 0, -1)       # (batch, n, 2)

    @jax.jit
    def _fft(x):
        return from_planar(fwd(to_planar(x)))

    @jax.jit
    def _ifft(x, n_inv_):
        y = from_planar(inv(to_planar(x)))
        return ops.mul(y, jnp.broadcast_to(n_inv_, y.shape))

    @jax.jit
    def _coset_fft(x, offset):
        pw = _powers(ops, offset, x.shape[1])
        return from_planar(fwd(to_planar(ops.mul(x, pw[None]))))

    @jax.jit
    def _coset_ifft(x, offset_inv, n_inv_):
        y = from_planar(inv(to_planar(x)))
        y = ops.mul(y, jnp.broadcast_to(n_inv_, y.shape))
        pw = _powers(ops, offset_inv, x.shape[1])
        return ops.mul(y, pw[None])

    def fft(x):
        return _fft(x)

    def ifft(x):
        return _ifft(x, n_inv_packed)

    def coset_fft(x, offset):
        return _coset_fft(x, offset)

    def coset_ifft(x, offset_inv):
        return _coset_ifft(x, offset_inv, n_inv_packed)

    return fft, ifft, coset_fft, coset_ifft
