"""Stage-cost breakdown of one fused MXU-NTT level on real TPU.

The fused level (ops/ntt_mxu._fused_level) runs three stages serially per
grid step: digitize (VPU) -> int8 dot (MXU) -> recombine+twiddle (VPU).
VERDICT r4 item 2 says the 2.8x-off-bound gap is the VPU stages running
serially with the MXU dot. This probe times each stage in isolation (as
stage-only Pallas kernels over the same tiles) plus the full level, by
slope (bench_kernels._time_chained), to size the overlap headroom:

    max(stage_sum - max_stage, 0) = the most a perfect pipeline can hide.

Run on the TPU (default backend). LVL_N chooses the transform size.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_kernels import _time_chained
from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import ntt_mxu as M
from ministark_tpu.ops.u32 import U32

F = GOLDILOCKS_FP
n = int(os.environ.get("LVL_N", str(1 << 20)))
B = 2
root = int(F.get_root_of_unity(n))
limbs, NA, NB = M._params(F.p)
factors, v_mats, tws, tws_flat, v_pads = M._build_tables(F, n, root)
kp = M.gl_ops.pack([M._recombine_const(F.p)])[0]
kc_np = (np.uint32(kp[0]), np.uint32(kp[1]))
Fs = [1 << lf for lf in factors]
lvl = int(os.environ.get("LVL_IDX", "0"))
Ff = Fs[lvl]
print(f"n=2^{n.bit_length()-1} factors={factors} level={lvl} F={Ff}",
      flush=True)

rng = np.random.default_rng(7)
shape = (B,) + tuple(Fs[lvl:]) + tuple(Fs[:lvl])
v = rng.integers(0, F.p, size=shape, dtype=np.uint64)
planes = (jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32)),
          jnp.asarray((v >> 32).astype(np.uint32)))

Vd = v_pads[lvl]
vd2 = np.asarray(Vd).reshape(-1, Vd.shape[-1])
PF = vd2.shape[-1] // NB
tw = tws_flat[lvl]
R = planes[0].size // (B * Ff)
rt = min(M.RT, R)
T = R // rt
print(f"R={R} rt={rt} tiles/batch={T}", flush=True)


def _stage_call(kern, extra_specs=(), extra_args=(), n_out=2,
                out_shape=None, out_spec=None):
    in_specs = [
        pl.BlockSpec((1, Ff, rt), lambda b, r: (b, 0, r),
                     memory_space=pltpu.VMEM)
        for _ in range(2)
    ] + list(extra_specs)
    xs = tuple(t.reshape(B, Ff, R) for t in planes)
    if out_shape is None:
        out_shape = jax.ShapeDtypeStruct((B, R, Ff), jnp.uint32)
        out_spec = pl.BlockSpec((1, rt, Ff), lambda b, r: (b, r, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape for _ in range(n_out)),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=tuple(out_spec for _ in range(n_out)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*xs, *extra_args)


results = {}

# --- full level (the production kernel) ---
def run_full(pl_in):
    out = M._fused_level(pl_in, Vd, NA, NB, kc_np, tw, None,
                         interpret=False)
    # feed back at the input shape for chaining
    return tuple(t.reshape(pl_in[0].shape) for t in out)

results["full_level"] = _time_chained(run_full, planes)
print(f"full_level: {results['full_level']}", flush=True)

# --- digitize-only: d = digitize(x); out = cheap projection of d ---
def kern_dig(x0, x1, o0, o1):
    d = M._digitize((x0[0], x1[0]), NA).reshape(NA * Ff, rt)
    # cheap projection: one (rt, Ff) slice per output plane (no dot,
    # no recombine) — transposed slice shape matches the out block
    o0[0] = d[:Ff, :rt].astype(U32).T
    o1[0] = d[NA * Ff - Ff:, :rt].astype(U32).T


def run_dig(pl_in):
    out = _stage_call(kern_dig)
    return tuple(t.reshape(pl_in[0].shape) for t in out)

results["digitize_only"] = _time_chained(run_dig, planes)
print(f"digitize_only: {results['digitize_only']}", flush=True)

# --- dot-only: pre-digitized input, s32 dot, cheap projection out ---
dpre = np.asarray(
    rng.integers(-128, 128, size=(B, NA * Ff, R), dtype=np.int64)
).astype(np.int8)
dpre_j = jnp.asarray(dpre)


def kern_dot(dref, vref, o0, o1):
    Rm = jax.lax.dot_general(
        dref[0].T, vref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                   # (rt, NB*PF)
    o0[0] = Rm[:, :Ff].astype(U32)
    o1[0] = Rm[:, PF:PF + Ff].astype(U32)


def run_dot(d):
    out = pl.pallas_call(
        kern_dot,
        out_shape=tuple(jax.ShapeDtypeStruct((B, R, Ff), jnp.uint32)
                        for _ in range(2)),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, NA * Ff, rt), lambda b, r: (b, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vd2.shape, lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, rt, Ff), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(d, jnp.asarray(vd2))
    # data-dependent chain: perturb one scalar of d with the output
    return d.at[0, 0, 0].set(out[0][0, 0, 0].astype(jnp.int8))


results["dot_only"] = _time_chained(run_dot, dpre_j)
print(f"dot_only: {results['dot_only']}", flush=True)

# --- recombine-only: pre-made s32 R tiles -> recombine + twiddle ---
Rpre = jnp.asarray(rng.integers(
    -(1 << 26), 1 << 26, size=(B, R, NB * PF), dtype=np.int64
).astype(np.int32))


def kern_rec(rref, t0, t1, o0, o1):
    Rm = rref[0]                         # (rt, NB*PF)
    out = M._recombine_gl(Rm, NB, Ff, kc_np, PF)
    out = M._mul_planes(out, (t0[...], t1[...]))
    o0[0], o1[0] = out


def run_rec(rr):
    out = pl.pallas_call(
        kern_rec,
        out_shape=tuple(jax.ShapeDtypeStruct((B, R, Ff), jnp.uint32)
                        for _ in range(2)),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, rt, NB * PF), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, Ff), lambda b, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, Ff), lambda b, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, rt, Ff), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rr, tw[0], tw[1])
    return rr + out[0][..., :1].astype(jnp.int32)


results["recombine_twiddle_only"] = _time_chained(run_rec, Rpre)

for k, t in results.items():
    print(f"{k}: {None if t is None else round(t * 1e3, 3)} ms", flush=True)
if all(v is not None for v in results.values()):
    s = (results["digitize_only"] + results["dot_only"]
         + results["recombine_twiddle_only"])
    print(f"stage sum {s*1e3:.3f} ms vs full {results['full_level']*1e3:.3f}"
          f" ms; perfect-overlap floor ~"
          f"{max(results['digitize_only'], results['dot_only'], results['recombine_twiddle_only'])*1e3:.3f} ms",
          flush=True)
