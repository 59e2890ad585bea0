"""Diagnostic probe for the Mosaic F=32 fused-level miscompile.

Hypothesis A: the wrong lanes come from the recombine's 32-lane column
slices at non-128-aligned offsets (R[..., b*32:(b+1)*32]). This probe pads
each digit plane's columns to 128 (Vd scattered into (NA*F, NB*128), slices
at b*128, width still 32) and bit-checks one F=32 level against interpret
mode on the real chip.

PASS  -> offset alignment is the culprit; the padded-table fix can re-enable
         2^17 in fused_supports (at 4x MXU cost on that level only).
FAIL  -> the 32-wide slices or the (…, 32)-minor output layout are the
         problem; keep the factor-5 exclusion.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import gl as gl_ops
from ministark_tpu.ops import ntt_mxu as M
from ministark_tpu.ops.u32 import U32

F_ = GOLDILOCKS_FP
p = F_.p
limbs, NA, NB = M._params(p)
Fq = 32
PF = 128
root_f = int(F_.pow(F_.get_root_of_unity(Fq), 1))
vd = M._dft_digit_matrix(p, root_f, Fq)          # (NA*F, NB*F) int8
vd3 = vd.reshape(NA * Fq, NB, Fq)
vd_pad = np.zeros((NA * Fq, NB, PF), dtype=np.int8)
vd_pad[:, :, :Fq] = vd3
vd_pad = vd_pad.reshape(NA * Fq, NB * PF)

kp = gl_ops.pack([M._recombine_const(p)])[0]
kc_np = (np.uint32(kp[0]), np.uint32(kp[1]))

B, R = 2, 4096                                    # 2^17 level-2 shape
rt = min(M.RT, R)


def kernel(xlo, xhi, vdr, olo, ohi):
    planes = (xlo[0], xhi[0])                     # (F, rt)
    d = M._digitize(planes, NA).reshape(NA * Fq, rt)
    Rm = jax.lax.dot_general(
        d, vdr[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                             # (rt, NB*PF)
    us = [(Rm[..., b * PF:b * PF + Fq] + jnp.int32(M.OFF)).astype(U32)
          for b in range(NB)]
    W0, W1, W2 = M._accum_words(us)
    lo, hi = gl_ops._reduce128(W0, W1, W2, jnp.zeros_like(W2))
    klo, khi = kc_np
    out = gl_ops.sub_planar(
        lo, hi, jnp.broadcast_to(klo, lo.shape), jnp.broadcast_to(khi, hi.shape))
    olo[0] = out[0]
    ohi[0] = out[1]


def run(interpret):
    rng = np.random.default_rng(5)
    v = rng.integers(0, p, size=(B, Fq, R), dtype=np.uint64)
    xlo = jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32))
    xhi = jnp.asarray((v >> 32).astype(np.uint32))
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((B, R, Fq), jnp.uint32)
                        for _ in range(2)),
        grid=(B, R // rt),
        in_specs=[
            pl.BlockSpec((1, Fq, rt), lambda b, r: (b, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fq, rt), lambda b, r: (b, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vd_pad.shape, lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, rt, Fq), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM) for _ in range(2)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xlo, xhi, jnp.asarray(vd_pad))
    return tuple(np.asarray(t) for t in out)


hw = run(False)
it_fn = jax.jit(lambda: run(True))  # interpret under jit = XLA lowering
it = tuple(np.asarray(t) for t in run(True))
ok = all(np.array_equal(a, b) for a, b in zip(hw, it))
if not ok:
    bad = np.argwhere(hw[0] != it[0])
    print(f"FAIL: {bad.shape[0]}/{hw[0].size} plane-0 mismatches; "
          f"first {bad[0] if bad.shape[0] else None}")
else:
    print("PASS: padded-column F=32 level bit-exact on hardware")
sys.exit(0 if ok else 1)
