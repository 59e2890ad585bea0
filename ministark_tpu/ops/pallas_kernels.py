"""Pallas TPU kernels for elementwise field hot ops.

The XLA paths in gl.py/bb.py already fuse well, but Pallas gives explicit
VMEM blocking and removes intermediate materialization for the widest ops —
and is the base layer for future fused kernels (NTT stages + twiddle + hash
pipelines). Kernels fall back to interpret mode off-TPU so the CPU test mesh
exercises identical semantics.

Current kernels:
  * gl_mul_pallas — Goldilocks modmul over (n, 2) limb pairs

Layout lesson (round 1): TPU tiles the last two axes as (sublane, 128-lane);
trailing element axes like (..., 2, 2) waste 64x of each tile, which blew the
VMEM budget for an Fp2 kernel — extension-field pallas kernels need a
limb-planar layout (limbs as separate refs or leading axes) and are deferred
to the dedicated NTT/fold kernel work.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gl

_LANES = 128
_SUBLANES = 8
_TILE = _SUBLANES * _LANES  # one (8, 128) register tile of elements


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _gl_mul_kernel(a_ref, b_ref, o_ref):
    # refs: (TILE, 2) uint32 [lo, hi]
    o_ref[:] = gl.mul(a_ref[:], b_ref[:])


@jax.jit
def gl_mul_pallas(a, b):
    """(n, 2) x (n, 2) Goldilocks modmul; n must be a multiple of TILE."""
    n = a.shape[0]
    assert n % _TILE == 0, f"n must be a multiple of {_TILE}"
    grid = (n // _TILE,)
    spec = pl.BlockSpec((_TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gl_mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(a, b)
