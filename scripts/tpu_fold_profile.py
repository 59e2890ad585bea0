"""Profile the fused planar fold+divide round's sub-pieces on the real TPU.

Each piece is slope-timed in isolation (shape-preserving wrappers) so the
3.x ms whole-round cost can be attributed: layout conversion, u-construction
(2 half-length muls), suffix passes, carry ladder, out-scale mul. Feeds the
BENCHMARKS.md speed-of-light table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_kernels import _time_chained
from ministark_tpu.fields import GOLDILOCKS_FP2
from ministark_tpu.ops import gl
from ministark_tpu.ops.planar import (_ROW, _blocked_div_tail, _powers_ladder,
                                      _suffix_hillis, _suffix_lanes,
                                      fold_div_planes, get_planar)
from ministark_tpu.ops.registry import get_kernels

ke = get_kernels(GOLDILOCKS_FP2)
pc = get_planar(ke)
ext = GOLDILOCKS_FP2
rng = np.random.default_rng(7)

m = 1 << 21
h = m // 2
rows = h // _ROW

coeffs = jnp.asarray(gl.pack(rng.integers(0, gl.P, size=(m, 2), dtype=np.uint64)))
z = ext.from_base_coeffs((12345, 67890))
alpha = ext.from_base_coeffs((99991, 31337))
dv = ext.from_base_coeffs((777, 4242))
zp = jnp.asarray(ke.pack_scalar(z))
ap = jnp.asarray(ke.pack_scalar(alpha))
dvp = jnp.asarray(ke.pack_scalar(dv))
zinvp = jnp.asarray(ke.pack_scalar(ext.inv(z)))

zpl = pc.scalar_planes(zp)
apl = pc.scalar_planes(ap)
dvl = pc.scalar_planes(dvp)
zil = pc.scalar_planes(zinvp)

pl_m = pc.to_planes(coeffs)                       # (4, m)
u_h = jnp.asarray(rng.integers(0, 1 << 31, size=(4, rows, _ROW),
                               dtype=np.uint64)).astype(jnp.uint32)


def report(name, t):
    print(f"{name:36s} {t * 1e3:8.3f} ms", flush=True)


# whole round (planar in/out — no packed conversion)
def whole(plm):
    q = fold_div_planes(pc, plm, zpl, apl, dvl, zil)     # (4, h)
    return jnp.concatenate([q, q], axis=-1)

report("whole round (planar io)", _time_chained(whole, pl_m))


# packed io (the engine's real boundary)
from ministark_tpu.stark.engine import _fold_div_fused

def whole_packed(c):
    q = _fold_div_fused(ke, c, zp, ap, dvp, zinvp)
    return jnp.concatenate([q, q], axis=0)

report("whole round (packed io)", _time_chained(whole_packed, coeffs))


# u construction: even/odd split + 2 half-length ladder muls (shape-pres.)
def u_construct(plm):
    w = plm.reshape(plm.shape[:-1] + (m // _ROW, _ROW))
    even = w[..., 0::2].reshape(plm.shape[:-1] + (h,))
    odd = w[..., 1::2].reshape(plm.shape[:-1] + (h,))
    lo = _powers_ladder(pc, zpl, _ROW)
    alo = pc.mul(lo, pc.bc(apl, lo))
    we = even.reshape(plm.shape[:-1] + (rows, _ROW))
    wo = odd.reshape(plm.shape[:-1] + (rows, _ROW))
    u = pc.add(
        pc.mul(we, jnp.broadcast_to(lo[..., None, :], we.shape)),
        pc.mul(wo, jnp.broadcast_to(alo[..., None, :], wo.shape)),
    )
    u2 = u.reshape(plm.shape[:-1] + (h,))
    return jnp.concatenate([u2, u2], axis=-1)

report("u = evenodd + 2 ladder muls", _time_chained(u_construct, pl_m))


# one bare half-length ladder mul
lo_tab = jax.block_until_ready(jax.jit(lambda: _powers_ladder(pc, zpl, _ROW))())

def one_mul(uu):
    return pc.mul(uu, jnp.broadcast_to(lo_tab[..., None, :], uu.shape))

report("1 half-length ladder mul", _time_chained(one_mul, u_h))


# suffix passes at half length
def suffix(uu):
    return _suffix_lanes(pc, uu)

report("suffix_lanes (radix local+carry)", _time_chained(suffix, u_h))


def suffix_flat(uu):
    return _suffix_hillis(pc, uu)

report("suffix_hillis flat (oracle)", _time_chained(suffix_flat, u_h))


# full blocked div tail (suffix + carry ladder + out-scale mul)
ilo_tab = jax.block_until_ready(jax.jit(lambda: _powers_ladder(pc, zil, _ROW))())

def tail(uu):
    q = _blocked_div_tail(pc, uu, lo_tab, ilo_tab, zpl, zil)
    return q.reshape(uu.shape)

report("blocked_div_tail (sfx+carry+mul)", _time_chained(tail, u_h))


# layout conversion round trip alone
def conv(c):
    return pc.from_planes(pc.to_planes(c) + jnp.uint32(0))

report("to_planes+from_planes (m)", _time_chained(conv, coeffs))
