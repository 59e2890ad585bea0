"""Bisect WHERE the composed fold+div round loses time vs the sum of its
pieces (piece sum ~1.6 ms, composed ~3.4 ms at 2^21 on v5e).

Times progressively larger prefixes of the composed graph, all
shape-preserving for slope timing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_kernels import _time_chained
from ministark_tpu.fields import GOLDILOCKS_FP2
from ministark_tpu.ops import gl
from ministark_tpu.ops.planar import (_ROW, _powers_ladder, _suffix_hillis,
                                      _suffix_lanes, get_planar)
from ministark_tpu.ops.registry import get_kernels

_ob = jax.lax.optimization_barrier

ke = get_kernels(GOLDILOCKS_FP2)
pc = get_planar(ke)
ext = GOLDILOCKS_FP2
rng = np.random.default_rng(7)

m = 1 << 21
h = m // 2
rows = h // _ROW

pl_m = jnp.asarray(
    rng.integers(0, 1 << 31, size=(4, m), dtype=np.uint64)).astype(jnp.uint32)
z = ext.from_base_coeffs((12345, 67890))
alpha = ext.from_base_coeffs((99991, 31337))
dv = ext.from_base_coeffs((777, 4242))
zpl = pc.scalar_planes(jnp.asarray(ke.pack_scalar(z)))
apl = pc.scalar_planes(jnp.asarray(ke.pack_scalar(alpha)))
dvl = pc.scalar_planes(jnp.asarray(ke.pack_scalar(dv)))
zil = pc.scalar_planes(jnp.asarray(ke.pack_scalar(ext.inv(z))))


def build_u(plm):
    w = plm.reshape(plm.shape[:-1] + (m // _ROW, _ROW))
    even = w[..., 0::2].reshape(plm.shape[:-1] + (h,))
    odd = w[..., 1::2].reshape(plm.shape[:-1] + (h,))
    even = jnp.concatenate(
        [pc.sub(even[..., :1], pc.bc(dvl, even[..., :1])), even[..., 1:]],
        axis=-1)
    lo = _powers_ladder(pc, zpl, _ROW)
    ilo = _powers_ladder(pc, zil, _ROW)
    alo = pc.mul(lo, pc.bc(apl, lo))
    we = even.reshape(plm.shape[:-1] + (rows, _ROW))
    wo = odd.reshape(plm.shape[:-1] + (rows, _ROW))
    u = _ob(pc.add(
        pc.mul(we, jnp.broadcast_to(lo[..., None, :], we.shape)),
        pc.mul(wo, jnp.broadcast_to(alo[..., None, :], wo.shape)),
    ))
    return u, lo, ilo


def stage_u(plm):
    u, lo, ilo = build_u(plm)
    u2 = u.reshape(plm.shape[:-1] + (h,))
    return jnp.concatenate([u2, u2], axis=-1)


def stage_sfx(plm):
    u, lo, ilo = build_u(plm)
    S = _suffix_lanes(pc, u)
    S2 = S.reshape(plm.shape[:-1] + (h,))
    return jnp.concatenate([S2, S2], axis=-1)


def stage_sfx_ob(plm):
    u, lo, ilo = build_u(plm)
    S = _ob(_suffix_lanes(pc, u))
    S2 = S.reshape(plm.shape[:-1] + (h,))
    return jnp.concatenate([S2, S2], axis=-1)


def stage_carry(plm):
    u, lo, ilo = build_u(plm)
    S = _suffix_lanes(pc, u)
    tot = S[..., :, 0]
    zL = pc.mul(lo[..., -1:], pc.bc(zpl, lo[..., -1:]))
    ziL = pc.mul(ilo[..., -1:], pc.bc(zil, ilo[..., -1:]))
    zLr = _powers_ladder(pc, zL.reshape(pc.C), rows)
    ziLr = _powers_ladder(pc, ziL.reshape(pc.C), rows)
    wsum = _suffix_hillis(pc, pc.mul(tot, zLr))
    w_next = jnp.concatenate(
        [wsum[..., 1:], jnp.zeros_like(wsum[..., :1])], axis=-1)
    V = _ob(pc.mul(w_next, ziLr))
    SV = pc.add(S, jnp.broadcast_to(V[..., :, None], S.shape))
    S2 = SV.reshape(plm.shape[:-1] + (h,))
    return jnp.concatenate([S2, S2], axis=-1)


def stage_full(plm):
    u, lo, ilo = build_u(plm)
    S = _suffix_lanes(pc, u)
    tot = S[..., :, 0]
    zL = pc.mul(lo[..., -1:], pc.bc(zpl, lo[..., -1:]))
    ziL = pc.mul(ilo[..., -1:], pc.bc(zil, ilo[..., -1:]))
    zLr = _powers_ladder(pc, zL.reshape(pc.C), rows)
    ziLr = _powers_ladder(pc, ziL.reshape(pc.C), rows)
    wsum = _suffix_hillis(pc, pc.mul(tot, zLr))
    w_next = jnp.concatenate(
        [wsum[..., 1:], jnp.zeros_like(wsum[..., :1])], axis=-1)
    V = _ob(pc.mul(w_next, ziLr))
    q_full = pc.mul(
        pc.add(S, jnp.broadcast_to(V[..., :, None], S.shape)),
        jnp.broadcast_to(ilo[..., None, :], S.shape),
    )
    q = q_full.reshape(plm.shape[:-1] + (h,))
    q = jnp.concatenate([q[..., 1:], jnp.zeros_like(q[..., :1])], axis=-1)
    return jnp.concatenate([q, q], axis=-1)


def stage_full_noshift(plm):
    u, lo, ilo = build_u(plm)
    S = _suffix_lanes(pc, u)
    tot = S[..., :, 0]
    zL = pc.mul(lo[..., -1:], pc.bc(zpl, lo[..., -1:]))
    ziL = pc.mul(ilo[..., -1:], pc.bc(zil, ilo[..., -1:]))
    zLr = _powers_ladder(pc, zL.reshape(pc.C), rows)
    ziLr = _powers_ladder(pc, ziL.reshape(pc.C), rows)
    wsum = _suffix_hillis(pc, pc.mul(tot, zLr))
    w_next = jnp.concatenate(
        [wsum[..., 1:], jnp.zeros_like(wsum[..., :1])], axis=-1)
    V = _ob(pc.mul(w_next, ziLr))
    q_full = pc.mul(
        pc.add(S, jnp.broadcast_to(V[..., :, None], S.shape)),
        jnp.broadcast_to(ilo[..., None, :], S.shape),
    )
    q = q_full.reshape(plm.shape[:-1] + (h,))
    return jnp.concatenate([q, q], axis=-1)


for name, fn in [("u only", stage_u),
                 ("u+suffix", stage_sfx),
                 ("u+suffix(ob)", stage_sfx_ob),
                 ("u+suffix+carry", stage_carry),
                 ("full (no shift)", stage_full_noshift),
                 ("full", stage_full)]:
    t = _time_chained(fn, pl_m)
    print(f"{name:20s} {t * 1e3:8.3f} ms", flush=True)
