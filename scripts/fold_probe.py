"""FRI-fold formulation probe on the TPU: which even/odd split + fp2
scalar-mul formulation gets closest to the VPU compute bound?

Compute bound estimate: fold of m coeffs = m/2 ext muls (3 base muls each,
Karatsuba) + adds; at the measured ~2.4 G base-mul/s this is ~1.7 ms for
m = 2^21. Current packed fold measures ~16 ms — the gap is layout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from ministark_tpu.fields import GOLDILOCKS_FP2
from ministark_tpu.ops import gl
from ministark_tpu.ops.poly_device import fold_even_odd
from ministark_tpu.ops.registry import get_kernels


def chain(fn, x, iters=16):
    g = jax.jit(lambda v: jax.lax.fori_loop(0, iters, lambda i, u: fn(u), v))
    y = g(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(y))
        best = min(best, (time.time() - t0) / iters)
    return best


def ext_mul_scalar_planar(p00, p01, p10, p11, a0, a1):
    """fp2 (c0 + c1 u) * (a0 + a1 u), planes = (c0lo, c0hi, c1lo, c1hi)."""
    a0 = tuple(jnp.broadcast_to(w, p00.shape) for w in a0)
    a1 = tuple(jnp.broadcast_to(w, p00.shape) for w in a1)
    v0l, v0h = gl.mul_planar(p00, p01, *a0)
    v1l, v1h = gl.mul_planar(p10, p11, *a1)
    sxl, sxh = gl.add_planar(p00, p01, p10, p11)
    syl, syh = gl.add_planar(*a0, *a1)
    sl, sh = gl.mul_planar(sxl, sxh, syl, syh)
    # c0 = v0 + 7*v1 ; 7*v1 via shift-adds
    t2l, t2h = gl.add_planar(v1l, v1h, v1l, v1h)
    t4l, t4h = gl.add_planar(t2l, t2h, t2l, t2h)
    t8l, t8h = gl.add_planar(t4l, t4h, t4l, t4h)
    n7l, n7h = gl.sub_planar(t8l, t8h, v1l, v1h)
    c0l, c0h = gl.add_planar(v0l, v0h, n7l, n7h)
    vl, vh = gl.add_planar(v0l, v0h, v1l, v1h)
    c1l, c1h = gl.sub_planar(sl, sh, vl, vh)
    return c0l, c0h, c1l, c1h


def main():
    ke = get_kernels(GOLDILOCKS_FP2)
    m = 1 << 21
    rng = np.random.default_rng(0)
    ext_vals = rng.integers(0, 1 << 62, size=(m, 2), dtype=np.uint64)
    coeffs = jnp.asarray(gl.pack(ext_vals))                  # (m, 2, 2)
    alpha = jnp.asarray(ke.pack_scalar((12345, 67890)))     # (2, 2)
    a0 = (alpha[0, 0], alpha[0, 1])
    a1 = (alpha[1, 0], alpha[1, 1])

    # 0. copy baseline on planes
    planes = jnp.asarray(np.ascontiguousarray(
        np.transpose(np.asarray(coeffs), (1, 2, 0))))        # (2, 2, m)

    t = chain(lambda v: v + jnp.uint32(1), planes)
    print(f"copy+1 planes (2,2,m):     {t*1e3:8.3f} ms")

    # 1. current packed fold
    def fold_packed(c):
        half = fold_even_odd(ke, c, alpha)
        return jnp.concatenate([half, half], axis=0)

    t = chain(fold_packed, coeffs)
    print(f"fold packed (m,2,2):       {t*1e3:8.3f} ms")

    # 2. planes minor-axis strided + full math
    def fold_planes_strided(v):
        e = v[:, :, 0::2]
        o = v[:, :, 1::2]
        c0l, c0h, c1l, c1h = ext_mul_scalar_planar(
            o[0, 0], o[0, 1], o[1, 0], o[1, 1], a0, a1)
        r0l, r0h = gl.add_planar(e[0, 0], e[0, 1], c0l, c0h)
        r1l, r1h = gl.add_planar(e[1, 0], e[1, 1], c1l, c1h)
        half = jnp.stack([jnp.stack([r0l, r0h]), jnp.stack([r1l, r1h])])
        return jnp.concatenate([half, half], axis=2)

    t = chain(fold_planes_strided, planes)
    print(f"fold planes strided minor: {t*1e3:8.3f} ms")

    # 3. planes pair-axis: (2, 2, m) -> (2, 2, m/2, 2), even/odd = [..., 0/1]
    def fold_planes_pair(v):
        w = v.reshape(2, 2, m // 2, 2)
        e = w[..., 0]
        o = w[..., 1]
        c0l, c0h, c1l, c1h = ext_mul_scalar_planar(
            o[0, 0], o[0, 1], o[1, 0], o[1, 1], a0, a1)
        r0l, r0h = gl.add_planar(e[0, 0], e[0, 1], c0l, c0h)
        r1l, r1h = gl.add_planar(e[1, 0], e[1, 1], c1l, c1h)
        half = jnp.stack([jnp.stack([r0l, r0h]), jnp.stack([r1l, r1h])])
        return jnp.concatenate([half, half], axis=2)

    t = chain(fold_planes_pair, planes)
    print(f"fold planes pair-axis:     {t*1e3:8.3f} ms")

    # 4. planes 2D rows: (2, 2, r, 1024), lanes strided within rows
    r_ = m // 1024
    planes2d = planes.reshape(2, 2, r_, 1024)

    def fold_planes_2d(v):
        e = v[..., 0::2]
        o = v[..., 1::2]
        c0l, c0h, c1l, c1h = ext_mul_scalar_planar(
            o[0, 0], o[0, 1], o[1, 0], o[1, 1], a0, a1)
        r0l, r0h = gl.add_planar(e[0, 0], e[0, 1], c0l, c0h)
        r1l, r1h = gl.add_planar(e[1, 0], e[1, 1], c1l, c1h)
        half = jnp.stack([jnp.stack([r0l, r0h]), jnp.stack([r1l, r1h])])
        return jnp.concatenate([half, half], axis=3)

    t = chain(fold_planes_2d, planes2d)
    print(f"fold planes 2D rows:       {t*1e3:8.3f} ms")

    # 5. ext-mul-only compute bound at m/2 on planes
    half_planes = planes[:, :, : m // 2]

    def mul_only(v):
        c0l, c0h, c1l, c1h = ext_mul_scalar_planar(
            v[0, 0], v[0, 1], v[1, 0], v[1, 1], a0, a1)
        return jnp.stack([jnp.stack([c0l, c0h]), jnp.stack([c1l, c1h])])

    t = chain(mul_only, half_planes)
    print(f"ext-mul-only (m/2):        {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
