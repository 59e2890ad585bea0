"""Second fold/scan probe: reshape-only packed fold (no transpose), roll
implementations, and honest f32/u32 elementwise calibration."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()

from ministark_tpu.fields import GOLDILOCKS_FP2
from ministark_tpu.ops import gl
from ministark_tpu.ops.registry import get_kernels


def chain(fn, *args, iters=8):
    body = lambda i, u: jax.lax.optimization_barrier(fn(u, *args[1:]))
    g = jax.jit(lambda v, *rest: jax.lax.fori_loop(0, iters, body, v))
    y = g(*args)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(y, *args[1:]))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    ke = get_kernels(GOLDILOCKS_FP2)
    m = 1 << 21
    r = m // 1024
    rng = np.random.default_rng(0)
    packed = jnp.asarray(gl.pack(
        rng.integers(0, 1 << 62, size=(m, 2), dtype=np.uint64)))   # (m,2,2)
    alpha = jnp.asarray(ke.pack_scalar((12345, 67890)))

    # calibrations with runtime data (cannot constant-fold)
    fa = jnp.asarray(rng.standard_normal((8192, 4096), dtype=np.float32))
    fb = jnp.asarray(rng.standard_normal((8192, 4096), dtype=np.float32))
    t = chain(lambda v, w: v * 1.0000001 + w, fa, fb)
    print(f"f32 fma 128MB:            {t*1e3:8.3f} ms  {3*fa.size*4/1e9/t:6.1f} GB/s")

    ua = jnp.asarray(rng.integers(0, 1 << 32, (8192, 4096), dtype=np.uint32))
    ub = jnp.asarray(rng.integers(0, 1 << 32, (8192, 4096), dtype=np.uint32))
    t = chain(lambda v, w: v + w, ua, ub)
    print(f"u32 add 128MB:            {t*1e3:8.3f} ms  {3*ua.size*4/1e9/t:6.1f} GB/s")

    # fold packed with 2D-row reshape only (no transpose): view (m,2,2) as
    # (r, 1024, 2, 2) -> even/odd stride the 1024 axis
    def fold_packed_2d(v):
        w = v.reshape(r, 1024, 2, 2)
        e = w[:, 0::2]
        o = w[:, 1::2]
        half = ke.add(e.reshape(m // 2, 2, 2),
                      ke.mul(o.reshape(m // 2, 2, 2),
                             jnp.broadcast_to(alpha, (m // 2, 2, 2))))
        return jnp.concatenate([half, half], axis=0)

    t = chain(fold_packed_2d, packed)
    print(f"fold packed 2D-row view:  {t*1e3:8.3f} ms")

    # wait -- e.reshape(m//2,...) from (r,512,2,2) is contiguous row-major ✓
    # roll implementations on planes (2, 2, r, 1024)
    planes = jnp.asarray(np.ascontiguousarray(
        np.transpose(np.asarray(packed), (1, 2, 0)))).reshape(2, 2, r, 1024)

    def roll_concat(v):
        flat = v.reshape(2, 2, m)
        sh = jnp.concatenate([flat[:, :, 1:], flat[:, :, :1]], axis=2)
        return sh.reshape(2, 2, r, 1024)

    t = chain(roll_concat, planes)
    print(f"roll(-1) via concat:      {t*1e3:8.3f} ms")

    def shift_pad(v):
        flat = v.reshape(2, 2, m)
        sh = jnp.pad(flat[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        return sh.reshape(2, 2, r, 1024)

    t = chain(shift_pad, planes)
    print(f"shift(-1) via pad:        {t*1e3:8.3f} ms")

    # u32 gl mul on 2D planes (the compute primitive, best layout)
    pa = planes[0]
    t = chain(lambda v: jnp.stack(gl.mul_planar(v[0], v[1], v[0], v[1])), pa)
    print(f"gl mul 2^21 2D planes:    {t*1e3:8.3f} ms  {(1<<21)/t/1e9:5.2f} Gmul/s")


if __name__ == "__main__":
    main()
