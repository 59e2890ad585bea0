"""Planar-representation probe: cost of packed<->planes conversion and of
the suffix-scan building blocks (rolls) in each layout. Decides whether the
FRI round pipeline should hold coefficients planar end-to-end."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()

from ministark_tpu.ops import gl


def chain(fn, x, iters=8):
    """Chained timing with an optimization_barrier per iteration so XLA can
    neither fuse across iterations nor algebraically collapse the chain."""
    body = lambda i, u: jax.lax.optimization_barrier(fn(u))
    g = jax.jit(lambda v: jax.lax.fori_loop(0, iters, body, v))
    y = g(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(y))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    m = 1 << 21
    r = m // 1024
    big = jnp.ones((8192, 4096), jnp.uint32)   # 128 MB
    t = chain(lambda v: v + jnp.uint32(1), big)
    print(f"copy calib u32 128MB (barrier): {t*1e3:8.3f} ms  "
          f"{2*big.size*4/1e9/t:6.1f} GB/s")
    rng = np.random.default_rng(0)
    packed = jnp.asarray(gl.pack(
        rng.integers(0, 1 << 62, size=(m, 2), dtype=np.uint64)))   # (m, 2, 2)
    planes = jnp.asarray(np.ascontiguousarray(
        np.transpose(np.asarray(packed), (1, 2, 0)))).reshape(2, 2, r, 1024)

    # 1. conversion packed -> planes (keep shape chainable via round trip)
    def conv_rt(v):
        pl = jnp.transpose(v, (1, 2, 0)).reshape(2, 2, r, 1024)
        return jnp.transpose(pl.reshape(2, 2, m), (2, 0, 1))

    t = chain(conv_rt, packed)
    print(f"packed<->planes round trip:  {t*1e3:8.3f} ms")

    # 2. planes roll by +1 on flattened coeff axis (scan small step)
    def roll1(v):
        flat = v.reshape(2, 2, m)
        return jnp.roll(flat, -1, axis=2).reshape(2, 2, r, 1024)

    t = chain(roll1, planes)
    print(f"planes roll(-1) flattened:   {t*1e3:8.3f} ms")

    # 3. packed roll by +1 on axis 0 (current scan step)
    t = chain(lambda v: jnp.roll(v, -1, axis=0), packed)
    print(f"packed roll(-1) axis0:       {t*1e3:8.3f} ms")

    # 4. planes roll by large step (multiple of 1024 -> row shift)
    t = chain(lambda v: jnp.roll(v, -8, axis=2), planes)
    print(f"planes roll(-8192) rows:     {t*1e3:8.3f} ms")

    # 5. full planar Hillis-Steele suffix-mul-style pass count proxy:
    #    one roll + one planar gl mul (what each of the log m scan steps costs)
    def scan_step(v):
        flat = v.reshape(2, 2, m)
        rolled = jnp.roll(flat, -1, axis=2).reshape(2, 2, r, 1024)
        lo, hi = gl.mul_planar(v[0, 0], v[0, 1], rolled[0, 0], rolled[0, 1])
        return jnp.stack([jnp.stack([lo, hi]), jnp.stack([lo, hi])])

    t = chain(scan_step, planes)
    print(f"planes scan step (roll+mul): {t*1e3:8.3f} ms")

    # 6. same scan step in packed layout
    def scan_step_packed(v):
        rolled = jnp.roll(v, -1, axis=0)
        return gl.mul(v, rolled)

    t = chain(scan_step_packed, packed)
    print(f"packed scan step (roll+mul): {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
