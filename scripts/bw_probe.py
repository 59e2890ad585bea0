"""HBM bandwidth calibration: what does a chained elementwise pass actually
achieve on this chip, by dtype/shape/size? Sets the honest denominator for
roofline fractions."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()


def chain(fn, x, iters=8):
    g = jax.jit(lambda v: jax.lax.fori_loop(0, iters, lambda i, u: fn(u), v))
    y = g(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(y))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    for label, arr in [
        ("u32 (4096,4096)    64MB", jnp.ones((4096, 4096), jnp.uint32)),
        ("u32 (16384,4096)  256MB", jnp.ones((16384, 4096), jnp.uint32)),
        ("f32 (16384,4096)  256MB", jnp.ones((16384, 4096), jnp.float32)),
        ("u32 (2,2,2048,1024) 64MB", jnp.ones((2, 2, 2048, 1024), jnp.uint32)),
    ]:
        t = chain(lambda v: v + v.dtype.type(1), arr)
        gb = 2 * arr.size * arr.dtype.itemsize / 1e9
        print(f"{label}: {t*1e3:7.3f} ms  {gb/t:6.1f} GB/s")

    # same, 4 sequential dispatches instead of fori_loop (donated buffers)
    x = jnp.ones((16384, 4096), jnp.uint32)
    f = jax.jit(lambda v: v + jnp.uint32(1), donate_argnums=0)
    y = f(x); jax.block_until_ready(y)
    y = f(y); jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(8):
        y = f(y)
    jax.block_until_ready(y)
    t = (time.time() - t0) / 8
    gb = 2 * y.size * 4 / 1e9
    print(f"u32 256MB, dispatch-chained donated: {t*1e3:7.3f} ms  {gb/t:6.1f} GB/s")


if __name__ == "__main__":
    main()
