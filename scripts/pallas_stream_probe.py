"""Can a Pallas kernel stream HBM faster than XLA's ~110 GB/s? Decides
whether hot elementwise ops are worth hand-writing or whether ~110 GB/s is
this chip's practical ceiling (vs the v5e spec's 819)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()


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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.uint32(1)


def make_pallas_copy(shape, block_rows):
    n_rows, n_cols = shape
    grid = (n_rows // block_rows,)
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, n_cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, n_cols), lambda i: (i, 0)),
    )


def main():
    rng = np.random.default_rng(0)
    shape = (16384, 4096)                      # 256 MB u32
    x = jnp.asarray(rng.integers(0, 1 << 32, shape, dtype=np.uint32))
    gb = 2 * x.size * 4 / 1e9

    t = chain(lambda v: v + jnp.uint32(1), x)
    print(f"XLA copy+1 256MB:          {t*1e3:8.3f} ms  {gb/t:6.1f} GB/s")

    for br in (256, 512, 1024):
        f = make_pallas_copy(shape, br)
        t = chain(f, x)
        print(f"Pallas copy+1 block {br:4d}:  {t*1e3:8.3f} ms  {gb/t:6.1f} GB/s")

    # single big dispatch (no loop): 1 GB array, one pass
    big = jnp.asarray(rng.integers(0, 1 << 32, (65536, 4096), dtype=np.uint32))
    f = jax.jit(lambda v: v + jnp.uint32(1))
    jax.block_until_ready(f(big))
    t0 = time.time(); jax.block_until_ready(f(big)); t1 = time.time() - t0
    print(f"XLA single dispatch 1GB:   {t1*1e3:8.3f} ms  {2*big.size*4/1e9/t1:6.1f} GB/s")


if __name__ == "__main__":
    main()
