"""Validate the chained-timing harness: does block_until_ready actually wait
on this tunneled backend? Cross-check with a forced scalar device->host pull
and with wildly different iteration counts (real work scales, elided work
doesn't)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()


def run(fn, x, iters, pull):
    body = lambda i, u: jax.lax.optimization_barrier(fn(u))
    g = jax.jit(lambda v: jax.lax.fori_loop(0, iters, body, v), static_argnums=())
    y = g(x)
    jax.block_until_ready(y)
    t0 = time.time()
    y = g(y)
    if pull:
        float(np.asarray(y.reshape(-1)[0]))
    else:
        jax.block_until_ready(y)
    return time.time() - t0


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, (16384, 4096), dtype=np.uint32))

    # scalar RTT baseline
    s = jnp.uint32(1)
    t0 = time.time(); float(np.asarray(s + 1)); rtt = time.time() - t0
    print(f"scalar pull RTT: {rtt*1e3:.2f} ms")

    for iters in (2, 16, 128):
        t_b = run(lambda v: v + jnp.uint32(1), x, iters, pull=False)
        t_p = run(lambda v: v + jnp.uint32(1), x, iters, pull=True)
        print(f"copy+1 iters={iters:4d}: block={t_b*1e3:9.3f} ms  pull={t_p*1e3:9.3f} ms")

    from ministark_tpu.ops import gl
    a = jnp.asarray(gl.pack(rng.integers(0, 1 << 62, size=(1 << 21,), dtype=np.uint64)))
    for iters in (2, 16):
        t_b = run(lambda v: gl.mul(v, v), a, iters, pull=False)
        t_p = run(lambda v: gl.mul(v, v), a, iters, pull=True)
        print(f"glmul 2^21 iters={iters:4d}: block={t_b*1e3:9.3f} ms  pull={t_p*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
