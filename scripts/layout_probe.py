"""Layout probe: packed (n, 2) trailing-limb vs planar (2, n) leading-limb
Goldilocks multiply throughput on the TPU. Decides the hot-kernel layout
strategy (TPU tiles the two minor axes as (8, 128); a size-2 minor axis may
waste most of every lane tile)."""

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


def main():
    n = 1 << 22
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    packed = jnp.asarray(gl.pack(vals))                      # (n, 2)
    planar = jnp.asarray(np.stack([(vals & 0xFFFFFFFF).astype(np.uint32),
                                   (vals >> 32).astype(np.uint32)]))  # (2, n)
    planar2d = planar.reshape(2, n // 1024, 1024)            # (2, r, 1024)

    t = chain(lambda v: gl.mul(v, packed), packed)
    print(f"packed  (n,2):      {t*1e3:8.3f} ms  {n/t/1e9:7.2f} Gop/s")

    def mul_pl(v):
        lo, hi = gl.mul_planar(v[0], v[1], planar[0], planar[1])
        return jnp.stack([lo, hi])

    t = chain(mul_pl, planar)
    print(f"planar  (2,n):      {t*1e3:8.3f} ms  {n/t/1e9:7.2f} Gop/s")

    def mul_pl2(v):
        lo, hi = gl.mul_planar(v[0], v[1], planar2d[0], planar2d[1])
        return jnp.stack([lo, hi])

    t = chain(mul_pl2, planar2d)
    print(f"planar  (2,r,1024): {t*1e3:8.3f} ms  {n/t/1e9:7.2f} Gop/s")

    # fold_even_odd: packed (n, 2, 2) fp2 vs planar strided
    from ministark_tpu.fields import GOLDILOCKS_FP2
    from ministark_tpu.ops.poly_device import fold_even_odd
    from ministark_tpu.ops.registry import get_kernels

    ke = get_kernels(GOLDILOCKS_FP2)
    m = 1 << 21
    ext_vals = rng.integers(0, 1 << 62, size=(m, 2), dtype=np.uint64)
    coeffs = jnp.asarray(gl.pack(ext_vals))                  # (m, 2, 2)
    alpha = jnp.asarray(ke.pack_scalar((12345, 67890)))

    def fold_step(c):
        half = fold_even_odd(ke, c, alpha)
        return jnp.concatenate([half, half], axis=0)

    t = chain(fold_step, coeffs)
    print(f"fold packed (m,2,2): {t*1e3:8.3f} ms  {(m*16*1.5)/t/1e9:7.2f} GB/s")

    # planar fold: (2, 2, m) layout [ext comp, limb, coeff]
    cpl = jnp.asarray(np.transpose(np.asarray(coeffs), (1, 2, 0)))

    def fold_pl(c):
        even = c[:, :, 0::2]
        odd = c[:, :, 1::2]
        # fp2 mul by scalar alpha, planar: c0' = e0 + (a0*o0 + 7*a1*o1) ...
        a00, a01 = int(np.asarray(alpha)[0, 0]) , 0  # placeholder not used
        return jnp.concatenate([even, even], axis=2)  # layout-only lower bound

    t = chain(fold_pl, cpl)
    print(f"fold planar strided lower-bound: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
