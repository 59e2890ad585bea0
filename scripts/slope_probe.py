"""Slope-based kernel timing (two chained-iteration counts, marginal cost =
slope) — removes the ~40 ms per-dispatch tunnel overhead that polluted all
previous probes. Re-measures the decision set: fold variants, NTT, mul.
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

from ministark_tpu.fields import GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.ops import gl
from ministark_tpu.ops.poly_device import fold_even_odd
from ministark_tpu.ops.registry import get_kernels

K1, K2 = 8, 56


def _timed(fn, x, iters, reps=3):
    body = lambda i, u: jax.lax.optimization_barrier(fn(u))
    g = jax.jit(lambda v: jax.lax.fori_loop(0, iters, body, v))
    y = g(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(g(y))
        best = min(best, time.time() - t0)
    return best


def slope(fn, x):
    t1 = _timed(fn, x, K1)
    t2 = _timed(fn, x, K2)
    return (t2 - t1) / (K2 - K1)


def main():
    ke = get_kernels(GOLDILOCKS_FP2)
    m = 1 << 21
    r = m // 1024
    rng = np.random.default_rng(0)
    packed = jnp.asarray(gl.pack(
        rng.integers(0, 1 << 62, size=(m, 2), dtype=np.uint64)))
    alpha = jnp.asarray(ke.pack_scalar((12345, 67890)))

    # copy calibration (binary op, runtime second operand via closure)
    big = jnp.asarray(rng.integers(0, 1 << 32, (16384, 4096), dtype=np.uint32))
    t = slope(lambda v: v + jnp.uint32(1), big)
    print(f"copy+1 256MB:            {t*1e3:8.3f} ms  {2*big.size*4/1e9/t:6.1f} GB/s")

    # fold variants (chain keeps shape via concat; extra 17MB write each)
    def fold_now(c):
        half = fold_even_odd(ke, c, alpha)     # current: 2D-row view
        return jnp.concatenate([half, half], axis=0)

    t = slope(fold_now, packed)
    print(f"fold 2D-row view:        {t*1e3:8.3f} ms")

    def fold_old(c):
        even = c[0::2]
        odd = c[1::2]
        half = ke.add(even, ke.mul(odd, jnp.broadcast_to(alpha, odd.shape)))
        return jnp.concatenate([half, half], axis=0)

    t = slope(fold_old, packed)
    print(f"fold axis0-strided:      {t*1e3:8.3f} ms")

    planes = jnp.asarray(np.ascontiguousarray(
        np.transpose(np.asarray(packed), (1, 2, 0)))).reshape(2, 2, r, 1024)

    def fold_planes(v):
        e = v[..., 0::2]
        o = v[..., 1::2]
        a0 = (alpha[0, 0], alpha[0, 1])
        a1 = (alpha[1, 0], alpha[1, 1])
        a0 = tuple(jnp.broadcast_to(w, o[0, 0].shape) for w in a0)
        a1 = tuple(jnp.broadcast_to(w, o[0, 0].shape) for w in a1)
        v0l, v0h = gl.mul_planar(o[0, 0], o[0, 1], *a0)
        v1l, v1h = gl.mul_planar(o[1, 0], o[1, 1], *a1)
        sxl, sxh = gl.add_planar(o[0, 0], o[0, 1], o[1, 0], o[1, 1])
        syl, syh = gl.add_planar(*a0, *a1)
        sl, sh = gl.mul_planar(sxl, sxh, syl, syh)
        t2 = gl.add_planar(v1l, v1h, v1l, v1h)
        t4 = gl.add_planar(*t2, *t2)
        t8 = gl.add_planar(*t4, *t4)
        n7 = gl.sub_planar(*t8, v1l, v1h)
        c0 = gl.add_planar(v0l, v0h, *n7)
        vv = gl.add_planar(v0l, v0h, v1l, v1h)
        c1 = gl.sub_planar(sl, sh, *vv)
        r0 = gl.add_planar(e[0, 0], e[0, 1], *c0)
        r1 = gl.add_planar(e[1, 0], e[1, 1], *c1)
        half = jnp.stack([jnp.stack(r0), jnp.stack(r1)])
        return jnp.concatenate([half, half], axis=3)

    t = slope(fold_planes, planes)
    print(f"fold planes 2D:          {t*1e3:8.3f} ms")

    # NTT (MXU path) 2^20 and 2^21 batch 2
    from ministark_tpu.ops.ntt_device import get_ntt_fns

    for logn in (20, 21):
        n = 1 << logn
        x = jnp.asarray(gl.pack(
            rng.integers(0, 1 << 62, size=(2, n), dtype=np.uint64)))
        fft = get_ntt_fns(GOLDILOCKS_FP, n)[0]
        t = slope(fft, x)
        bw = 2 * n * 8 * 8 / 1e9
        print(f"ntt 2^{logn} batch2:        {t*1e3:8.3f} ms  (8-pass model {bw/t:6.1f} GB/s)")

    # gl mul interleaved (n, 2)
    a = jnp.asarray(gl.pack(rng.integers(0, 1 << 62, size=(1 << 22,), dtype=np.uint64)))
    t = slope(lambda v: gl.mul(v, v), a)
    print(f"gl mul 2^22:             {t*1e3:8.3f} ms  {(1<<22)/t/1e9:5.2f} Gmul/s")


if __name__ == "__main__":
    main()
