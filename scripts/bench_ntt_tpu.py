"""Compare NTT implementations on the real TPU (default axon backend).

Usage: python scripts/bench_ntt_tpu.py [logn ...]   (default 20 21)
Prints per-size timings for the XLA four-step and the Pallas VMEM four-step,
plus HBM-roofline fractions (model: 2 HBM passes = the algorithmic minimum
read+write of the array).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp
import numpy as np

HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", 819))


def _time(fn, x, iters=int(os.environ.get("BENCH_NTT_ITERS", 32))):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = fn(cur)
    jax.block_until_ready(cur)
    return (time.time() - t0) / iters


def main():
    from ministark_tpu.fields import GOLDILOCKS_FP
    from ministark_tpu.ops import gl
    from ministark_tpu.ops.ntt_device import _make_four_step_fns
    from ministark_tpu.ops.ntt_pallas import make_pallas_ntt_fns, supports

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    logns = [int(a) for a in sys.argv[1:]] or [20, 21]
    batch = int(os.environ.get("BENCH_NTT_BATCH", 2))

    for logn in logns:
        n = 1 << logn
        x = jnp.asarray(gl.pack(
            rng.integers(0, 1 << 62, size=(batch, n), dtype=np.uint64)))
        jax.block_until_ready(x)
        rows = {}
        t0 = time.time()
        fs_fft = _make_four_step_fns(GOLDILOCKS_FP, n)[0]
        rows["four_step"] = (_time(fs_fft, x), time.time() - t0)
        if supports(n):
            t0 = time.time()
            pal_fft = make_pallas_ntt_fns(GOLDILOCKS_FP, n)[0]
            rows["pallas"] = (_time(pal_fft, x), time.time() - t0)
            # cross-check a few entries
            a = np.asarray(fs_fft(x)[0, :64])
            b = np.asarray(pal_fft(x)[0, :64])
            assert np.array_equal(a, b), "pallas != four_step on TPU!"
        bytes_min = batch * n * 8 * 2  # read + write once
        for name, (t, build) in rows.items():
            frac = bytes_min / t / (HBM_GBPS * 1e9)
            print(f"2^{logn} batch{batch} {name:10s}: {t*1e3:8.2f} ms  "
                  f"(min-traffic roofline {frac*100:5.1f}%)  [build+compile {build:.1f}s]")


if __name__ == "__main__":
    main()
