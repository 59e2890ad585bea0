"""Name the BabyBear-vs-Goldilocks per-phase gap (VERDICT r3 item 4).

At 2^20 rows the BB parity prove measures ~0.6x GL's rows/s. The protocol
math is near-identical (both: 21 FRI rounds, 3 FRI queries/round; BB has 2
DEEP-ALI linking queries vs 1 — negligible). This probe slope-times the
actual per-round building blocks both fields use at the same size so the
difference gets a named owner:

  1. ext codeword NTT at 2^21 (engine _ext_fft: component-batched base
     NTT — 4 u32 components for BB/Fp4 vs 2x2-limb planes for GL/Fp2);
  2. FRI round tree build at 2^21 (decimal-Display leaf hashing — Fp4
     preimages are 4 ~10-digit components vs Fp2's 2 ~20-digit);
  3. fold+divide round at 2^21 ext.

Run on the TPU: python scripts/tpu_bb_vs_gl_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MINISTARK_DEVICE_HASH", "1")

from ministark_tpu.fields import BabyBear, Goldilocks  # noqa: E402
from ministark_tpu.ops.registry import get_kernels  # noqa: E402
from ministark_tpu.stark import StarkConfig  # noqa: E402
from ministark_tpu.stark.engine import (  # noqa: E402
    DeviceEngine,
    _fold_div_jit,
)


def slope(fn, x, k1=2, k2=8):
    import jax.lax as lax

    def chain(k):
        @jax.jit
        def run(v):
            def body(i, u):
                return lax.optimization_barrier(fn(u))
            return lax.fori_loop(0, k, body, v)

        y = run(x)
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(x))
            best = min(best, time.time() - t0)
        return best

    return (chain(k2) - chain(k1)) / (k2 - k1)


def main():
    print("backend:", jax.default_backend())
    n = 1 << 21
    rng = np.random.default_rng(5)
    for sf in (Goldilocks, BabyBear):
        steps = n // 2 - 1
        cfg = StarkConfig(sf, 20, 2, steps, 6)
        eng = DeviceEngine(cfg)
        ke = get_kernels(sf.extension)
        half = jnp.asarray(rng.integers(
            0, 1 << 30, size=(n // 2,) + tuple(ke.elem_axes),
            dtype=np.uint64).astype(np.uint32))
        sc = jnp.asarray(ke.pack_scalar(sf.extension.from_int(3)))

        # raw component-batched base NTT at the engine's codeword shape
        # (BB/Fp4: 4 u32 components; GL/Fp2: 2 components x 2 limbs) —
        # created OUTSIDE the chain so the device twiddle tables exist
        # before tracing (lazy creation inside a jit leaks tracers)
        from ministark_tpu.ops.ntt_device import get_ntt_fns

        fft = get_ntt_fns(sf.base, n)[0]
        d = 4 if ke.elem_axes == (4,) else 2
        comp_shape = ((d, n) if ke.elem_axes == (4,) else (d, n, 2))
        comp = jnp.asarray(rng.integers(
            0, 1 << 30, size=comp_shape, dtype=np.uint64).astype(np.uint32))
        fft(comp).block_until_ready()
        t_fft = slope(fft, comp)
        print(f"{sf.name}: codeword NTT 2^21 x{d} components: "
              f"{t_fft*1e3:.2f} ms", flush=True)

        def fold_body(v):
            out = _fold_div_jit(ke, v, sc, sc, sc, sc)
            return jnp.concatenate([out, out], axis=0)

        _fold_div_jit(ke, half, sc, sc, sc, sc)  # create/warm outside chain
        t_fold = slope(fold_body, half)
        print(f"{sf.name}: fold+divide coeffs 2^20 (+dup): {t_fold*1e3:.2f} ms",
              flush=True)

        # tree build: wall (one shot, warm twice) — the tree constructor
        # has host-side assembly, so slope-chaining doesn't apply
        cw = eng._ext_fft(half, n)
        jax.block_until_ready(cw)
        eng._fri_round_tree(cw)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            tr = eng._fri_round_tree(cw)
            jax.block_until_ready(tr._dev_digests
                                  if tr._dev_digests is not None else cw)
            best = min(best, time.time() - t0)
        print(f"{sf.name}: FRI round tree 2^21 (decimal leaves): "
              f"{best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
