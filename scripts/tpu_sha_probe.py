"""Hardware validation + slope timing for the Pallas SHA-256 path.

Checks (real TPU, Mosaic lowering — interpret tests do NOT cover this):
1. row_digests_tr / inner_level_tr / build_digests_tr bit-identical to the
   XLA path (ops/sha256.py) at bench-relevant sizes.
2. Slope-timed A/B of the full 4-ary tree build at 2^21 leaves x 4 comps
   (the `batched_commit_2^20_b4_arity4` hot path).

Run: python scripts/tpu_sha_probe.py        (on the axon TPU)
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

from ministark_tpu.commit.index_tree import _build_digests  # noqa: E402
from ministark_tpu.ops import sha256_pallas as sp  # noqa: E402
from ministark_tpu.ops.sha256 import (  # noqa: E402
    _inner_level,
    binary_row_digests,
)


def main():
    print("backend:", jax.default_backend())
    assert sp._on_tpu(), "run on the TPU"
    rng = np.random.default_rng(7)
    os.environ["MINISTARK_SHA_PALLAS"] = "0"  # XLA refs below

    # --- 1. bit checks ---
    for n, c in ((1 << 13, 2), (1 << 15, 4), (1 << 13, 6)):
        comps = jnp.asarray(rng.integers(
            0, 1 << 32, size=(n, c, 2), dtype=np.uint64).astype(np.uint32))
        want = np.asarray(binary_row_digests(comps))
        got = np.asarray(sp.row_digests_tr(comps, interpret=False).T)
        ok = np.array_equal(got, want)
        print(f"row_digests n=2^{n.bit_length()-1} c={c}: "
              f"{'OK' if ok else 'MISMATCH'}")
        assert ok

    for fan in (2, 4, 8):
        n = sp.MIN_LANES * fan
        dig = jnp.asarray(rng.integers(
            0, 1 << 32, size=(n, 8), dtype=np.uint64).astype(np.uint32))
        want = np.asarray(_inner_level(dig, fan))
        got = np.asarray(sp.inner_level_tr(dig.T, fan, interpret=False).T)
        ok = np.array_equal(got, want)
        print(f"inner_level fan={fan}: {'OK' if ok else 'MISMATCH'}")
        assert ok

    for n, c, arity in ((1 << 15, 4, 4), (1 << 14, 2, 2), (1 << 15, 2, 8)):
        comps = jnp.asarray(rng.integers(
            0, 1 << 32, size=(n, c, 2), dtype=np.uint64).astype(np.uint32))
        want = np.asarray(_build_digests(comps, arity))
        got = np.asarray(sp.build_digests_tr(comps, arity, interpret=False))
        ok = np.array_equal(got, want)
        print(f"build_digests n=2^{n.bit_length()-1} c={c} arity={arity}: "
              f"{'OK' if ok else 'MISMATCH'}")
        assert ok

    # --- 2. slope timing of the big tree build ---
    n, c, arity = 1 << 21, 4, 4
    comps = jnp.asarray(rng.integers(
        0, 1 << 32, size=(n, c, 2), dtype=np.uint64).astype(np.uint32))

    def slope(fn, k1=2, k2=6):
        import jax.lax as lax

        def chain(k):
            @jax.jit
            def run(x):
                def body(i, u):
                    d = fn(lax.optimization_barrier(u))
                    # feed a digest-dependent perturbation back so the
                    # iterations cannot collapse
                    return u.at[0, 0, 0].set(d[0, 0])
                return lax.fori_loop(0, k, body, x)
            y = run(comps)
            jax.block_until_ready(y)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(run(comps))
                best = min(best, time.time() - t0)
            return best

        return (chain(k2) - chain(k1)) / (k2 - k1)

    t_xla = slope(lambda x: _build_digests(x, arity))
    t_pl = slope(lambda x: sp.build_digests_tr(x, arity, interpret=False))
    print(f"tree build 2^21x{c} arity-{arity}: XLA {t_xla*1e3:.1f} ms, "
          f"pallas {t_pl*1e3:.1f} ms ({t_xla/t_pl:.1f}x)")


if __name__ == "__main__":
    main()
