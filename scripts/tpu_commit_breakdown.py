"""Decompose the batched-commit time on real hardware (slope vs naive).

Question (round 4): `batched_commit_2^20_b4_arity4` is the one bench entry
still timed NAIVELY (single dispatch wall time) and reads 53.4 ms vs a
~21 ms op-count bound — but this environment's tunnel charges ~40 ms RTT
per dispatch, which slope timing cancels everywhere else. This probe
slope-times the commit's full device body (LDE NTTs + coset-row transpose
+ SHA tree, one chained executable) and its stages separately, next to the
naive number, to attribute the gap: device compute vs tunnel dispatch.

Run with an ISOLATED compile cache (never share .jax_cache with a
concurrent jax process):
    JAX_COMPILATION_CACHE_DIR=/tmp/probe_cache python scripts/tpu_commit_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/probe_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp
import numpy as np

from ministark_tpu.fields import GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.fri.batched import BatchedFri, BatchedFriConfig, _rows_tree_jit


def slope(fn, x, k1=2, k2=6, reps=3):
    body = lambda i, u: lax.optimization_barrier(fn(u))

    def timed(k):
        chain = jax.jit(lambda v: lax.fori_loop(0, k, body, v))
        y = chain(x)
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(chain(y))
            best = min(best, time.time() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    bfri = BatchedFri(BatchedFriConfig(GOLDILOCKS_FP2, blowup=2, arity=4))
    B, n = 4, 1 << 20
    N = 2 * n
    F = 4
    pv = rng.integers(0, GOLDILOCKS_FP.p, size=(B, n, 2), dtype=np.uint64)
    polys = jnp.asarray(
        np.stack([(pv & 0xFFFFFFFF).astype(np.uint32),
                  (pv >> 32).astype(np.uint32)], axis=-1))
    limbed = bfri._limbed()

    # naive: the current bench measurement (dispatch RTT included)
    tree = bfri.commit(polys)
    jax.block_until_ready(tree._digests)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(bfri.commit(polys)._digests)
        best = min(best, time.time() - t0)
    print(f"naive_commit_ms {best * 1e3:.2f}", flush=True)

    # stage: LDE NTT alone
    def fft_body(p):
        ev = bfri._fft_batched(p, N)
        return p.at[0, 0, 0, 0].set(ev[0, 0, 0, 0])

    print(f"slope_fft_ms {slope(fft_body, polys) * 1e3:.2f}", flush=True)

    # stage: coset-row transpose alone
    evals = bfri._fft_batched(polys, N)
    jax.block_until_ready(evals)

    def coset_body(ev):
        r = bfri._coset_rows(ev, F)
        return ev.at[0, 0, 0, 0].set(r[0, 0, 0, 0, 0])

    print(f"slope_coset_ms {slope(coset_body, evals) * 1e3:.2f}", flush=True)

    # stage: rows -> tree digests alone (Pallas SHA path on TPU)
    rows = bfri._coset_rows(evals, F)
    jax.block_until_ready(rows)
    print(f"# rows shape {rows.shape}", flush=True)

    def tree_body(r):
        _, d = _rows_tree_jit(limbed, 4, r)
        return r.at[0, 0, 0, 0, 0].set(d[0, 0])

    print(f"slope_tree_ms {slope(tree_body, rows) * 1e3:.2f}", flush=True)

    # full device body of commit(), one chained executable
    def commit_body(p):
        ev = bfri._fft_batched(p, N)
        r = bfri._coset_rows(ev, F)
        _, d = _rows_tree_jit(limbed, 4, r)
        return p.at[0, 0, 0, 0].set(d[0, 0])

    print(f"slope_commit_ms {slope(commit_body, polys) * 1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
