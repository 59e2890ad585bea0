"""Kernel-level benchmarks: field-op and NTT throughput vs roofline.

Measures steady-state device throughput for the hot kernels (BASELINE.md:
"LDE-NTT and FRI folding >= 80% of per-chip roofline") and prints one JSON
line per kernel. Roofline model: these kernels are HBM-bandwidth-bound --
bytes moved per transform / measured time vs the chip's peak bandwidth
(TPU v5e ~819 GB/s).

Measurement method: SLOPE timing. Each kernel is chained K data-dependent
iterations inside ONE jit (lax.fori_loop threading the output back as
input, an optimization_barrier per iteration), at two iteration counts;
the marginal per-iteration cost is the slope (t_K2 - t_K1) / (K2 - K1).
This cancels the ~40 ms fixed per-dispatch overhead of this environment's
TPU tunnel, which at small K inflates every naive measurement (measured:
copy streams at ~610 GB/s by slope vs ~60 GB/s naive at K=8).

Run on TPU (default backend) or CPU (JAX_PLATFORMS=cpu) -- absolute numbers
only mean something on the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", 819))


def _time_chained(fn, x, k1=8, k2=40):
    """Marginal per-iteration device time of x -> fn(x) by slope (two
    static-trip-count executables; a dynamic trip count wedges this
    environment's remote-compile service).

    Returns None when the slope stays non-positive after a retry — the
    tunnel's dispatch latency occasionally spikes during one of the two
    measurements and a negative slope clamped to epsilon once printed a
    67-million-GB/s hbm_stream entry; a dropped entry beats an absurd
    one."""
    import jax.lax as lax

    body = lambda i, u: lax.optimization_barrier(fn(u))

    def timed(k, reps=3):
        chain = jax.jit(lambda v: lax.fori_loop(0, k, body, v))
        y = chain(x)
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(chain(y))
            best = min(best, time.time() - t0)
        return best

    for _attempt in range(2):
        slope = (timed(k2) - timed(k1)) / (k2 - k1)
        if slope > 0:
            return slope
        print("# non-positive slope (tunnel latency spike); retrying",
              file=sys.stderr)
    return None


def kernel_rooflines(deadline=None):
    """Measure the hot kernels; returns a list of result dicts.

    ``deadline``: optional absolute time.time() cutoff — on a cold host the
    per-entry compiles through the remote-compile tunnel can eat a whole
    bench attempt; when past the deadline the remaining entries are skipped
    (with a stderr note) so the caller still ships its headline JSON."""

    def past_deadline(stage: str) -> bool:
        if deadline is not None and time.time() > deadline:
            print(f"# kernel bench deadline hit; skipping from: {stage}",
                  file=sys.stderr)
            return True
        return False

    from ministark_tpu.fields import GOLDILOCKS_FP, GOLDILOCKS_FP2
    from ministark_tpu.ops import gl
    from ministark_tpu.ops.ntt_device import get_ntt_fns
    from ministark_tpu.ops.registry import get_kernels

    results = []
    rng = np.random.default_rng(0)

    # --- Goldilocks elementwise multiply (VPU) ---
    n = 1 << 22
    a = jnp.asarray(gl.pack(rng.integers(0, 1 << 62, size=n, dtype=np.uint64)))
    t = _time_chained(lambda v: gl.mul(v, a), a)
    if t is not None:
        results.append({
            "metric": "gl_mul_throughput", "value": round(n / t / 1e9, 2),
            "unit": "Gop/s",  # VPU-bound at this size; no roofline fraction
        })

    if past_deadline('hbm_stream'):
        return results
    # --- HBM stream calibration (attainable bandwidth by slope) ---
    ns = 1 << 24
    st = jnp.asarray(rng.integers(0, 1 << 32, size=ns, dtype=np.uint64)
                     ).astype(jnp.uint32)

    def stream(v):
        # reduction-coupled body: the .sum() forces a FULL read of the
        # array every iteration even after XLA unrolls the timing loop and
        # fuses the elementwise parts into a register chain (a pure
        # elementwise body measured an impossible ~7000 GB/s that way —
        # 40 iterations collapsed to one read+write). One read per
        # iteration is the traffic this measures.
        return v + v.sum()

    t = _time_chained(stream, st)
    if t is not None:
        gbps = 4 * ns / t / 1e9
        # plausibility clamp: the v5e's nominal HBM bandwidth is 819 GB/s;
        # a reading above it means XLA folded the chain (one such run
        # printed 6772 GB/s) — drop it rather than ship physics-breaking
        # calibration into the driver JSON
        if gbps <= 900:
            results.append({
                "metric": "hbm_stream",
                "value": round(gbps, 0), "unit": "GB/s",  # read rate
            })
        else:
            print(f"# hbm_stream implausible ({gbps:.0f} GB/s); dropped",
                  file=sys.stderr)

    if past_deadline('planar mul calibration'):
        return results
    # --- planar field-mul calibration (speed-of-light denominators) ---
    # The limb-planar layout multiplies far faster than the packed layout
    # measured above; the hot kernels (fold+div, NTT recombine) run planar,
    # so their compute bounds must use THESE rates (BENCHMARKS.md
    # "speed of light" table).
    from ministark_tpu.ops.planar import get_planar

    ke2 = get_kernels(GOLDILOCKS_FP2)
    pc2 = get_planar(ke2)
    mpl = 1 << 21
    # the kernels' actual layout: (C, rows, 1024) row view — a flat (C, m)
    # puts C=4 on the sublane axis and wastes half of every (8, 128) tile
    pl = jnp.asarray(
        rng.integers(0, 1 << 31, size=(4, mpl // 1024, 1024), dtype=np.uint64)
    ).astype(jnp.uint32)
    t = _time_chained(lambda v: pc2.mul(v, pl), pl)
    if t is not None:
        results.append({
            "metric": "fp2_mul_planar_throughput",
            "value": round(mpl / t / 1e9, 2),
            "unit": "Gext/s",  # 1 ext mul = 3 base muls (Karatsuba)
        })
    pcb = get_planar(get_kernels(GOLDILOCKS_FP))
    plb = pl[:2]  # (2, rows, 1024)
    t = _time_chained(lambda v: pcb.mul(v, plb), plb)
    if t is not None:
        results.append({
            "metric": "gl_mul_planar_throughput",
            "value": round(mpl / t / 1e9, 2),
            "unit": "Gop/s",
        })

    if past_deadline('mxu_s8_matmul'):
        return results
    # --- MXU s8 MAC rate (the NTT dot's denominator) ---
    if jax.default_backend() in ("tpu", "axon"):
        import jax.lax as lax

        dm = 4096
        a8 = jnp.asarray(
            rng.integers(-128, 128, size=(dm, dm), dtype=np.int64)
        ).astype(jnp.int8)
        b8 = jnp.asarray(
            rng.integers(-128, 128, size=(dm, dm), dtype=np.int64)
        ).astype(jnp.int8)

        def s8dot(v):
            y = lax.dot_general(v, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            # feed the s32 result back as s8 so the chain stays data-dep
            return (y & 127).astype(jnp.int8)

        t = _time_chained(s8dot, a8)
        if t is not None:
            results.append({
                "metric": "mxu_s8_matmul_4096",
                "value": round(dm**3 / t / 1e12, 1),
                "unit": "TMAC/s",
            })

    if past_deadline('gl_ntt'):
        return results
    # --- LDE-NTT (the headline kernel; MXU int8-matmul path on TPU) ---
    for logn in (20, 21):
        m = 1 << logn
        batch = 2
        x = jnp.asarray(gl.pack(
            rng.integers(0, 1 << 62, size=(batch, m), dtype=np.uint64)))
        fft, _, _, _ = get_ntt_fns(GOLDILOCKS_FP, m)
        t = _time_chained(fft, x)
        # roofline model: ~4 read+write passes of the array (prep, two
        # matmul levels' operands, finish) = 64 B/element
        bytes_moved = batch * m * 8 * 8
        if t is not None:
            results.append({
                "metric": f"gl_ntt_2^{logn}_batch{batch}",
                "value": round(t * 1e3, 2), "unit": "ms",
                "roofline_frac": round(bytes_moved / t / (HBM_GBPS * 1e9), 3),
            })

    if past_deadline('gl_ntt_fused'):
        return results
    # --- fused Pallas MXU-NTT levels (opt-in path, A/B vs the XLA MXU) ---
    if jax.default_backend() in ("tpu", "axon") and \
            os.environ.get("BENCH_SKIP_FUSED") != "1":
        from ministark_tpu.ops import ntt_mxu

        for logn in (20, 21):
            m = 1 << logn
            x = jnp.asarray(gl.pack(
                rng.integers(0, 1 << 62, size=(2, m), dtype=np.uint64)))
            old = os.environ.get("MINISTARK_MXU_FUSED")
            try:
                os.environ["MINISTARK_MXU_FUSED"] = "1"
                fns = ntt_mxu.make_mxu_ntt_fns(GOLDILOCKS_FP, m)
                os.environ["MINISTARK_MXU_FUSED"] = "0"
                xla_fns = ntt_mxu.make_mxu_ntt_fns(GOLDILOCKS_FP, m)
            finally:
                if old is None:
                    os.environ.pop("MINISTARK_MXU_FUSED", None)
                else:
                    os.environ["MINISTARK_MXU_FUSED"] = old
            try:
                # bit-check oracle: the INDEPENDENT non-MXU device NTT
                # (ops/ntt_device.make_ntt_fns — shares no digit/recombine
                # tables with either MXU path, same oracle tests use)
                from ministark_tpu.ops.ntt_device import make_ntt_fns

                ref = make_ntt_fns(GOLDILOCKS_FP, m)[0]
                y_ref = np.asarray(ref(x))
                assert np.array_equal(np.asarray(fns[0](x)), y_ref), \
                    "fused NTT mismatch vs independent oracle"
                assert np.array_equal(np.asarray(xla_fns[0](x)), y_ref), \
                    "XLA MXU NTT mismatch vs independent oracle"
                bytes_moved = 2 * m * 8 * 8
                t = _time_chained(fns[0], x)
                if t is not None:
                    results.append({
                        "metric": f"gl_ntt_fused_2^{logn}_batch2",
                        "value": round(t * 1e3, 2), "unit": "ms",
                        "roofline_frac": round(
                            bytes_moved / t / (HBM_GBPS * 1e9), 3),
                    })
                # true A/B: the non-fused XLA-lowered MXU path, TIMED (the
                # fused-vs-XLA comparison is driver-visible, not just a
                # bit-check)
                t2 = _time_chained(xla_fns[0], x)
                if t2 is not None:
                    results.append({
                        "metric": f"gl_ntt_xla_2^{logn}_batch2",
                        "value": round(t2 * 1e3, 2), "unit": "ms",
                        "roofline_frac": round(
                            bytes_moved / t2 / (HBM_GBPS * 1e9), 3),
                    })
            except Exception as e:  # Mosaic may reject until validated
                print(f"# fused NTT 2^{logn} failed: {e}", file=sys.stderr)

    if past_deadline('fri_fold_div'):
        return results
    # --- FRI fold+divide round: the engine's EXACT per-round executable
    # (stark/engine._fold_div_fused: planar even/odd fold + DEEP subtract +
    # blocked local-power division by (x - z); output at the natural halved
    # length). The kernel halves its shape, so for slope timing each
    # iteration re-pads the m/2 quotient back to m (one extra m-length
    # write, charged against the kernel — the reported time is a slight
    # OVERestimate). Reference hot loop: fri.rs:96-101.
    from ministark_tpu.stark.engine import _fold_div_fused

    ke = get_kernels(GOLDILOCKS_FP2)
    ext = GOLDILOCKS_FP2
    m = 1 << 21
    coeffs = jnp.asarray(
        gl.pack(rng.integers(0, 1 << 62, size=(m, 2), dtype=np.uint64))
    )
    z = ext.from_base_coeffs((12345, 67890))
    alpha = ext.from_base_coeffs((99991, 31337))
    dv = ext.from_base_coeffs((777, 4242))
    zp = jnp.asarray(ke.pack_scalar(z))
    ap = jnp.asarray(ke.pack_scalar(alpha))
    dvp = jnp.asarray(ke.pack_scalar(dv))
    zinv = jnp.asarray(ke.pack_scalar(ext.inv(z)))

    def fold_div_round(c):
        q = _fold_div_fused(ke, c, zp, ap, dvp, zinv)       # (m/2, 2, 2)
        return jnp.concatenate([q, q], axis=0)              # re-pad to m

    t = _time_chained(fold_div_round, coeffs)
    # HBM model: one read of m + one write of m/2 packed fp2 elements
    # (16 B each). The true binding resource is the VPU field-mul rate —
    # see BENCHMARKS.md "speed of light" for the recomputable bound.
    bytes_moved = m * 16 + (m // 2) * 16
    if t is not None:
        results.append({
            "metric": "fri_fold_div_2^21_fp2", "value": round(t * 1e3, 2),
            "unit": "ms",
            "roofline_frac": round(bytes_moved / t / (HBM_GBPS * 1e9), 3),
        })

    if past_deadline('fri_fold_div_chain'):
        return results
    # --- the whole geometric FRI fold chain 2^21 -> 2^12 in one jit: what
    # a 2^20-row prove actually pays for ALL device fold+div rounds
    # (geometric sizing; was ~rounds x the padded first-round cost)
    @jax.jit
    def fold_div_chain(c):
        cur = c
        while cur.shape[0] > (1 << 12):
            cur = _fold_div_fused(ke, cur, zp, ap, dvp, zinv)
        return ke.add(c, jnp.broadcast_to(cur[0:1], c.shape))

    t = _time_chained(fold_div_chain, coeffs)
    if t is not None:
        results.append({
            "metric": "fri_fold_div_chain_2^21_to_2^12",
            "value": round(t * 1e3, 2), "unit": "ms",
        })

    if past_deadline('batched_commit'):
        return results
    # --- batched multi-poly FRI commit, 4-ary tree (BASELINE config 4) ---
    # 4 polys of 2^20 coeffs LDE'd to 2^21 + one 4-ary row tree over the
    # 2^21 x 4 value matrix. Hash-bound (VPU), so reported as leaf rows/s.
    from ministark_tpu.fri.batched import BatchedFri, BatchedFriConfig

    bfri = BatchedFri(BatchedFriConfig(GOLDILOCKS_FP2, blowup=2, arity=4))
    bb_, nb_ = 4, 1 << 20
    pv = rng.integers(0, GOLDILOCKS_FP.p, size=(bb_, nb_, 2), dtype=np.uint64)
    polys = jnp.asarray(
        np.stack([(pv & 0xFFFFFFFF).astype(np.uint32),
                  (pv >> 32).astype(np.uint32)], axis=-1))
    tree = bfri.commit(polys)                       # compile + warm
    jax.block_until_ready(tree._digests)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(bfri.commit(polys)._digests)
        best = min(best, time.time() - t0)
    results.append({
        "metric": "batched_commit_2^20_b4_arity4",
        "value": round(best * 1e3, 2), "unit": "ms",
        "leaf_rows_per_s": round(2 * nb_ / best / 1e6, 2),  # Mrows/s
    })

    if past_deadline('batched_commit_dev'):
        return results
    # device time by SLOPE: the naive number above includes ~26-40 ms of
    # tunnel dispatch RTT (round-4 probe scripts/tpu_commit_breakdown.py:
    # 43.6 ms naive vs 17.4 ms chained device body = FFT 8.4 + coset-row
    # transpose 0.9 + tree 8.3) — every other kernel entry is slope-timed,
    # so this is the comparable one
    from ministark_tpu.fri.batched import _rows_tree_jit

    limbed_ = bfri._limbed()
    Nn_ = 2 * nb_

    def commit_body(p):
        ev = bfri._fft_batched(p, Nn_)
        r = bfri._coset_rows(ev, 4)
        _, d = _rows_tree_jit(limbed_, 4, r)
        return p.at[0, 0, 0, 0].set(d[0, 0])

    t = _time_chained(commit_body, polys, k1=2, k2=6)
    if t is not None:
        results.append({
            "metric": "batched_commit_dev_2^20_b4_arity4",
            "value": round(t * 1e3, 2), "unit": "ms",
            "leaf_rows_per_s": round(2 * nb_ / t / 1e6, 2),
        })

    if past_deadline('sha_tree'):
        return results
    # --- SHA-256 tree build A/B: Pallas VMEM compression vs the XLA
    # path (digest-identical; commit/index_tree dispatches Pallas on TPU)
    from ministark_tpu.commit.index_tree import _build_digests_xla
    from ministark_tpu.ops import sha256_pallas as sp

    nt = 1 << 21
    comps = jnp.asarray(rng.integers(
        0, 1 << 32, size=(nt, 4, 2), dtype=np.uint64).astype(np.uint32))

    def chainable(build):
        def body(u):
            d = build(u)
            return u.at[0, 0, 0].set(d[0, 0])  # digest-dependent feedback
        return body

    for name, build in (
        ("sha_tree_pallas_2^21x4_arity4",
         lambda u: sp.build_digests_tr(u, 4, interpret=False)),
        ("sha_tree_xla_2^21x4_arity4",
         lambda u: _build_digests_xla(u, 4)),
    ):
        if "pallas" in name and jax.default_backend() not in ("tpu", "axon"):
            continue
        t = _time_chained(chainable(build), comps, k1=2, k2=8)
        if t is not None:
            results.append({
                "metric": name, "value": round(t * 1e3, 2), "unit": "ms",
            })
    return results


def main():
    for r in kernel_rooflines():
        print(json.dumps(r))


if __name__ == "__main__":
    main()
