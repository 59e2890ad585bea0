"""Reproduce + bisect the XLA "circular simplification loop" warning on the
sharded MiMC generic core (VERDICT r3 weak #5 / next #6).

Runs on an 8-device virtual CPU mesh with an ISOLATED compile cache (safe to
run concurrently with TPU work against .jax_cache). The warning is emitted
by algebraic_simplifier.cc at ERROR severity; we capture stderr per variant.

Variants swap the cubic transition's body to isolate the trigger:
  fib           — fibonacci core (known clean control)
  mimc          — shipped MiMC (barrier-fenced cube)
  mimc-nobarrier— unfenced t*t*t
  mimc-square   — t*t only
  mimc-linear   — no multiply at all (NTT sandwich kept)
  mimc-nontt    — fenced cube, NTT sandwich removed
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

VARIANTS = ["fib", "mimc", "mimc-nobarrier", "mimc-square", "mimc-linear",
            "mimc-nontt", "foldfns", "foldonly", "deeponly", "divideonly",
            "ldecheck"]

if os.environ.get("MIMC_PROBE_INNER") != "1":
    only = os.environ.get("MIMC_PROBE_ONLY")
    for variant in (only.split(",") if only else VARIANTS):
        env = dict(os.environ, MIMC_PROBE_INNER="1",
                   MIMC_PROBE_VARIANT=variant,
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                              + " --xla_backend_optimization_level="
                              + os.environ.get("MIMC_PROBE_OPTLEVEL", "1")
                              ).strip())
        env.pop("JAX_PLATFORMS", None)
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=900, cwd=REPO)
        warn = "circular simplification" in proc.stderr
        tail = [l for l in proc.stderr.splitlines() if "Traceback" in l]
        print(f"{variant:16s} rc={proc.returncode} "
              f"circular_warning={warn} {tail[:1]}", flush=True)
    sys.exit(0)

sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_mimc_probe")

import jax.numpy as jnp
import numpy as np

from ministark_tpu.fields import Goldilocks
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
from ministark_tpu.models.mimc import mimc_device_trace, round_constant
from ministark_tpu.ops.ntt_device import (_bitrev_indices, _field_ops,
                                          _ntt_fori, _root_powers_table)
from ministark_tpu.ops.registry import get_kernels
from ministark_tpu.parallel.mesh import make_mesh
from ministark_tpu.poly.domain import Radix2EvaluationDomain
from ministark_tpu.stark.core import make_sharded_prove_core

sf = Goldilocks
base = sf.base
kb = get_kernels(base)
n = 256
mesh = make_mesh(8)
variant = os.environ.get("MIMC_PROBE_VARIANT", "mimc")


def patched_mimc_builder(stark_field, steps, **kw):
    dt = mimc_device_trace(stark_field, steps, **kw)
    if variant == "mimc":
        return dt
    p = base.p
    nn = steps + 1
    ops = _field_ops(base)
    root = base.get_root_of_unity(nn)
    rev = np.asarray(_bitrev_indices(nn))
    tw = np.asarray(ops.pack(list(_root_powers_table(p, root, nn // 2))))
    twi = np.asarray(ops.pack(
        list(_root_powers_table(p, base.inv(root), nn // 2))))
    n_inv = np.asarray(ops.pack([base.inv(base.from_int(nn))])[0])
    k_packed = np.asarray(
        kb.pack([base.from_int(round_constant(i, p)) for i in range(nn)]))

    def cubic_inline(tp):
        if variant == "mimc-nontt":
            t = tp[0]
            t2 = jax.lax.optimization_barrier(kb.mul(t, t))
            return kb.sub(kb.mul(t2, t), tp[1])
        evs = _ntt_fori(ops, tp[:2], rev, tw, nn)
        t = kb.add(evs[0], jnp.asarray(k_packed))
        if variant == "mimc-linear":
            c = kb.sub(t, evs[1])
        elif variant == "mimc-square":
            c = kb.sub(kb.mul(t, t), evs[1])
        else:  # mimc-nobarrier
            c = kb.sub(kb.mul(kb.mul(t, t), t), evs[1])
        y = _ntt_fori(ops, c[None], rev, twi, nn)
        return ops.mul(y, n_inv[None, None])[0]

    object.__setattr__(dt, "transitions_inline", [cubic_inline, dt.transitions_inline[1]])
    return dt


if variant.startswith("deep-"):
    # piecewise variants of _deep_body under the same shard_map specs
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ministark_tpu.fields import GOLDILOCKS_FP2
    from ministark_tpu.ops.ntt_device import _pow_traced
    from ministark_tpu.ops.poly_device import field_sum, powers
    from ministark_tpu.parallel.fri_sharded import (_allreduce_field, _dot,
                                                    _pow2_chain)

    ke = get_kernels(GOLDILOCKS_FP2)
    mg = 32
    ml = mg // 8
    d_bits = 3
    axis = "shards"
    elem_spec = [None] * len(ke.elem_axes)
    vec_spec = P(axis, *elem_spec)
    scalar_spec = P(*elem_spec)

    def body(coeffs_local, zs):
        d = jax.lax.axis_index(axis)
        even = coeffs_local[0::2]
        half = even.shape[0]
        if variant == "deep-powonly":
            pw = powers(ke, zs, half)
            return _allreduce_field(ke, field_sum(ke, pw, axis=0), axis)
        if variant == "deep-fsum":
            return _allreduce_field(ke, even[0], axis)
        if variant == "deep-gather":
            return jax.lax.all_gather(even[0], axis)[0]
        if variant == "deep-pownoreduce":
            pw = powers(ke, zs, half)
            return jax.lax.all_gather(ke.add(pw[0], pw[1]), axis)[0]
        if variant == "deep-fsumlocal":
            return jax.lax.all_gather(field_sum(ke, even, axis=0), axis)[0]
        if variant == "deep-nopowtraced":
            pw = powers(ke, zs, half)
            fe_part = _dot(ke, even, pw)
            return _allreduce_field(ke, fe_part, axis)
        if variant == "deep-nodot":
            pw = powers(ke, zs, half)
            z_half = _pow2_chain(ke, zs, ml // 2)
            z_off = _pow_traced(ke, z_half, d.astype(jnp.int32), d_bits)
            pw_off = jax.lax.optimization_barrier(
                ke.mul(pw, jnp.broadcast_to(z_off, pw.shape)))
            return _allreduce_field(ke, field_sum(ke, pw_off, axis=0), axis)
        if variant == "deep-noreduce":
            pw = powers(ke, zs, half)
            z_half = _pow2_chain(ke, zs, ml // 2)
            z_off = _pow_traced(ke, z_half, d.astype(jnp.int32), d_bits)
            pw_off = jax.lax.optimization_barrier(
                ke.mul(pw, jnp.broadcast_to(z_off, pw.shape)))
            fe_part = _dot(ke, even, pw_off)
            return jax.lax.all_gather(fe_part, axis)[0]
        raise SystemExit(f"unknown variant {variant}")

    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(vec_spec, scalar_spec),
                           out_specs=scalar_spec, check_vma=False))
    coeffs = jnp.asarray(ke.pack([(i + 1, 2 * i + 1) for i in range(mg)]))
    zp = jnp.asarray(ke.pack_scalar((7, 8)))
    with mesh:
        jax.block_until_ready(fn(coeffs, zp))
    print(f"variant {variant}: compiled+ran OK")
    sys.exit(0)

if variant in ("foldonly", "deeponly", "divideonly"):
    from ministark_tpu.fields import GOLDILOCKS_FP2
    from ministark_tpu.parallel.fri_sharded import make_sharded_fri_fns

    ke = get_kernels(GOLDILOCKS_FP2)
    m = 32
    fns = make_sharded_fri_fns(GOLDILOCKS_FP2, m, mesh)
    coeffs = jnp.asarray(ke.pack([(i + 1, 2 * i + 1) for i in range(m)]))
    ap = jnp.asarray(ke.pack_scalar((5, 6)))
    zp = jnp.asarray(ke.pack_scalar((7, 8)))
    zi = jnp.asarray(ke.pack_scalar(
        GOLDILOCKS_FP2.inv(GOLDILOCKS_FP2.from_base_coeffs((7, 8)))))
    with mesh:
        if variant == "foldonly":
            jax.block_until_ready(fns["fold"](coeffs, ap))
        elif variant == "deeponly":
            jax.block_until_ready(fns["deep"](coeffs, zp))
        else:
            jax.block_until_ready(fns["divide"](coeffs, zp, zi))
    print(f"variant {variant}: compiled+ran OK")
    sys.exit(0)

if variant == "foldfns":
    # the dryrun stage right after the MiMC core: distributed FRI fold +
    # DEEP evals over the mesh at m = 4 * n_devices
    from ministark_tpu.fields import GOLDILOCKS_FP2
    from ministark_tpu.parallel.fri_sharded import make_sharded_fold_fns

    ke = get_kernels(GOLDILOCKS_FP2)
    m = 32
    fold, deep = make_sharded_fold_fns(GOLDILOCKS_FP2, m, mesh)
    coeffs = jnp.asarray(ke.pack([(i + 1, 2 * i + 1) for i in range(m)]))
    ap = jnp.asarray(ke.pack_scalar((5, 6)))
    zp = jnp.asarray(ke.pack_scalar((7, 8)))
    with mesh:
        folded_fri = fold(coeffs, ap)
        fe, fo = deep(coeffs, zp)
        jax.block_until_ready((folded_fri, fe, fo))
    print("variant foldfns: compiled+ran OK")
    sys.exit(0)

if variant == "ldecheck":
    # the single-device LDE-equality check NTTs (2n fft + n ifft)
    from ministark_tpu.ops.ntt_device import get_ntt_fns

    dt = fibonacci_device_trace(sf, n - 1)
    cols = jnp.asarray(
        kb.pack(dt.cols.reshape(-1)).reshape((dt.cols.shape[0], n)
                                             + kb.elem_axes))
    fft, _, _, _ = get_ntt_fns(base, 2 * n)
    pad = jnp.zeros_like(cols[0])
    _, ifft, _, _ = get_ntt_fns(base, n)
    tp0 = ifft(cols[:1])[0]
    ref = fft(jnp.concatenate([tp0, pad], axis=0)[None])[0]
    jax.block_until_ready(ref)
    print("variant ldecheck: compiled+ran OK")
    sys.exit(0)

builder = fibonacci_device_trace if variant == "fib" else patched_mimc_builder
core = make_sharded_prove_core(sf, n, mesh, trace_builder=builder)
dt = builder(sf, n - 1)
cols = jnp.asarray(
    kb.pack(dt.cols.reshape(-1)).reshape((dt.cols.shape[0], n) + kb.elem_axes))
nw = dt.cols.shape[0] + len(dt.transitions_inline or dt.transitions)
weights = jnp.asarray(kb.pack(
    [base.pow(base.from_int(5), i) for i in range(nw)]))
with mesh:
    out = core(cols, weights)
    jax.block_until_ready(out)
print(f"variant {variant}: compiled+ran OK")
