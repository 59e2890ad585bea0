"""Jittable prover-core graphs (single-chip and sharded) for ANY
DeviceTrace-shaped model.

These wrap the compute spine of ``DeviceEngine.prove`` — trace iFFT ->
transition constraints -> coset LDE -> constraint mixing -> one FRI fold —
as single jitted functions with no host callbacks, used by __graft_entry__
(driver compile checks) and the scaling benchmarks. The full prover
(stark/engine.py) runs the same kernels with Fiat-Shamir challenges between
phases, which is a protocol-inherent sequencing (SURVEY §7).

The graph is built from the model's own ``DeviceTrace`` (width, transition
closures), so the compile check exercises the same shape the engine runs for
a width-w, t-transition model — reference counterpart: the prove spine of
/root/reference/src/starks.rs:59-169 for an arbitrary Provable
(/root/reference/src/air.rs:9-12), not just the Fibonacci example AIR.
Models whose transitions need NTTs supply nested-jit-safe variants via
``DeviceTrace.transitions_inline`` (see models/mimc.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


from ..ops.poly_device import fold_even_odd, mix_columns
from ..ops.registry import get_kernels


def _trace_for(stark_field, n: int, trace_builder=None):
    if trace_builder is None:
        from ..models.fibonacci_device import fibonacci_device_trace

        trace_builder = fibonacci_device_trace
    dtrace = trace_builder(stark_field, n - 1)
    assert dtrace.domain_size == n, (
        f"trace domain {dtrace.domain_size} != requested {n}"
    )
    return dtrace


def _packed_cols(kb, dtrace):
    if dtrace.cols_dev is not None:
        return jnp.asarray(dtrace.cols_dev)
    n = dtrace.domain_size
    return jnp.asarray(
        kb.pack(dtrace.cols.reshape(-1)).reshape((dtrace.width, n) + kb.elem_axes)
    )


def make_prove_core(stark_field, n: int, trace_builder=None):
    """Single-chip jitted core for a width-w, t-transition trace of domain n.

    ``trace_builder``: callable(stark_field, steps) -> DeviceTrace; defaults
    to the Fibonacci example AIR. Returns (core, example_args) with

    core(cols, shift, weights) -> (lde_evals, mixed, folded)
      cols:    (w, n[, limbs])      column evaluations
      shift:   packed base scalar   (coset offset challenge)
      weights: (w+t[, limbs])       packed mixing weights r^i
    """
    base = stark_field.base
    kb = get_kernels(base)
    dtrace = _trace_for(stark_field, n, trace_builder)
    trans = dtrace.transitions_inline or dtrace.transitions
    total = dtrace.width + len(trans)
    # NOTE build the NTT tables as NUMPY constants and inline the transform
    # bodies: calling the top-level jitted NTT closures from inside this jit
    # would capture their device-resident tables as constants, and lowering
    # then materializes them host-side (minutes through a slow tunnel).
    from ..ops.ntt_device import (
        _bitrev_indices,
        _field_ops,
        _ntt_fori,
        _powers,
        _root_powers_table,
    )

    ops = _field_ops(base)
    p = base.p

    def _tables(m):
        root = base.get_root_of_unity(m)
        rev = np.asarray(_bitrev_indices(m))
        tw = np.asarray(ops.pack(list(_root_powers_table(p, root, max(m // 2, 1)))))
        return rev, tw

    rev_n, _ = _tables(n)
    root_inv_n = base.inv(base.get_root_of_unity(n))
    tw_n_inv = np.asarray(ops.pack(list(_root_powers_table(p, root_inv_n, max(n // 2, 1)))))
    rev_2n, tw_2n = _tables(2 * n)
    n_inv = np.asarray(ops.pack([base.inv(base.from_int(n))])[0])

    @jax.jit
    def core(cols, shift, weights):
        y = _ntt_fori(ops, cols, rev_n, tw_n_inv, n)
        tp = ops.mul(y, n_inv[None, None])                # (w, n, *e) iFFT
        tlist = [f(tp) for f in trans]
        allc = jnp.concatenate([tp] + [t[None] for t in tlist], axis=0)
        pad = jnp.zeros_like(allc)
        padded = jnp.concatenate([allc, pad], axis=1)     # (w+t, 2n, *e)
        pw = _powers(ops, shift, 2 * n)
        scaled = ops.mul(padded, pw[None])
        lde = _ntt_fori(ops, scaled, rev_2n, tw_2n, 2 * n)
        mixed = mix_columns(kb, allc, weights)            # (n, *e)
        folded = fold_even_odd(kb, mixed, weights[1])     # representative fold
        return lde, mixed, folded

    def example_args():
        cols = _packed_cols(kb, dtrace)
        shift = jnp.asarray(kb.pack_scalar(base.from_int(7)))
        weights = jnp.asarray(
            kb.pack([base.pow(base.from_int(5), i) for i in range(total)])
        )
        return cols, shift, weights

    return core, example_args


def make_sharded_prove_core(stark_field, n: int, mesh, axis: str = "shards",
                            trace_builder=None):
    """Sharded core: per-column sharded four-step NTT for the LDE plus
    sharded elementwise constraint/mix work (coefficients partitioned over the
    mesh axis; the NTT transposes ride all_to_all over ICI). Same generic
    width-w/t-transition graph as make_prove_core."""
    from ..parallel.ntt_sharded import get_sharded_ntt_fns

    base = stark_field.base
    kb = get_kernels(base)
    dtrace = _trace_for(stark_field, n, trace_builder)
    trans = dtrace.transitions_inline or dtrace.transitions
    from ..ops.ntt_device import (
        _bitrev_indices,
        _field_ops,
        _ntt_fori,
        _root_powers_table,
    )

    ops = _field_ops(base)
    root_inv_n = base.inv(base.get_root_of_unity(n))
    rev_n = np.asarray(_bitrev_indices(n))
    tw_n_inv = np.asarray(
        ops.pack(list(_root_powers_table(base.p, root_inv_n, max(n // 2, 1))))
    )
    n_inv = np.asarray(ops.pack([base.inv(base.from_int(n))])[0])
    sharded_fft, _, _, _ = get_sharded_ntt_fns(base, 2 * n, mesh, axis)

    @jax.jit
    def core(cols, weights):
        # trace interpolation (replicated batch of w columns)
        y = _ntt_fori(ops, cols, rev_n, tw_n_inv, n)
        tp = ops.mul(y, n_inv[None, None])
        tlist = [f(tp) for f in trans]
        allc = jnp.concatenate([tp] + [t[None] for t in tlist], axis=0)
        # sharded LDE: the whole constraint batch through one four-step NTT
        # (all_to_all transposes over ICI)
        pad = jnp.zeros_like(allc)
        lde = sharded_fft(jnp.concatenate([allc, pad], axis=1))
        mixed = mix_columns(kb, allc, weights)
        folded = fold_even_odd(kb, mixed, weights[1])
        return lde, mixed, folded

    return core
