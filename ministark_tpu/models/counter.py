"""A second AIR family (beyond the reference's single Fibonacci example):
a width-2 affine-counter AIR — col0 walks an arithmetic progression,
col1 an affine image of it.

Demonstrates the AIR surface with different structure: a constant-term
transition polynomial (DensePolynomial constants, not just trace-poly linear
combinations) and a configurable width. Host (TraceTable) and array-native
(DeviceTrace) variants produce identical proofs via either prover.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..air import Provable, TraceTable
from ..poly import DensePolynomial


@dataclass
class CounterClaim(Provable):
    """col0[i] = start + i*step; col1[i] = a*col0[i] + b (all mod p)."""

    field: object
    steps: int
    start: int = 1
    step: int = 3
    a: int = 5
    b: int = 7

    def trace(self, _witness=None) -> TraceTable:
        F = self.field
        trace = TraceTable(F, self.steps, 2)
        omega = trace.omega
        x = F.from_int(self.start)
        for i in range(self.steps):
            trace.add_row(i, [x, F.add(F.mul(F.from_int(self.a), x), F.from_int(self.b))])
            x = F.add(x, F.from_int(self.step))

        trace.add_boundary_constrain(0, 0)
        trace.add_boundary_constrain(self.steps - 1, 1)

        step_c = F.from_int(self.step)
        a_c = F.from_int(self.a)
        b_c = F.from_int(self.b)
        # increment: t0*omega - t0 - step  (same scalar-omega convention as
        # the reference closures, SURVEY §8.2)
        trace.add_transition_constrain(
            lambda tp: tp[0].scale(omega) - tp[0] - DensePolynomial(F, [step_c])
        )
        # affine link: t1 - a*t0 - b
        trace.add_transition_constrain(
            lambda tp: tp[1] - tp[0].scale(a_c) - DensePolynomial(F, [b_c])
        )
        return trace


def _counter_cols_on_device(stark_field, steps, start, step, a, b):
    """TPU-native witness generation: the counter trace is closed-form
    (col0[i] = start + i*step, col1[i] = a*col0[i] + b), so the whole
    witness is a few broadcast field ops over jnp.arange — no host loop,
    no host->device upload."""
    import jax
    import jax.numpy as jnp

    from ..ops.registry import get_kernels
    from ..poly import Radix2EvaluationDomain
    from ..utils.rng import ark_test_rng

    base = stark_field.base
    kb = get_kernels(base)
    n = Radix2EvaluationDomain(base, steps + 1).size()

    start_p = kb.pack_scalar(base.from_int(start))
    step_p = kb.pack_scalar(base.from_int(step))
    a_p = kb.pack_scalar(base.from_int(a))
    b_p = kb.pack_scalar(base.from_int(b))
    pad_p = kb.pack_scalar(base.rand(ark_test_rng()))

    @jax.jit
    def gen():
        idx = jnp.arange(n, dtype=jnp.uint32)
        if kb.elem_axes:  # limbed field: i < 2^32 packs as (lo=i, hi=0)
            idx_packed = jnp.stack([idx, jnp.zeros_like(idx)], axis=-1)
        else:
            idx_packed = idx
        bc = lambda s, like: jnp.broadcast_to(jnp.asarray(s), like.shape)
        col0 = kb.add(bc(start_p, idx_packed),
                      kb.mul(idx_packed, bc(step_p, idx_packed)))
        col1 = kb.add(kb.mul(col0, bc(a_p, col0)), bc(b_p, col0))
        cols = jnp.stack([col0, col1], axis=0)
        keep = (idx < steps).reshape((1, n) + (1,) * len(kb.elem_axes))
        return jnp.where(keep, cols, bc(pad_p, cols))

    return gen()


def counter_device_trace(stark_field, steps: int, start=1, step=3, a=5, b=7,
                         on_device: bool = False):
    """Array-native variant for stark/engine.py."""
    import jax.numpy as jnp
    import numpy as np

    from ..ops.registry import get_kernels
    from ..poly import Radix2EvaluationDomain
    from ..stark.engine import DeviceTrace
    from ..utils.rng import ark_test_rng

    base = stark_field.base
    kb = get_kernels(base)
    domain = Radix2EvaluationDomain(base, steps + 1)
    n = domain.size()
    p = base.p

    cols = cols_dev = None
    if on_device:
        cols_dev = _counter_cols_on_device(stark_field, steps, start, step, a, b)
    else:
        rows = np.empty((n, 2), dtype=np.uint64)
        x = start % p
        for i in range(steps):
            rows[i, 0] = x
            rows[i, 1] = (a * x + b) % p
            x = (x + step) % p
        rows[steps:, :] = base.rand(ark_test_rng())
        cols = np.ascontiguousarray(rows.T)

    omega_p = kb.pack_scalar(domain.group_gen)
    step_p = kb.pack_scalar(base.from_int(step))
    a_p = kb.pack_scalar(base.from_int(a))
    b_p = kb.pack_scalar(base.from_int(b))

    def t_inc(tp):
        w = jnp.asarray(omega_p)
        out = kb.sub(kb.scale_base(tp[0], jnp.broadcast_to(w, tp[0].shape)), tp[0])
        # subtract the constant-term polynomial (coefficient 0 only)
        head = kb.sub(out[0:1], jnp.asarray(step_p)[None])
        return jnp.concatenate([head, out[1:]], axis=0)

    def t_affine(tp):
        av = jnp.asarray(a_p)
        out = kb.sub(tp[1], kb.scale_base(tp[0], jnp.broadcast_to(av, tp[0].shape)))
        head = kb.sub(out[0:1], jnp.asarray(b_p)[None])
        return jnp.concatenate([head, out[1:]], axis=0)

    return DeviceTrace(
        stark_field=stark_field, steps=steps, cols=cols,
        transitions=[t_inc, t_affine], cols_dev=cols_dev,
    )
