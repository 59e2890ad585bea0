"""Fourth AIR family: a MiMC-style cubing hash chain — the first model with a
genuinely NONLINEAR transition constraint.

State s evolves by the MiMC round function s_{i+1} = (s_i + k_i)^3 with a
fixed public round-constant schedule k_i. The trace has width 2: row i is
(s_i, u_i) with u_i = (s_i + k_i)^3 and s_{i+1} = u_i. The chain input s_0 is
the secret witness (hash-preimage claim).

Why this matters: the reference's only example AIR (tests/e2e_goldilocks.rs:
11-63) and our other families (counter, LFSR) are all *linear* combinations
of trace polynomials. Real STARK workloads (hash chains, VM steps) need
constraint polynomials that are nonlinear in the trace. The protocol consumes
transitions as opaque closures mapping trace polynomials to one constraint
polynomial (src/air.rs:61,119-121), so a degree-d constraint is represented
by its degree<N interpolant over the trace domain: evaluate the trace polys
over the domain, apply the nonlinear map pointwise, interpolate back (FFT ->
pointwise cube -> iFFT). Host and device closures compute identical field
values, so Stark / DeviceEngine / FastStark all accept the model unchanged.

Transitions:
  t0 (cubic, intra-row): interp over the trace domain of (e0 + K)^3 - e1,
     where e0/e1 are the column evaluations and K the round-constant
     evaluations (defined for every domain row, including ZK padding rows).
  t1 (linear link): P1.scale(omega) - P0, following the reference's
     scalar-omega closure convention (SURVEY §8.2 — the quirk multiplies by
     the scalar omega rather than composing with omega*x, so "constraints"
     need not vanish; prover/verifier consistency is what parity requires).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..air import Provable, TraceTable
from ..ops.ntt_device import get_ntt_fns
from ..ops.registry import get_kernels
from ..poly import DensePolynomial, Radix2EvaluationDomain
from ..stark.engine import DeviceTrace
from ..utils.rng import ark_test_rng

WIDTH = 2


def round_constant(i: int, p: int) -> int:
    """Public MiMC round-constant schedule: k_i = (i^3 + 42) mod p."""
    return (i * i * i + 42) % p


def mimc_chain_output(p: int, steps: int, s0: int) -> int:
    """Host oracle: run the chain steps times, return the final state."""
    s = s0 % p
    for i in range(steps):
        s = pow((s + round_constant(i, p)) % p, 3, p)
    return s


@dataclass
class MimcWitness:
    s0: int  # secret chain input (the hash preimage)


@dataclass
class MimcClaim(Provable):
    field: object  # base prime field
    steps: int
    output: int    # claimed chain output (recorded; unused, like the
                   # reference's Fibonacci "FIXME" output)

    def trace(self, witness: MimcWitness) -> TraceTable:
        F = self.field
        p = F.p
        trace = TraceTable(F, self.steps, WIDTH)
        omega = trace.omega
        domain = trace.get_domain()
        n = domain.size()

        s = witness.s0 % p
        for i in range(self.steps):
            u = pow((s + round_constant(i, p)) % p, 3, p)
            trace.add_row(i, [F.from_int(s), F.from_int(u)])
            s = u

        trace.add_boundary_constrain(0, 0)
        trace.add_boundary_constrain(self.steps - 1, 1)

        k_evals = [F.from_int(round_constant(i, p)) for i in range(n)]

        def cubic(tp):
            e0 = tp[0].evaluate_over_domain(domain)
            e1 = tp[1].evaluate_over_domain(domain)
            c = []
            for i in range(n):
                t = F.add(e0[i], k_evals[i])
                c.append(F.sub(F.mul(F.mul(t, t), t), e1[i]))
            return DensePolynomial(F, domain.ifft(c))

        trace.add_transition_constrain(cubic)
        trace.add_transition_constrain(
            lambda tp: tp[1].scale(omega) - tp[0]
        )
        return trace


def mimc_device_trace(stark_field, steps: int, s0: int = 3) -> DeviceTrace:
    """Array-native variant for stark/engine.py and stark/fast.py (same
    rows/padding/closures as MimcClaim.trace — byte-identical proofs)."""
    import jax.numpy as jnp

    base = stark_field.base
    p = base.p
    kb = get_kernels(base)
    domain = Radix2EvaluationDomain(base, steps + 1)
    n = domain.size()

    rows = np.empty((n, WIDTH), dtype=np.uint64)
    s = s0 % p
    for i in range(steps):
        u = pow((s + round_constant(i, p)) % p, 3, p)
        rows[i] = (s, u)
        s = u
    rows[steps:, :] = base.rand(ark_test_rng())
    cols = np.ascontiguousarray(rows.T)

    k_packed = kb.pack([base.from_int(round_constant(i, p)) for i in range(n)])
    omega_p = kb.pack_scalar(domain.group_gen)

    def cubic(tp):
        import jax

        fft, ifft, _, _ = get_ntt_fns(base, n)
        evs = fft(tp[:2])                        # (2, n, *e) column evals
        t = kb.add(evs[0], jnp.asarray(k_packed))
        # fence the cube's mul chain: unfenced, XLA's algebraic simplifier
        # chases the expanded wide-integer t*t*t expression in circles under
        # shard_map ("circular simplification loop ... 50 runs" in the
        # round-3 dryrun log) and loop-fusion re-executes t*t per use site
        t2 = jax.lax.optimization_barrier(kb.mul(t, t))
        c = kb.sub(kb.mul(t2, t), evs[1])
        return ifft(c[None])[0]

    def link(tp):
        return kb.sub(kb.scale_base(tp[1], jnp.asarray(omega_p)), tp[0])

    # Inline (nested-jit-safe) variants for the compile-check core
    # (stark/core.py): the get_ntt_fns closures above capture device-resident
    # twiddle tables, which an enclosing jit would materialize host-side
    # (CLAUDE.md nested-jit note) — inline _ntt_fori with NUMPY tables instead.
    from ..ops.ntt_device import (
        _bitrev_indices,
        _field_ops,
        _ntt_fori,
        _root_powers_table,
    )

    ops = _field_ops(base)
    _root = base.get_root_of_unity(n)
    _rev_n = np.asarray(_bitrev_indices(n))
    _tw = np.asarray(ops.pack(list(_root_powers_table(p, _root, max(n // 2, 1)))))
    _tw_inv = np.asarray(
        ops.pack(list(_root_powers_table(p, base.inv(_root), max(n // 2, 1))))
    )
    _n_inv = np.asarray(ops.pack([base.inv(base.from_int(n))])[0])

    def cubic_inline(tp):
        import jax

        evs = _ntt_fori(ops, tp[:2], _rev_n, _tw, n)
        t = kb.add(evs[0], jnp.asarray(k_packed))
        t2 = jax.lax.optimization_barrier(kb.mul(t, t))  # see cubic()
        c = kb.sub(kb.mul(t2, t), evs[1])
        y = _ntt_fori(ops, c[None], _rev_n, _tw_inv, n)
        return ops.mul(y, _n_inv[None, None])[0]

    return DeviceTrace(
        stark_field=stark_field, steps=steps, cols=cols,
        transitions=[cubic, link],
        transitions_inline=[cubic_inline, link],
    )
