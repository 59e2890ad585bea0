"""Array-native Fibonacci AIR for the device engine (stark/engine.py).

Produces bit-identical traces/constraints to models/fibonacci.py (same rows,
same deterministic ZK padding, same three transition constraints including
the duplicated first constraint) but materializes columns as numpy arrays and
expresses the transition closures over packed device coefficient arrays.
"""

from __future__ import annotations

import numpy as np

from ..ops.registry import get_kernels
from ..poly import Radix2EvaluationDomain
from ..stark.engine import DeviceTrace
from ..utils.rng import ark_test_rng


def fibonacci_device_trace(stark_field, steps: int, secret_b: int = 2) -> DeviceTrace:
    base = stark_field.base
    kb = get_kernels(base)
    domain = Radix2EvaluationDomain(base, steps + 1)
    n = domain.size()
    omega = domain.group_gen
    p = base.p

    # trace columns (a, b, c) — sequential recurrence on host ints
    a, b = 1, secret_b % p
    c = (a + b) % p
    rows = np.empty((n, 3), dtype=np.uint64)
    for i in range(steps):
        rows[i, 0] = a
        rows[i, 1] = b
        rows[i, 2] = c
        a, b = b, c
        c = (a + b) % p
    # deterministic ZK padding: fresh test_rng per cell => constant value
    pad = base.rand(ark_test_rng())
    rows[steps:, :] = pad

    cols = np.ascontiguousarray(rows.T)  # (3, n)

    omega_packed = kb.pack_scalar(omega)

    def t_carry(tp):
        import jax.numpy as jnp

        w = jnp.asarray(omega_packed)
        return kb.sub(kb.scale_base(tp[0], w), tp[1])

    def t_sum(tp):
        return kb.sub(kb.sub(tp[2], tp[0]), tp[1])

    # reference order: carry-over constraint appears twice (§8.2)
    return DeviceTrace(
        stark_field=stark_field,
        steps=steps,
        cols=cols,
        transitions=[t_carry, t_carry, t_sum],
    )
