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


def fibonacci_trace_cols_on_device(stark_field, steps: int, secret_b: int = 2):
    """TPU-native witness generation: the sequentially-defined Fibonacci
    trace becomes a log-depth program. With a = F_{i-1}*a0 + F_i*b0 (row i of
    the matrix power [[0,1],[1,1]]^i), all rows come from the Fibonacci
    sequence mod p, computed with the exponent-bit 2x2-matrix power ladder —
    no host loop, no host->device upload of the trace.

    Returns a (3, n) packed device array of column evaluations (rows >= steps
    carry the deterministic ZK padding), bit-identical to the host path.
    """
    import jax.numpy as jnp

    from ..ops.poly_device import _mask_where
    from ..ops.registry import get_kernels
    from ..poly import Radix2EvaluationDomain
    from ..utils.rng import ark_test_rng

    base = stark_field.base
    kb = get_kernels(base)
    domain = Radix2EvaluationDomain(base, steps + 1)
    n = domain.size()

    # 2x2 matrix power ladder over the field kernels: M = [[0,1],[1,1]],
    # element layout (n, 2, 2, *elem) as [[m00, m01], [m10, m11]]
    def mat_mul(A, B):
        out = [[None, None], [None, None]]
        for r in range(2):
            for c in range(2):
                out[r][c] = kb.add(
                    kb.mul(A[..., r, 0, :] if kb.elem_axes else A[..., r, 0],
                           B[..., 0, c, :] if kb.elem_axes else B[..., 0, c]),
                    kb.mul(A[..., r, 1, :] if kb.elem_axes else A[..., r, 1],
                           B[..., 1, c, :] if kb.elem_axes else B[..., 1, c]),
                )
        rows = [jnp.stack([out[r][0], out[r][1]], axis=-1 - len(kb.elem_axes))
                for r in range(2)]
        return jnp.stack(rows, axis=-2 - len(kb.elem_axes))

    import numpy as np

    one = kb.pack([1])[0] if kb.elem_axes else np.uint32(1)
    zero = kb.pack([0])[0] if kb.elem_axes else np.uint32(0)
    ident = np.stack([np.stack([one, zero]), np.stack([zero, one])])
    M = np.stack([np.stack([zero, one]), np.stack([one, one])])

    import jax

    @jax.jit
    def gen():
        idx = jnp.arange(n)
        Mp = jnp.broadcast_to(jnp.asarray(ident), (n,) + ident.shape)
        M2 = jnp.asarray(M)
        log_n = max((n - 1).bit_length(), 1)

        def body(b, carry):
            Mp, M2 = carry
            bit = ((idx >> b) & 1) == 1
            mask = bit.reshape((n,) + (1,) * (Mp.ndim - 1))
            Mp = jnp.where(mask, mat_mul(Mp, jnp.broadcast_to(M2, Mp.shape)), Mp)
            return Mp, mat_mul(M2[None], M2[None])[0]

        Mp, _ = jax.lax.fori_loop(0, log_n, body, (Mp, M2))
        # [a_i; b_i] = M^i [a0; b0]
        a0 = jnp.asarray(kb.pack_scalar(base.one()))
        b0 = jnp.asarray(kb.pack_scalar(base.from_int(secret_b)))
        if kb.elem_axes:
            a = kb.add(kb.mul(Mp[:, 0, 0], jnp.broadcast_to(a0, Mp[:, 0, 0].shape)),
                       kb.mul(Mp[:, 0, 1], jnp.broadcast_to(b0, Mp[:, 0, 1].shape)))
            bcol = kb.add(kb.mul(Mp[:, 1, 0], jnp.broadcast_to(a0, Mp[:, 1, 0].shape)),
                          kb.mul(Mp[:, 1, 1], jnp.broadcast_to(b0, Mp[:, 1, 1].shape)))
        else:
            a = kb.add(kb.mul(Mp[:, 0, 0], a0), kb.mul(Mp[:, 0, 1], b0))
            bcol = kb.add(kb.mul(Mp[:, 1, 0], a0), kb.mul(Mp[:, 1, 1], b0))
        ccol = kb.add(a, bcol)
        cols = jnp.stack([a, bcol, ccol], axis=0)      # (3, n, *elem)
        # deterministic ZK padding rows (constant value)
        padv = jnp.asarray(kb.pack_scalar(base.rand(ark_test_rng())))
        pad = jnp.broadcast_to(padv, cols.shape)
        keep = (idx < steps).reshape((1, n) + (1,) * len(kb.elem_axes))
        return jnp.where(keep, cols, pad)

    return gen()


def fibonacci_device_trace(stark_field, steps: int, secret_b: int = 2,
                           on_device: bool = False) -> DeviceTrace:
    base = stark_field.base
    kb = get_kernels(base)
    domain = Radix2EvaluationDomain(base, steps + 1)
    n = domain.size()
    omega = domain.group_gen
    p = base.p

    if on_device:
        cols_dev = fibonacci_trace_cols_on_device(stark_field, steps, secret_b)
        return DeviceTrace(
            stark_field=stark_field, steps=steps, cols=None,
            transitions=_fib_transitions(kb, omega), cols_dev=cols_dev,
        )

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

    return DeviceTrace(
        stark_field=stark_field,
        steps=steps,
        cols=cols,
        transitions=_fib_transitions(kb, omega),
    )


def _fib_transitions(kb, omega):
    omega_packed = kb.pack_scalar(omega)

    def t_carry(tp):
        import jax.numpy as jnp

        w = jnp.asarray(omega_packed)
        return kb.sub(kb.scale_base(tp[0], w), tp[1])

    def t_sum(tp):
        return kb.sub(kb.sub(tp[2], tp[0]), tp[1])

    # reference order: carry-over constraint appears twice (§8.2)
    return [t_carry, t_carry, t_sum]
