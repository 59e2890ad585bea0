"""Multi-chip sharded NTT via the four-step (Bailey) factorization.

For N = N1 * N2 with coefficients viewed as A[n1][n2] = x[n1 + N1*n2]:

  1. length-N2 NTT of every row n1                (local — rows sharded)
  2. twiddle multiply by w_N^(n1 * k2)            (local)
  3. transpose the distributed matrix             (all_to_all over ICI)
  4. length-N1 NTT of every row k2                (local)

yielding X[k2 + N2*k1] = D[k1][k2] — i.e. the natural-order evaluations are
the row-major flatten of the final (N1, N2)-matrix after a local transpose.

Each step is expressed inside one ``shard_map`` over a 1-D mesh axis; the only
communication is the single ``all_to_all`` (plus the optional output
all-gather). Bit-exact with ops/ntt_device.py and the host oracle
(tests/test_sharded.py); scaling efficiency is measured in bench.py.

Sharding layout: rows n1 are partitioned across devices, so device d holds
A[d*N1/D : (d+1)*N1/D, :]. N1 is chosen as max(D, closest power of two to
sqrt(N)) rounded to a multiple of D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import gl as gl_ops
from ..ops.ntt_device import _field_ops, _pack_twiddles, _bitrev_indices


def _split_sizes(n: int, n_dev: int):
    """Pick N1 (row count, multiple of n_dev) and N2 = n // N1."""
    assert n_dev > 0 and n_dev & (n_dev - 1) == 0, (
        f"device count must be a power of two, got {n_dev}"
    )
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    while n1 % n_dev != 0 and n1 <= n:
        n1 *= 2
    assert n1 <= n, f"cannot split size {n} over {n_dev} devices"
    return n1, n // n1


def _local_ntt(ops, x, twiddles, rev, n):
    """Batched in-place NTT on local rows: x (rows, n[, limbs])."""
    elem = x.shape[2:]
    x = x[:, rev]
    length = 2
    for tw in twiddles:
        half = length // 2
        blocks = n // length
        xr = x.reshape((x.shape[0], blocks, 2, half) + elem)
        e = xr[:, :, 0]
        o = xr[:, :, 1]
        wv = ops.mul(o, tw[None, None])
        out = jnp.stack([ops.add(e, wv), ops.sub(e, wv)], axis=2)
        x = out.reshape((x.shape[0], n) + elem)
        length *= 2
    return x


def make_sharded_ntt_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    """Build a jitted sharded forward NTT closure for size n over ``mesh``.

    Returns ``fn(x)`` taking/returning a (n[, limbs]) GLOBAL natural-order
    array (sharded in, replicated natural-order out).
    """
    ops = _field_ops(field)
    p = field.p
    n_dev = mesh.shape[axis]
    n1, n2 = _split_sizes(n, n_dev)
    root = field.get_root_of_unity(n)

    # local NTT tables
    rev1 = jnp.asarray(_bitrev_indices(n1))
    rev2 = jnp.asarray(_bitrev_indices(n2))
    tw1 = _pack_twiddles(ops, p, field.get_root_of_unity(n1), n1)
    tw2 = _pack_twiddles(ops, p, field.get_root_of_unity(n2), n2)

    # step-2 twiddle matrix w^(n1*k2), sharded over n1 rows
    n1_idx = np.arange(n1, dtype=object)
    k2_idx = np.arange(n2, dtype=object)
    tw_rows = np.empty((n1, n2), dtype=object)
    wpow = [pow(root, i, p) for i in range(n1)]
    for i in range(n1):
        row = np.empty(n2, dtype=object)
        cur = 1
        w = wpow[i]
        for j in range(n2):
            row[j] = cur
            cur = (cur * w) % p
        tw_rows[i] = row
    tw_mat = jnp.asarray(ops.pack(tw_rows))

    elem_axes = (2,) if ops is gl_ops else ()
    spec_in = P(axis)  # shard leading dim
    full_spec = P(*([axis] + [None] * (1 + len(elem_axes))))

    def body(a_local, tw_local):
        # a_local: (n1/D, n2[, limbs]) — rows n1 for this shard
        b = _local_ntt(ops, a_local, tw2, rev2, n2)        # step 1
        c = ops.mul(b, tw_local)                            # step 2
        # step 3: distributed transpose (n1, n2) -> (n2, n1)
        # split columns into D chunks, exchange, rebuild rows of the transpose
        d = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0, tiled=True)
        # d: (n1, n2/D ...) wait — tiled all_to_all: (n1/D, n2) -> (n1, n2/D)
        dt = jnp.swapaxes(d, 0, 1)                          # (n2/D, n1)
        e = _local_ntt(ops, dt, tw1, rev1, n1)              # step 4
        return e  # rows k2 (sharded), columns k1

    shmapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(full_spec, full_spec),
        out_specs=full_spec,
        check_vma=False,
    )

    @jax.jit
    def fn(x):
        # x: (n[, limbs]) natural order -> matrix A[n1][n2] = x[n1 + N1*n2]
        a = jnp.moveaxis(
            x.reshape((n2, n1) + x.shape[1:]), 0, 1
        )  # (n1, n2, ...)
        e = shmapped(a, tw_mat)   # (n2, n1, ...) rows k2
        # natural order: X[k2 + N2*k1] = D[k1][k2] -> transpose and flatten
        out = jnp.moveaxis(e, 0, 1).reshape((n,) + x.shape[1:])
        return out

    return fn


def sharded_lde(field, coeffs, domain_size: int, mesh: Mesh, axis: str = "shards"):
    """Forward NTT of zero-padded coeffs over ``domain_size`` using the mesh."""
    fn = make_sharded_ntt_fns(field, domain_size, mesh, axis)
    ops = _field_ops(field)
    m = coeffs.shape[0]
    if m < domain_size:
        pad = jnp.zeros((domain_size - m,) + tuple(coeffs.shape[1:]), dtype=jnp.uint32)
        coeffs = jnp.concatenate([coeffs, pad], axis=0)
    return fn(coeffs)
