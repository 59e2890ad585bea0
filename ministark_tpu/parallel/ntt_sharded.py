"""Multi-chip sharded NTT via the four-step (Bailey) factorization.

For N = N1 * N2 with coefficients viewed column-major as
A[i1][i2] = x[i1 + N1*i2]:

  1. length-N2 NTT of every row i1                (local — rows sharded)
  2. twiddle multiply by w_N^(i1 * k2)            (local, device-built)
  3. transpose the distributed matrix             (one all_to_all over ICI)
  4. length-N1 NTT of every row k2                (local)

yielding D[k1][k2] = X[k2 + N2*k1] — natural-order output after a local
transpose + flatten.

All twiddle material is built ON DEVICE: the per-stage tables are O(sqrt N)
host ints (cheap), and the step-2 twiddle matrix rows are computed inside the
shard_map body from each shard's row offset (``_twiddle_rows`` +
``_pow_traced`` from ops/ntt_device.py) — no O(N) host bigint work at any
size (round-1 review item).

API mirrors ops/ntt_device.get_ntt_fns: ``get_sharded_ntt_fns(field, n,
mesh)`` -> (fft, ifft, coset_fft, coset_ifft), each taking/returning
(batch, n[, limbs]) uint32 arrays in natural order. Inputs may carry any
sharding; the matrix view is shard-mapped over ``axis`` with the single
all_to_all as the only communication. Bit-exact with ops/ntt_device.py and
the host oracle (tests/test_sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.ntt_device import (
    _bitrev_indices,
    _field_ops,
    _ntt_core,
    _pack_twiddles,
    _pow_traced,
    _powers,
    _twiddle_rows,
)


def _split_sizes(n: int, n_dev: int):
    """Pick N1 (sharded row count, multiple of n_dev) and N2 = n // N1."""
    assert n_dev > 0 and n_dev & (n_dev - 1) == 0, (
        f"device count must be a power of two, got {n_dev}"
    )
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    while n1 % n_dev != 0 and n1 <= n:
        n1 *= 2
    assert n1 <= n and n % n1 == 0, f"cannot split size {n} over {n_dev} devices"
    return n1, n // n1


def can_shard(n: int, n_dev: int) -> bool:
    """True when the four-step split supports this (size, device) pair."""
    if n_dev <= 1 or n_dev & (n_dev - 1):
        return False
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    while n1 % n_dev != 0 and n1 <= n:
        n1 *= 2
    return n1 <= n and n % n1 == 0 and n // n1 >= n_dev


def _make_body(ops, field, n1: int, n2: int, n_dev: int, axis: str):
    """shard_map body: (batch, n1/D, n2[, limbs]) local rows -> (batch,
    n2/D, n1[, limbs]) local transposed rows (both sharded over ``axis``)."""
    p = field.p
    n1_loc = n1 // n_dev
    rev1 = jnp.asarray(_bitrev_indices(n1))
    rev2 = jnp.asarray(_bitrev_indices(n2))
    nbits_off = max(n1.bit_length() - 1, 1)

    def body(a_local, root_packed, tw1, tw2):
        # step-2 twiddle rows for THIS shard: W[i][k2] = root^((i0+i) * k2)
        d = jax.lax.axis_index(axis)
        i0 = (d * n1_loc).astype(jnp.int32)
        r_i0 = _pow_traced(ops, root_packed, i0, nbits_off)
        rb = ops.mul(
            _powers(ops, root_packed, n1_loc),
            jnp.broadcast_to(r_i0, (n1_loc,) + tuple(root_packed.shape)),
        )
        W_loc = _twiddle_rows(ops, rb, n2)                  # (n1/D, n2, *e)

        batch = a_local.shape[0]
        elem = a_local.shape[3:]
        # step 1: length-n2 NTT per local row
        flat = a_local.reshape((batch * n1_loc, n2) + elem)
        b = _ntt_core(ops, flat[:, rev2], tw2, n2)
        b = b.reshape((batch, n1_loc, n2) + elem)
        # step 2: twiddle multiply
        c = ops.mul(b, W_loc[None])
        # step 3: distributed transpose — the single collective
        dd = jax.lax.all_to_all(c, axis, split_axis=2, concat_axis=1, tiled=True)
        dt = jnp.swapaxes(dd, 1, 2)                         # (batch, n2/D, n1)
        # step 4: length-n1 NTT per transposed row
        flat = dt.reshape((batch * (n2 // n_dev), n1) + elem)
        e = _ntt_core(ops, flat[:, rev1], tw1, n1)
        return e.reshape((batch, n2 // n_dev, n1) + elem)

    return body


def make_sharded_ntt_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    """Build jitted sharded (fft, ifft, coset_fft, coset_ifft) for size n.

    Same signatures as ops/ntt_device.get_ntt_fns — (batch, n[, limbs])
    natural-order arrays; coset offsets are traced packed scalars."""
    ops = _field_ops(field)
    p = field.p
    n_dev = mesh.shape[axis]
    n1, n2 = _split_sizes(n, n_dev)
    assert n2 % n_dev == 0, (
        f"four-step column count {n2} must divide over {n_dev} devices"
    )

    root = field.get_root_of_unity(n)
    root_inv = field.inv(root)
    n_inv = field.inv(field.from_int(n))
    root1, root2 = field.get_root_of_unity(n1), field.get_root_of_unity(n2)
    tw1_f = _pack_twiddles(ops, p, root1, n1)
    tw1_i = _pack_twiddles(ops, p, field.inv(root1), n1)
    tw2_f = _pack_twiddles(ops, p, root2, n2)
    tw2_i = _pack_twiddles(ops, p, field.inv(root2), n2)
    root_p = jnp.asarray(ops.pack([root])[0])
    root_inv_p = jnp.asarray(ops.pack([root_inv])[0])
    n_inv_p = jnp.asarray(ops.pack([n_inv])[0])

    elem_nd = root_p.ndim
    mat_spec = P(None, axis, *([None] * (1 + elem_nd)))  # (batch, rows, cols, *e)
    scal_spec = P(*([None] * elem_nd))
    tw_specs = tuple(P(*([None] * (1 + elem_nd))) for _ in range(2))

    body = _make_body(ops, field, n1, n2, n_dev, axis)
    shmapped = shard_map(
        body, mesh=mesh,
        in_specs=(mat_spec, scal_spec) + tw_specs,
        out_specs=mat_spec,
        check_vma=False,
    )

    def _transform(x, root_packed, tw1, tw2):
        batch = x.shape[0]
        elem = x.shape[2:]
        # natural order -> column-major matrix A[i1][i2] = x[i1 + N1*i2]
        a = jnp.swapaxes(x.reshape((batch, n2, n1) + elem), 1, 2)
        e = shmapped(a, root_packed, tw1, tw2)              # (batch, n2, n1)
        # D[k1][k2] = X[k2 + N2*k1]: transpose + flatten = natural order
        return jnp.swapaxes(e, 1, 2).reshape((batch, n) + elem)

    @jax.jit
    def fft(x):
        return _transform(x, root_p, tw1_f, tw2_f)

    @jax.jit
    def ifft(x):
        y = _transform(x, root_inv_p, tw1_i, tw2_i)
        return ops.mul(y, n_inv_p[None, None])

    @jax.jit
    def coset_fft(x, offset):
        pw = _powers(ops, offset, n)
        return _transform(ops.mul(x, pw[None]), root_p, tw1_f, tw2_f)

    @jax.jit
    def coset_ifft(x, offset_inv):
        y = _transform(x, root_inv_p, tw1_i, tw2_i)
        y = ops.mul(y, n_inv_p[None, None])
        pw = _powers(ops, offset_inv, n)
        return ops.mul(y, pw[None])

    return fft, ifft, coset_fft, coset_ifft


_FN_CACHE: dict = {}


def get_sharded_ntt_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    """Cached variant (one trace/compile per (field, size, mesh) — mirrors
    ops/ntt_device.get_ntt_fns; round-1 review item)."""
    key = (field.p, n, mesh, axis)
    if key not in _FN_CACHE:
        _FN_CACHE[key] = make_sharded_ntt_fns(field, n, mesh, axis)
    return _FN_CACHE[key]


def select_ntt_fns(field, n: int, mesh: Mesh = None, axis: str = "shards"):
    """(fft, ifft, coset_fft, coset_ifft) — sharded over ``mesh`` when one
    is given and the size splits over it, single-device otherwise. The one
    place the mesh-gating rule lives (engine, batched FRI and FastStark all
    route through here)."""
    if mesh is not None and can_shard(n, mesh.shape[axis]):
        return get_sharded_ntt_fns(field, n, mesh, axis)
    from ..ops.ntt_device import get_ntt_fns

    return get_ntt_fns(field, n)


def sharded_lde(field, coeffs, domain_size: int, mesh: Mesh, axis: str = "shards"):
    """Forward NTT of zero-padded coeffs over ``domain_size`` using the mesh.

    coeffs: (batch, m[, limbs]) with m <= domain_size."""
    fft, _, _, _ = get_sharded_ntt_fns(field, domain_size, mesh, axis)
    m = coeffs.shape[1]
    if m < domain_size:
        pad = jnp.zeros(
            (coeffs.shape[0], domain_size - m) + tuple(coeffs.shape[2:]),
            dtype=jnp.uint32,
        )
        coeffs = jnp.concatenate([coeffs, pad], axis=1)
    return fft(coeffs)
