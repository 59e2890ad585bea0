"""Distributed FRI folding over a device mesh.

With coefficients sharded in contiguous blocks (block size even), the
even/odd coefficient split is *local* — pairs (c_{2j}, c_{2j+1}) never cross
a shard boundary — so one fold round is:

  fold:      local strided combine  e + alpha*o            (no comms)
  DEEP eval: local partial Horner-ladder sums -> psum      (one collective)
  divide:    suffix-sum division by (x - z): local suffix
             sums + an exclusive all-gather of shard totals (one collective)

exactly the "distributed FRI folds over ICI" of BASELINE.json config 5.
Bit-exact with the single-device kernels (tests/test_sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.poly_device import fold_even_odd, powers
from ..ops.registry import FieldKernels, get_kernels


def make_sharded_fold_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    """Jitted sharded closures for size-n coefficient arrays.

    Returns ``fold(coeffs, alpha)`` -> (n/2,) and
    ``deep_evals(coeffs, z)`` -> (fe, fo) scalars, with coeffs sharded over
    ``axis`` in contiguous blocks.
    """
    k = get_kernels(field)
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0 and (n // n_dev) % 2 == 0
    elem_spec = [None] * len(k.elem_axes)
    vec_spec = P(axis, *elem_spec)
    scalar_spec = P(*elem_spec) if elem_spec else P()

    def _fold_body(coeffs_local, alpha):
        return fold_even_odd(k, coeffs_local, alpha)

    fold_sharded = shard_map(
        _fold_body, mesh=mesh,
        in_specs=(vec_spec, scalar_spec),
        out_specs=vec_spec,
        check_vma=False,
    )

    def _deep_body(coeffs_local, z):
        # local slice covers global indices [d*m, (d+1)*m); even coeffs are
        # local indices 0,2,4..; their global even-rank = (d*m)/2 + j
        m = coeffs_local.shape[0]
        d = jax.lax.axis_index(axis)
        even = coeffs_local[0::2]
        odd = coeffs_local[1::2]
        half = even.shape[0]
        pw = powers(k, z, half)                       # z^0..z^(half-1)
        # shard offset factor: z^(d*m/2)
        z_m = z
        # compute z^(m/2) statically then raise to d via fori (d < n_dev)
        zm = z
        for _ in range((m // 2).bit_length() - 1):
            zm = k.mul(zm, zm)
        # zm = z^(2^floor(log2(m/2))) — m/2 is a power of two in our sizes
        assert (m // 2) & (m // 2 - 1) == 0, "local half must be a power of 2"
        def raise_pow(i, acc):
            return k.mul(acc, zm)
        one = jnp.broadcast_to(k.one(), tuple(z.shape))
        z_off = jax.lax.fori_loop(0, d, raise_pow, one)
        fe_part = _dot(k, even, k.mul(pw, jnp.broadcast_to(z_off, pw.shape)))
        fo_part = _dot(k, odd, k.mul(pw, jnp.broadcast_to(z_off, pw.shape)))
        fe = _psum_field(k, fe_part, axis)
        fo = _psum_field(k, fo_part, axis)
        return fe, fo

    deep_sharded = shard_map(
        _deep_body, mesh=mesh,
        in_specs=(vec_spec, scalar_spec),
        out_specs=(scalar_spec, scalar_spec),
        check_vma=False,
    )

    return jax.jit(fold_sharded), jax.jit(deep_sharded)


def _dot(k: FieldKernels, a, b):
    from ..ops.poly_device import field_sum

    return field_sum(k, k.mul(a, b), axis=0)


def _psum_field(k: FieldKernels, x, axis: str):
    """Field-add reduction across the mesh axis (modular — psum would wrap
    u32, so gather shards and fold with the field add)."""
    parts = jax.lax.all_gather(x, axis)  # (n_dev, *elem)
    from ..ops.poly_device import field_sum

    return field_sum(k, parts, axis=0)
