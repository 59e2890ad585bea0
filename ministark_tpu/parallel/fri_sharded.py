"""Distributed FRI rounds over a device mesh.

With coefficients sharded in contiguous blocks (block size even), one FRI
round decomposes as:

  fold:      local strided combine  e + alpha*o             (no comms)
  DEEP eval: local partial ladder sums -> gather/field-add  (one collective)
  divide:    suffix-sum division by (x - z): local suffix
             sums + one all_gather of shard totals          (one collective)

exactly the "distributed FRI folds over ICI" of BASELINE.json config 5.
The division uses the same closed form as the single-device kernel
(ops/poly_device.synth_div_suffix):

  q_i = z^{-(i+1)} * T_{i+1},   T_i = sum_{j >= i} c_j z^j

where shard d (block [d*m, (d+1)*m)) computes its local suffix sums, gathers
every shard's block total, and adds the exclusive suffix of later-shard
totals — one collective per round. The output keeps the input length with a
trailing zero (q has degree n-2; slot n-1 is z^{-n} * T_n = 0), so it stays
contiguously sharded for the next round. Bit-exact with the single-device
kernels (tests/test_sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ntt_device import _pow_traced
from ..ops.poly_device import (
    field_sum,
    fold_even_odd,
    powers,
    suffix_sums,
)
from ..ops.registry import FieldKernels, get_kernels


def _pow2_chain(k: FieldKernels, x, e: int):
    """x^e for a STATIC power-of-two e via repeated squaring.

    Each squaring is fenced with an optimization barrier: an unrolled chain of
    fused field muls re-executes the producer expression at every input use,
    which is exponential in chain length (see ops/poly_device.py::_ob)."""
    assert e & (e - 1) == 0 and e >= 1
    y = x
    for _ in range(e.bit_length() - 1):
        y = jax.lax.optimization_barrier(k.mul(y, y))
    return y


def make_sharded_fri_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    """Jitted sharded closures for size-n coefficient arrays.

    Returns a dict with:
      fold(coeffs, alpha)      -> (n/2,)   folded coefficients (sharded)
      deep(coeffs, z)          -> (fe, fo) the even/odd split evaluations
      divide(coeffs, z, zinv)  -> (n,)     quotient of (x - z) division,
                                           trailing slot zero (sharded)
    with coeffs sharded over ``axis`` in contiguous blocks.
    """
    k = get_kernels(field)
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0 and (n // n_dev) % 2 == 0
    m = n // n_dev
    assert m & (m - 1) == 0, "local block must be a power of two"
    d_bits = max(n_dev.bit_length() - 1, 1)
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
        d = jax.lax.axis_index(axis)
        even = coeffs_local[0::2]
        odd = coeffs_local[1::2]
        half = even.shape[0]
        pw = powers(k, z, half)                       # z^0..z^(half-1)
        z_half = _pow2_chain(k, z, m // 2)            # z^(m/2)
        z_off = _pow_traced(k, z_half, d.astype(jnp.int32), d_bits)
        pw_off = jax.lax.optimization_barrier(
            k.mul(pw, jnp.broadcast_to(z_off, pw.shape))
        )
        fe_part = _dot(k, even, pw_off)
        fo_part = _dot(k, odd, pw_off)
        fe = _allreduce_field(k, fe_part, axis)
        fo = _allreduce_field(k, fo_part, axis)
        return fe, fo

    deep_sharded = shard_map(
        _deep_body, mesh=mesh,
        in_specs=(vec_spec, scalar_spec),
        out_specs=(scalar_spec, scalar_spec),
        check_vma=False,
    )

    def _divide_body(coeffs_local, z, zinv):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        # t_j = c_j * z^(d*m + j)  for local j
        pw = powers(k, z, m)
        z_m = _pow2_chain(k, z, m)
        z_off = _pow_traced(k, z_m, d, d_bits)
        pw_off = jax.lax.optimization_barrier(
            k.mul(pw, jnp.broadcast_to(z_off, pw.shape))
        )
        t = jax.lax.optimization_barrier(k.mul(coeffs_local, pw_off))
        s_loc = suffix_sums(k, t)                     # local inclusive suffix
        # exclusive suffix of later-shard totals: E_d = sum_{s > d} total_s
        totals = jax.lax.all_gather(s_loc[0], axis)   # (n_dev, *e)
        mask = jnp.arange(n_dev) > d
        e_d = field_sum(k, _mask(k, mask, totals), axis=0)
        # T_{g+1} for local j: shift local suffix left by one, add E_d
        zero = jnp.zeros_like(s_loc[:1])
        shifted = k.add(
            jnp.concatenate([s_loc[1:], zero], axis=0),
            jnp.broadcast_to(e_d, s_loc.shape),
        )
        # q_g = zinv^(g+1) * T_{g+1};  zinv^(g+1) = zinv_off * zinv^(j+1)
        pwi = powers(k, zinv, m + 1)[1:]              # zinv^1 .. zinv^m
        zi_m = _pow2_chain(k, zinv, m)
        zi_off = _pow_traced(k, zi_m, d, d_bits)
        pwi_off = jax.lax.optimization_barrier(
            k.mul(pwi, jnp.broadcast_to(zi_off, pwi.shape))
        )
        return k.mul(shifted, pwi_off)

    divide_sharded = shard_map(
        _divide_body, mesh=mesh,
        in_specs=(vec_spec, scalar_spec, scalar_spec),
        out_specs=vec_spec,
        check_vma=False,
    )

    return {
        "fold": jax.jit(fold_sharded),
        "deep": jax.jit(deep_sharded),
        "divide": jax.jit(divide_sharded),
    }


# backward-compatible helper (round-1 API)
def make_sharded_fold_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    fns = make_sharded_fri_fns(field, n, mesh, axis)
    return fns["fold"], fns["deep"]


_FN_CACHE: dict = {}


def get_sharded_fri_fns(field, n: int, mesh: Mesh, axis: str = "shards"):
    key = (field.p, field.extension_degree, n, mesh, axis)
    if key not in _FN_CACHE:
        _FN_CACHE[key] = make_sharded_fri_fns(field, n, mesh, axis)
    return _FN_CACHE[key]


def _mask(k: FieldKernels, mask_1d, a):
    extra = a.ndim - 1
    m = mask_1d.reshape(mask_1d.shape + (1,) * extra)
    return jnp.where(m, a, jnp.zeros_like(a))


def _dot(k: FieldKernels, a, b):
    return field_sum(k, k.mul(a, b), axis=0)


def _allreduce_field(k: FieldKernels, x, axis: str):
    """Field-add reduction across the mesh axis (modular — psum would wrap
    u32, so gather shards and fold with the field add)."""
    parts = jax.lax.all_gather(x, axis)  # (n_dev, *elem)
    return field_sum(k, parts, axis=0)
