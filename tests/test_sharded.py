"""Sharded (multi-chip) kernels must be bit-exact with the single-device path.

Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.ops import bb, gl
from ministark_tpu.ops.registry import get_kernels
from ministark_tpu.parallel import make_mesh, make_sharded_ntt_fns
from ministark_tpu.poly import DensePolynomial, Radix2EvaluationDomain

rng = np.random.default_rng(5)


def _rand(field, n):
    return [int(x) % field.p for x in rng.integers(0, 2**63, size=n, dtype=np.uint64)]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_ntt_gl(n_dev):
    F = GOLDILOCKS_FP
    n = 256
    mesh = make_mesh(n_dev)
    fft, _, _, _ = make_sharded_ntt_fns(F, n, mesh)
    vals = _rand(F, n)
    out = gl.unpack(np.asarray(fft(jnp.asarray(gl.pack(vals))[None]))[0])
    host = Radix2EvaluationDomain(F, n).fft(vals)
    assert list(out) == host


def test_sharded_ntt_bb():
    F = BABYBEAR_FP
    n = 128
    mesh = make_mesh(4)
    fft, _, _, _ = make_sharded_ntt_fns(F, n, mesh)
    vals = _rand(F, n)
    out = bb.unpack(np.asarray(fft(jnp.asarray(bb.pack(vals))[None]))[0])
    host = Radix2EvaluationDomain(F, n).fft(vals)
    assert list(out) == host


def test_sharded_ifft_and_coset_roundtrip():
    """ifft(fft(x)) == x and coset variants match the host coset domain."""
    F = GOLDILOCKS_FP
    n = 256
    mesh = make_mesh(8)
    fft, ifft, coset_fft, coset_ifft = make_sharded_ntt_fns(F, n, mesh)
    vals = _rand(F, n)
    x = jnp.asarray(gl.pack(vals))[None]
    assert np.array_equal(np.asarray(ifft(fft(x))), np.asarray(x))

    shift = F.from_int(7)
    off = jnp.asarray(gl.pack([shift])[0])
    off_inv = jnp.asarray(gl.pack([F.inv(shift)])[0])
    ev = gl.unpack(np.asarray(coset_fft(x, off))[0])
    host = Radix2EvaluationDomain(F, n, offset=shift).fft(vals)
    assert list(ev) == host
    back = coset_ifft(coset_fft(x, off), off_inv)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_sharded_ntt_batched():
    """Batched columns transform identically to per-column transforms."""
    F = GOLDILOCKS_FP
    n = 128
    mesh = make_mesh(4)
    fft, _, _, _ = make_sharded_ntt_fns(F, n, mesh)
    cols = [_rand(F, n) for _ in range(3)]
    x = jnp.asarray(np.stack([np.asarray(gl.pack(c)) for c in cols]))
    out = np.asarray(fft(x))
    for i, c in enumerate(cols):
        host = Radix2EvaluationDomain(F, n).fft(c)
        assert list(gl.unpack(out[i])) == host


def test_sharded_fri_fold_deep_divide():
    from ministark_tpu.fri import FriRound
    from ministark_tpu.parallel import make_sharded_fri_fns

    E = GOLDILOCKS_FP2
    k = get_kernels(E)
    n = 64
    mesh = make_mesh(4)
    fns = make_sharded_fri_fns(E, n, mesh)

    coeffs = [(int(a) % E.base.p, int(b) % E.base.p)
              for a, b in rng.integers(0, 2**63, size=(n, 2), dtype=np.uint64)]
    alpha = (123456789, 987654321)
    z = (13579, 24680)
    x = jnp.asarray(k.pack(coeffs))
    ap = jnp.asarray(k.pack_scalar(alpha))
    zp = jnp.asarray(k.pack_scalar(z))

    with mesh:
        folded = k.unpack(np.asarray(fns["fold"](x, ap)))
        fe, fo = fns["deep"](x, zp)
        fe = k.unpack(np.asarray(fe)[None])[0]
        fo = k.unpack(np.asarray(fo)[None])[0]

    parts = FriRound.split_poly(E, DensePolynomial(E, coeffs), 2)
    host_folded = (parts[0] + parts[1].scale(alpha)).to_vec()
    host_folded += [E.zero()] * (len(folded) - len(host_folded))
    assert folded == host_folded
    assert fe == parts[0].evaluate(z)
    assert fo == parts[1].evaluate(z)

    # distributed (x - z) division: exact division of f - f(z)
    poly = DensePolynomial(E, coeffs)
    f_z = poly.evaluate(z)
    shifted = [E.sub(c, f_z) if i == 0 else c for i, c in enumerate(coeffs)]
    xs = jnp.asarray(k.pack(shifted))
    zinv = jnp.asarray(k.pack_scalar(E.inv(z)))
    with mesh:
        q = k.unpack(np.asarray(fns["divide"](xs, zp, zinv)))
    host_q = (DensePolynomial(E, shifted)
              / DensePolynomial(E, [E.neg(z), E.one()])).to_vec()
    host_q += [E.zero()] * (len(q) - len(host_q))
    assert q == host_q


def test_sharded_matches_single_device_kernel():
    from ministark_tpu.ops.ntt_device import get_ntt_fns

    F = GOLDILOCKS_FP
    n = 512
    mesh = make_mesh(8)
    sharded, _, _, _ = make_sharded_ntt_fns(F, n, mesh)
    single, _, _, _ = get_ntt_fns(F, n)
    vals = _rand(F, n)
    x = jnp.asarray(gl.pack(vals))[None]
    a = np.asarray(sharded(x))
    b = np.asarray(single(x))
    assert np.array_equal(a, b)


def test_sharded_tree_digests():
    """Sharded Merkle build == single-device device-hash build, bit for bit."""
    from ministark_tpu.commit.packed_tree import to_leaf_comps
    from ministark_tpu.ops.leaf_hash import leaf_hash_device_jit
    from ministark_tpu.ops.sha256 import merkle_inner_levels_device
    from ministark_tpu.parallel import sharded_tree_digests

    E = GOLDILOCKS_FP2
    k = get_kernels(E)
    n = 128  # leaves; leafs_per_node=2 -> 64 groups over 8 shards
    mesh = make_mesh(8)
    scalars = [(int(a) % E.base.p, int(b) % E.base.p)
               for a, b in rng.integers(0, 2**63, size=(n, 2), dtype=np.uint64)]
    comps = to_leaf_comps(E, jnp.asarray(k.pack(scalars)))

    leaf = leaf_hash_device_jit(comps, 2, 1)
    upper = merkle_inner_levels_device(leaf, 2)
    single = np.asarray(jnp.concatenate([leaf, upper], axis=0))

    with mesh:
        sharded = np.asarray(sharded_tree_digests(comps, 2, 1, mesh))
    assert np.array_equal(sharded, single)
