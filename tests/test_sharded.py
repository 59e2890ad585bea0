"""Sharded (multi-chip) NTT must be bit-exact with the single-device path.

Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP
from ministark_tpu.ops import bb, gl
from ministark_tpu.parallel import make_mesh, make_sharded_ntt_fns
from ministark_tpu.poly import Radix2EvaluationDomain

rng = np.random.default_rng(5)


def _rand(field, n):
    return [int(x) % field.p for x in rng.integers(0, 2**63, size=n, dtype=np.uint64)]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_ntt_gl(n_dev):
    F = GOLDILOCKS_FP
    n = 256
    mesh = make_mesh(n_dev)
    fn = make_sharded_ntt_fns(F, n, mesh)
    vals = _rand(F, n)
    out = gl.unpack(np.asarray(fn(jnp.asarray(gl.pack(vals)))))
    host = Radix2EvaluationDomain(F, n).fft(vals)
    assert list(out) == host


def test_sharded_ntt_bb():
    F = BABYBEAR_FP
    n = 128
    mesh = make_mesh(4)
    fn = make_sharded_ntt_fns(F, n, mesh)
    vals = _rand(F, n)
    out = bb.unpack(np.asarray(fn(jnp.asarray(bb.pack(vals)))))
    host = Radix2EvaluationDomain(F, n).fft(vals)
    assert list(out) == host


def test_sharded_fri_fold():
    from ministark_tpu.fields import GOLDILOCKS_FP2
    from ministark_tpu.fri import FriRound
    from ministark_tpu.ops.registry import get_kernels
    from ministark_tpu.parallel.fri_sharded import make_sharded_fold_fns
    from ministark_tpu.poly import DensePolynomial

    E = GOLDILOCKS_FP2
    k = get_kernels(E)
    n = 64
    mesh = make_mesh(4)
    fold, deep = make_sharded_fold_fns(E, n, mesh)

    coeffs = [(int(a) % E.base.p, int(b) % E.base.p)
              for a, b in rng.integers(0, 2**63, size=(n, 2), dtype=np.uint64)]
    alpha = (123456789, 987654321)
    z = (13579, 24680)
    x = jnp.asarray(k.pack(coeffs))
    ap = jnp.asarray(k.pack_scalar(alpha))
    zp = jnp.asarray(k.pack_scalar(z))

    with mesh:
        folded = k.unpack(np.asarray(fold(x, ap)))
        fe, fo = deep(x, zp)
        fe = k.unpack(np.asarray(fe)[None])[0]
        fo = k.unpack(np.asarray(fo)[None])[0]

    parts = FriRound.split_poly(E, DensePolynomial(E, coeffs), 2)
    host_folded = (parts[0] + parts[1].scale(alpha)).to_vec()
    host_folded += [E.zero()] * (len(folded) - len(host_folded))
    assert folded == host_folded
    assert fe == parts[0].evaluate(z)
    assert fo == parts[1].evaluate(z)


def test_sharded_matches_single_device_kernel():
    from ministark_tpu.ops.ntt_device import get_ntt_fns

    F = GOLDILOCKS_FP
    n = 512
    mesh = make_mesh(8)
    sharded = make_sharded_ntt_fns(F, n, mesh)
    single, _, _, _ = get_ntt_fns(F, n)
    vals = _rand(F, n)
    x = jnp.asarray(gl.pack(vals))
    a = np.asarray(sharded(x))
    b = np.asarray(single(x[None]))[0]
    assert np.array_equal(a, b)
