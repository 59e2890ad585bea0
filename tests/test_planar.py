"""Limb-planar fast paths (ops/planar.py): bit-exact vs the packed kernels
and the host oracle at sizes above and below PLANAR_MIN."""

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.ops import poly_device as pd
from ministark_tpu.ops.planar import get_planar
from ministark_tpu.ops.registry import get_kernels
from ministark_tpu.poly import DensePolynomial
from ministark_tpu.utils.rng import ark_test_rng


def _rand_packed(ext, n):
    ke = get_kernels(ext)
    rng = ark_test_rng()
    vals = [ext.rand(rng) for _ in range(n)]
    return vals, np.asarray(ke.pack(vals)).reshape((n,) + ke.elem_axes)


@pytest.mark.parametrize("sf", [Goldilocks, BabyBear])
@pytest.mark.parametrize("n", [64, 4096])
def test_planar_fold_matches_host(sf, n):
    ext = sf.extension
    ke = get_kernels(ext)
    vals, packed = _rand_packed(ext, n)
    alpha = ext.rand(ark_test_rng())
    import jax.numpy as jnp

    out = pd.fold_even_odd(ke, jnp.asarray(packed),
                           jnp.asarray(ke.pack_scalar(alpha)))
    got = ke.unpack(np.asarray(out))
    want = [ext.add(vals[2 * i], ext.mul(alpha, vals[2 * i + 1]))
            for i in range(n // 2)]
    assert got == want


@pytest.mark.parametrize("sf", [Goldilocks, BabyBear])
@pytest.mark.parametrize("F", [4, 8])
def test_planar_fold_factor_matches_host(sf, F):
    """F-way fold ABOVE PLANAR_MIN (n=4096): the planar fold_factor path.
    Round-3 regression: the F=8 chain compiled without fences wedged
    XLA:CPU for >10 minutes (ops/planar.py fold_factor_planes)."""
    import jax.numpy as jnp

    ext = sf.extension
    ke = get_kernels(ext)
    n = 4096
    vals, packed = _rand_packed(ext, n)
    alpha = ext.rand(ark_test_rng())
    out = pd.fold_factor(ke, jnp.asarray(packed),
                         jnp.asarray(ke.pack_scalar(alpha)), F)
    got = ke.unpack(np.asarray(out))
    a_pows = [ext.pow(alpha, j) for j in range(F)]
    want = []
    for i in range(n // F):
        acc = ext.zero()
        for j in range(F):
            acc = ext.add(acc, ext.mul(a_pows[j], vals[F * i + j]))
        want.append(acc)
    assert got == want


@pytest.mark.parametrize("sf", [Goldilocks, BabyBear])
# 65: packed fallback; 2048: planar small-m branch boundary; 3072: blocked
# path with an odd row count; 4096: blocked path
@pytest.mark.parametrize("n", [65, 2048, 3072, 4096])
def test_planar_synth_div_matches_host(sf, n):
    import jax.numpy as jnp

    ext = sf.extension
    ke = get_kernels(ext)
    vals, packed = _rand_packed(ext, n)
    z = ext.rand(ark_test_rng())
    # make division exact: subtract f(z) from the constant term
    f = DensePolynomial(ext, vals)
    fz = f.evaluate(z)
    vals = [ext.sub(vals[0], fz)] + vals[1:]
    packed = np.asarray(ke.pack(vals)).reshape((n,) + ke.elem_axes)

    zinv = ext.inv(z)
    q = pd.synth_div_suffix(ke, jnp.asarray(packed),
                            jnp.asarray(ke.pack_scalar(z)),
                            jnp.asarray(ke.pack_scalar(zinv)))
    got = ke.unpack(np.asarray(q))
    num = DensePolynomial(ext, vals)
    den = DensePolynomial(ext, [ext.neg(z), ext.one()])
    want = (num / den).to_vec()
    want = want + [ext.zero()] * (len(got) - len(want))
    assert got == want


@pytest.mark.parametrize("sf", [Goldilocks, BabyBear])
@pytest.mark.parametrize("n", [4096, 8192])
def test_fold_div_fused_matches_host(sf, n):
    """The engine's one-executable FRI round (_fold_div_fused: planar fold +
    DEEP subtract + blocked division, natural halved output) vs the host
    polynomial oracle."""
    import jax.numpy as jnp

    from ministark_tpu.stark.engine import _fold_div_fused

    ext = sf.extension
    ke = get_kernels(ext)
    rng = ark_test_rng()
    vals, packed = _rand_packed(ext, n)
    z = ext.rand(rng)
    alpha = ext.rand(rng)
    even = DensePolynomial(ext, vals[0::2])
    odd = DensePolynomial(ext, vals[1::2])
    folded = even + odd.scale(alpha)
    dv = folded.evaluate(z)  # engine: deep_value = f_e(z) + alpha*f_o(z)
    out = _fold_div_fused(
        ke, jnp.asarray(packed), jnp.asarray(ke.pack_scalar(z)),
        jnp.asarray(ke.pack_scalar(alpha)), jnp.asarray(ke.pack_scalar(dv)),
        jnp.asarray(ke.pack_scalar(ext.inv(z))),
    )
    assert out.shape[0] == n // 2
    got = ke.unpack(np.asarray(out))
    num = folded - DensePolynomial(ext, [dv])
    den = DensePolynomial(ext, [ext.neg(z), ext.one()])
    want = (num / den).to_vec()
    want = want + [ext.zero()] * (len(got) - len(want))
    assert got == want


@pytest.mark.parametrize("sf", [Goldilocks, BabyBear])
@pytest.mark.parametrize("n", [64, 4096])
def test_planar_eval_even_odd_matches_host(sf, n):
    import jax.numpy as jnp

    ext = sf.extension
    ke = get_kernels(ext)
    vals, packed = _rand_packed(ext, n)
    z = ext.rand(ark_test_rng())
    fe, fo = pd.eval_even_odd(ke, jnp.asarray(packed),
                              jnp.asarray(ke.pack_scalar(z)))
    fe = ke.unpack(np.asarray(fe)[None])[0]
    fo = ke.unpack(np.asarray(fo)[None])[0]
    ev = DensePolynomial(ext, vals[0::2]).evaluate(z)
    od = DensePolynomial(ext, vals[1::2]).evaluate(z)
    assert fe == ev and fo == od


def test_planar_roundtrip_layouts():
    import jax.numpy as jnp

    for sf in (Goldilocks, BabyBear):
        for field in (sf.base, sf.extension):
            ke = get_kernels(field)
            pc = get_planar(ke)
            assert pc is not None
            _, packed = _rand_packed(field, 32)
            pl = pc.to_planes(jnp.asarray(packed))
            assert pl.shape == (pc.C, 32)
            back = np.asarray(pc.from_planes(pl))
            assert np.array_equal(back, packed)


def test_planar_mul_matches_host():
    import jax.numpy as jnp

    for sf in (Goldilocks, BabyBear):
        ext = sf.extension
        ke = get_kernels(ext)
        pc = get_planar(ke)
        va, pa = _rand_packed(ext, 100)
        vb, pb = _rand_packed(ext, 100)
        out = pc.from_planes(pc.mul(pc.to_planes(jnp.asarray(pa)),
                                    pc.to_planes(jnp.asarray(pb))))
        got = ke.unpack(np.asarray(out))
        assert got == [ext.mul(a, b) for a, b in zip(va, vb)]


@pytest.mark.parametrize("sf", [Goldilocks, BabyBear])
@pytest.mark.parametrize("n", [64, 4096])
def test_planar_eval_many_matches_host(sf, n):
    import jax.numpy as jnp

    ext = sf.extension
    ke = get_kernels(ext)
    B = 3
    vals, packed = _rand_packed(ext, B * n)
    batch = jnp.asarray(packed).reshape((B, n) + ke.elem_axes)
    z = ext.rand(ark_test_rng())
    out = pd.eval_many(ke, batch, jnp.asarray(ke.pack_scalar(z)))
    got = ke.unpack(np.asarray(out))
    want = [DensePolynomial(ext, vals[i * n:(i + 1) * n]).evaluate(z)
            for i in range(B)]
    assert got == want
