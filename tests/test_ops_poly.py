"""Device polynomial primitives vs host oracle."""

import numpy as np
import jax.numpy as jnp

from ministark_tpu.fields import (
    BABYBEAR_FP,
    BABYBEAR_FP4,
    GOLDILOCKS_FP,
    GOLDILOCKS_FP2,
)
from ministark_tpu.ops.poly_device import (
    eval_poly,
    eval_poly_base_coeffs_ext_point,
    field_sum,
    fold_even_odd,
    mix_columns,
    powers,
    synth_div,
)
from ministark_tpu.ops.registry import get_kernels, lift_base_array
from ministark_tpu.poly import DensePolynomial

rng = np.random.default_rng(11)


def _rand_scalars(field, n):
    if field.extension_degree == 1:
        return [int(x) % field.p for x in rng.integers(0, 2**63, size=n, dtype=np.uint64)]
    return [
        field.from_base_coeffs(
            tuple(int(x) % field.p for x in rng.integers(0, 2**63, size=field.extension_degree, dtype=np.uint64))
        )
        for _ in range(n)
    ]


FIELDS = [GOLDILOCKS_FP, GOLDILOCKS_FP2, BABYBEAR_FP, BABYBEAR_FP4]


def test_powers_and_sum():
    for F in FIELDS:
        k = get_kernels(F)
        x = _rand_scalars(F, 1)[0]
        pw = k.unpack(powers(k, jnp.asarray(k.pack_scalar(x)), 9))
        expect = [F.pow(x, i) for i in range(9)]
        assert pw == expect

        vals = _rand_scalars(F, 13)
        s = field_sum(k, jnp.asarray(k.pack(vals)))
        total = F.zero()
        for v in vals:
            total = F.add(total, v)
        assert k.unpack(s[None])[0] == total


def test_eval_poly():
    for F in FIELDS:
        k = get_kernels(F)
        coeffs = _rand_scalars(F, 33)
        x = _rand_scalars(F, 1)[0]
        p = DensePolynomial(F, coeffs)
        got = k.unpack(eval_poly(k, jnp.asarray(k.pack(coeffs)), jnp.asarray(k.pack_scalar(x)))[None])[0]
        assert got == p.evaluate(x)


def test_eval_base_coeffs_at_ext_point():
    for base, ext in ((GOLDILOCKS_FP, GOLDILOCKS_FP2), (BABYBEAR_FP, BABYBEAR_FP4)):
        kb, ke = get_kernels(base), get_kernels(ext)
        coeffs = _rand_scalars(base, 17)
        x = _rand_scalars(ext, 1)[0]
        host = DensePolynomial(ext, [ext.from_base_prime_field(c) for c in coeffs]).evaluate(x)
        got = ke.unpack(
            eval_poly_base_coeffs_ext_point(
                ke, jnp.asarray(kb.pack(coeffs)), jnp.asarray(ke.pack_scalar(x))
            )[None]
        )[0]
        assert got == host


def test_synth_div():
    for F in FIELDS:
        k = get_kernels(F)
        q_coeffs = _rand_scalars(F, 20)
        z = _rand_scalars(F, 1)[0]
        q = DensePolynomial(F, q_coeffs)
        divisor = DensePolynomial(F, [F.neg(z), F.one()])
        f = q * divisor  # exact multiple of (x - z)
        fc = f.to_vec()
        # pad to full length if host trimmed (leading coeff may vanish)
        while len(fc) < len(q_coeffs) + 1:
            fc.append(F.zero())
        got = k.unpack(synth_div(k, jnp.asarray(k.pack(fc)), jnp.asarray(k.pack_scalar(z))))
        want = q.to_vec()
        while len(want) < len(got):
            want.append(F.zero())
        assert got == want


def test_double_synth_div_quadratic():
    """(f - g) / ((x-x1)(x-x2)) == chained synthetic divisions."""
    F = GOLDILOCKS_FP2
    k = get_kernels(F)
    q_coeffs = _rand_scalars(F, 12)
    x1, x2 = _rand_scalars(F, 2)
    q = DensePolynomial(F, q_coeffs)
    van = DensePolynomial(F, [F.neg(x1), F.one()]) * DensePolynomial(F, [F.neg(x2), F.one()])
    f = q * van
    fc = f.to_vec()
    while len(fc) < len(q_coeffs) + 2:
        fc.append(F.zero())
    d1 = synth_div(k, jnp.asarray(k.pack(fc)), jnp.asarray(k.pack_scalar(x1)))
    d2 = synth_div(k, d1, jnp.asarray(k.pack_scalar(x2)))
    got = k.unpack(d2)
    want = q.to_vec()
    while len(want) < len(got):
        want.append(F.zero())
    assert got == want


def test_synth_div_suffix_matches_scan_version():
    from ministark_tpu.ops.poly_device import synth_div_suffix

    for F in (GOLDILOCKS_FP2, BABYBEAR_FP4):
        k = get_kernels(F)
        coeffs = _rand_scalars(F, 24)
        z = _rand_scalars(F, 1)[0]
        arr = jnp.asarray(k.pack(coeffs))
        zp = jnp.asarray(k.pack_scalar(z))
        zinv = jnp.asarray(k.pack_scalar(F.inv(z)))
        got = k.unpack(synth_div_suffix(k, arr, zp, zinv))
        want = k.unpack(synth_div(k, arr, zp))
        assert got == want


def test_eval_even_odd():
    from ministark_tpu.fri import FriRound
    from ministark_tpu.ops.poly_device import eval_even_odd

    F = GOLDILOCKS_FP2
    k = get_kernels(F)
    for n in (8, 9, 1):
        coeffs = _rand_scalars(F, n)
        z = _rand_scalars(F, 1)[0]
        parts = FriRound.split_poly(F, DensePolynomial(F, coeffs), 2)
        fe, fo = eval_even_odd(k, jnp.asarray(k.pack(coeffs)), jnp.asarray(k.pack_scalar(z)))
        assert k.unpack(fe[None])[0] == parts[0].evaluate(z)
        assert k.unpack(fo[None])[0] == parts[1].evaluate(z)


def test_fold_even_odd():
    from ministark_tpu.fri import FriRound

    for F in (GOLDILOCKS_FP2, BABYBEAR_FP4):
        k = get_kernels(F)
        for n in (8, 9):
            coeffs = _rand_scalars(F, n)
            alpha = _rand_scalars(F, 1)[0]
            parts = FriRound.split_poly(F, DensePolynomial(F, coeffs), 2)
            host = parts[0] + parts[1].scale(alpha)
            got = k.unpack(
                fold_even_odd(k, jnp.asarray(k.pack(coeffs)), jnp.asarray(k.pack_scalar(alpha)))
            )
            want = host.to_vec()
            while len(want) < len(got):
                want.append(F.zero())
            assert got == want


def test_mix_columns():
    F = GOLDILOCKS_FP
    k = get_kernels(F)
    w, n = 6, 16
    cols = [_rand_scalars(F, n) for _ in range(w)]
    r = 987654321
    weights = [F.pow(r, i) for i in range(w)]
    host = [0] * n
    for i in range(w):
        for j in range(n):
            host[j] = F.add(host[j], F.mul(weights[i], cols[i][j]))
    arr = jnp.asarray(np.stack([k.pack(c) for c in cols]))
    wt = jnp.asarray(k.pack(weights))
    got = k.unpack(mix_columns(k, arr, wt))
    assert got == host


def test_lift_base_array():
    kb = get_kernels(GOLDILOCKS_FP)
    ke = get_kernels(GOLDILOCKS_FP2)
    arr = jnp.asarray(kb.pack([5, 6]))
    lifted = ke.unpack(lift_base_array(ke, arr))
    assert lifted == [(5, 0), (6, 0)]

    kb4 = get_kernels(BABYBEAR_FP)
    ke4 = get_kernels(BABYBEAR_FP4)
    arr = jnp.asarray(kb4.pack([5, 6]))
    lifted = ke4.unpack(lift_base_array(ke4, arr))
    assert lifted == [((5, 0), (0, 0)), ((6, 0), (0, 0))]


def test_batch_inverse():
    from ministark_tpu.ops.poly_device import batch_inverse_full, prefix_products

    for F in (GOLDILOCKS_FP, GOLDILOCKS_FP2, BABYBEAR_FP):
        k = get_kernels(F)
        vals = [v for v in _rand_scalars(F, 17) if not F.is_zero(v)]
        arr = jnp.asarray(k.pack(vals))
        pre = k.unpack(prefix_products(k, arr))
        acc = F.one()
        for i, v in enumerate(vals):
            acc = F.mul(acc, v)
            assert pre[i] == acc
        inv = k.unpack(batch_inverse_full(F, k, arr))
        assert inv == [F.inv(v) for v in vals]
