"""Device NTT vs host-exact domain transforms."""

import numpy as np
import jax.numpy as jnp

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP
from ministark_tpu.ops import bb, gl
from ministark_tpu.ops.ntt_device import get_ntt_fns, _powers, _field_ops
from ministark_tpu.poly import Radix2EvaluationDomain

rng = np.random.default_rng(7)


def _rand(field, n):
    return [int(x) % field.p for x in rng.integers(0, 2**63, size=n, dtype=np.uint64)]


def test_gl_fft_ifft_matches_host():
    F = GOLDILOCKS_FP
    n = 256
    d = Radix2EvaluationDomain(F, n)
    fft, ifft, _, _ = get_ntt_fns(F, n)
    cols = [_rand(F, n) for _ in range(3)]
    x = jnp.asarray(gl.pack(np.array(cols, dtype=object)))
    evals = gl.unpack(np.asarray(fft(x)))
    for c in range(3):
        assert list(evals[c]) == d.fft(cols[c])
    back = gl.unpack(np.asarray(ifft(fft(x))))
    for c in range(3):
        assert list(back[c]) == cols[c]


def test_bb_fft_ifft_matches_host():
    F = BABYBEAR_FP
    n = 128
    d = Radix2EvaluationDomain(F, n)
    fft, ifft, _, _ = get_ntt_fns(F, n)
    cols = [_rand(F, n) for _ in range(2)]
    x = jnp.asarray(bb.pack(np.array(cols, dtype=object)))
    evals = bb.unpack(np.asarray(fft(x)))
    for c in range(2):
        assert list(evals[c]) == d.fft(cols[c])
    back = bb.unpack(np.asarray(ifft(fft(x))))
    for c in range(2):
        assert list(back[c]) == cols[c]


def test_gl_coset_fft_matches_host():
    F = GOLDILOCKS_FP
    n = 64
    shift = 123456789
    d = Radix2EvaluationDomain(F, n).get_coset(shift)
    fft_, ifft_, coset_fft, coset_ifft = get_ntt_fns(F, n)
    coeffs = _rand(F, n)
    x = jnp.asarray(gl.pack(np.array([coeffs], dtype=object)))
    off = jnp.asarray(gl.pack([shift])[0])
    evals = gl.unpack(np.asarray(coset_fft(x, off)))
    assert list(evals[0]) == d.fft(coeffs)
    off_inv = jnp.asarray(gl.pack([F.inv(shift)])[0])
    back = gl.unpack(np.asarray(coset_ifft(coset_fft(x, off), off_inv)))
    assert list(back[0]) == coeffs


def test_bb_coset_roundtrip():
    F = BABYBEAR_FP
    n = 32
    shift = 98765
    d = Radix2EvaluationDomain(F, n).get_coset(shift)
    _, _, coset_fft, coset_ifft = get_ntt_fns(F, n)
    coeffs = _rand(F, n)
    x = jnp.asarray(bb.pack(np.array([coeffs], dtype=object)))
    off = jnp.asarray(np.uint32(shift))
    evals = bb.unpack(np.asarray(coset_fft(x, off)))
    assert list(evals[0]) == d.fft(coeffs)


def test_powers_scan():
    F = GOLDILOCKS_FP
    ops = _field_ops(F)
    s = jnp.asarray(gl.pack([7])[0])
    pw = gl.unpack(np.asarray(_powers(ops, s, 16)))
    assert list(pw) == [pow(7, i, F.p) for i in range(16)]

    Fb = BABYBEAR_FP
    opsb = _field_ops(Fb)
    sb = jnp.asarray(np.uint32(3))
    pwb = bb.unpack(np.asarray(_powers(opsb, sb, 10)))
    assert list(pwb) == [pow(3, i, Fb.p) for i in range(10)]


def test_extension_codeword_via_component_batch():
    """Fp2 NTT == two base NTTs over the coefficient components (the 2-adic
    roots live in the base subfield)."""
    from ministark_tpu.fields import GOLDILOCKS_FP2

    E = GOLDILOCKS_FP2
    n = 32
    d = Radix2EvaluationDomain(E, n)
    coeffs = [(a, b) for a, b in zip(_rand(GOLDILOCKS_FP, n), _rand(GOLDILOCKS_FP, n))]
    host_evals = d.fft(coeffs)

    fft, _, _, _ = get_ntt_fns(GOLDILOCKS_FP, n)
    comp = np.array([[c[0] for c in coeffs], [c[1] for c in coeffs]], dtype=object)
    evals = gl.unpack(np.asarray(fft(jnp.asarray(gl.pack(comp)))))
    got = [(evals[0][i], evals[1][i]) for i in range(n)]
    assert got == host_evals


def test_four_step_matches_host():
    """Large sizes route through the four-step factorization — bit-exact."""
    from ministark_tpu.ops import ntt_device

    F = GOLDILOCKS_FP
    n = ntt_device.FOUR_STEP_MIN
    d = Radix2EvaluationDomain(F, n)
    fft, ifft, coset_fft, coset_ifft = get_ntt_fns(F, n)
    vals = _rand(F, n)
    x = jnp.asarray(gl.pack(np.array([vals], dtype=object)))
    evals = gl.unpack(np.asarray(fft(x)))
    assert list(evals[0]) == d.fft(vals)
    back = gl.unpack(np.asarray(ifft(fft(x))))
    assert list(back[0]) == vals

    shift = 424242
    dc = Radix2EvaluationDomain(F, n).get_coset(shift)
    off = jnp.asarray(gl.pack([shift])[0])
    cev = gl.unpack(np.asarray(coset_fft(x, off)))
    assert list(cev[0]) == dc.fft(vals)
    off_inv = jnp.asarray(gl.pack([F.inv(shift)])[0])
    back = gl.unpack(np.asarray(coset_ifft(coset_fft(x, off), off_inv)))
    assert list(back[0]) == vals


def test_four_step_babybear():
    from ministark_tpu.ops import ntt_device

    F = BABYBEAR_FP
    n = ntt_device.FOUR_STEP_MIN
    d = Radix2EvaluationDomain(F, n)
    fft, _, _, _ = get_ntt_fns(F, n)
    vals = _rand(F, n)
    x = jnp.asarray(bb.pack(np.array([vals], dtype=object)))
    evals = bb.unpack(np.asarray(fft(x)))
    assert list(evals[0]) == d.fft(vals)
