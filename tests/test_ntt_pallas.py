"""Pallas VMEM four-step NTT: bit-exact vs the XLA device NTT (which is
itself equivalence-tested against the host oracle). Runs in interpret mode
on the CPU test backend — identical kernel semantics, no TPU needed."""

import numpy as np
import jax.numpy as jnp
import pytest

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP
from ministark_tpu.ops import bb, gl
from ministark_tpu.ops.ntt_device import make_ntt_fns
from ministark_tpu.ops.ntt_pallas import make_pallas_ntt_fns, supports

N = 1 << 14


def _rand_gl(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64)
    out = np.zeros((batch, n, 2), dtype=np.uint32)
    out[..., 0] = vals & 0xFFFFFFFF
    out[..., 1] = vals >> 32
    return jnp.asarray(out)


def _rand_bb(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, bb.P, size=(batch, n), dtype=np.uint32))


def test_supports():
    assert supports(1 << 14) and supports(1 << 20) and supports(1 << 22)
    assert not supports(1 << 13) and not supports(1 << 23)


@pytest.mark.parametrize("field,rand", [(GOLDILOCKS_FP, _rand_gl),
                                        (BABYBEAR_FP, _rand_bb)])
def test_fft_matches_device_ntt(field, rand):
    x = rand(2, N)
    ref_fns = make_ntt_fns(field, N)
    pal_fns = make_pallas_ntt_fns(field, N)
    assert np.array_equal(np.asarray(pal_fns[0](x)), np.asarray(ref_fns[0](x)))


def test_ifft_roundtrip_gl():
    x = _rand_gl(1, N, seed=3)
    fft, ifft, _, _ = make_pallas_ntt_fns(GOLDILOCKS_FP, N)
    assert np.array_equal(np.asarray(ifft(fft(x))), np.asarray(x))


def test_coset_matches_device_ntt_gl():
    field = GOLDILOCKS_FP
    x = _rand_gl(1, N, seed=5)
    shift = field.from_int(7)
    off = jnp.asarray(gl.pack([shift])[0])
    off_inv = jnp.asarray(gl.pack([field.inv(shift)])[0])
    ref = make_ntt_fns(field, N)
    pal = make_pallas_ntt_fns(field, N)
    assert np.array_equal(np.asarray(pal[2](x, off)), np.asarray(ref[2](x, off)))
    assert np.array_equal(
        np.asarray(pal[3](pal[2](x, off), off_inv)), np.asarray(x)
    )
