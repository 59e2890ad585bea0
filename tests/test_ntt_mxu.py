"""MXU (int8-matmul) NTT: bit-exact vs the XLA device NTT (which is itself
equivalence-tested against the host oracle). The s8 dot_general runs
emulated on the CPU test backend — identical integer semantics, no TPU
needed. Covers 1-, 2- and 3-level factorizations and both fields."""

import numpy as np
import jax.numpy as jnp
import pytest

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP
from ministark_tpu.ops import bb, gl
from ministark_tpu.ops.ntt_device import make_ntt_fns
from ministark_tpu.ops.ntt_mxu import factorize, make_mxu_ntt_fns, supports


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


def test_supports_and_factorize():
    assert supports(1 << 5) and supports(1 << 14) and supports(1 << 24)
    assert not supports(1 << 4) and not supports(48)
    assert factorize(1 << 9) == [9]
    assert factorize(1 << 21) == [7, 7, 7]
    assert factorize(1 << 13) == [7, 6]
    assert all(5 <= f <= 9 for L in range(5, 27) for f in factorize(1 << L))
    assert all(sum(factorize(1 << L)) == L for L in range(5, 27))


def test_fused_supports_factor5_via_padded_tables():
    """2^17 = [6,6,5] is fused-eligible again: the F=32 level uses digit
    tables padded to a 128-column stride (the Mosaic slice-alignment fix,
    see fused_supports / _build_tables docstrings); _build_tables must
    actually pad it."""
    from ministark_tpu.fields import GOLDILOCKS_FP
    from ministark_tpu.ops.ntt_mxu import _build_tables, _params, fused_supports

    assert fused_supports(1 << 14) and fused_supports(1 << 18)
    assert fused_supports(1 << 20) and fused_supports(1 << 21)
    assert fused_supports(1 << 17)
    assert not fused_supports(1 << 13)  # below the size floor

    n = 1 << 17
    root = int(GOLDILOCKS_FP.get_root_of_unity(n))
    factors, v_mats, _, _, v_pads = _build_tables(GOLDILOCKS_FP, n, root)
    _, NA, NB = _params(GOLDILOCKS_FP.p)
    assert factors == [6, 6, 5]
    assert v_pads[2].shape == (NA, 32, NB * 128)      # padded F=32 table
    assert v_pads[0] is v_mats[0]                     # F=64 stays unpadded
    # padded columns: digit b lives at [b*128, b*128+32), rest zero
    vp = np.asarray(v_pads[2]).reshape(NA * 32, NB, 128)
    vm = np.asarray(v_mats[2]).reshape(NA * 32, NB, 32)
    assert np.array_equal(vp[:, :, :32], vm)
    assert not vp[:, :, 32:].any()


@pytest.mark.parametrize("field,rand", [(GOLDILOCKS_FP, _rand_gl),
                                        (BABYBEAR_FP, _rand_bb)])
@pytest.mark.parametrize("n", [1 << 5, 1 << 9, 1 << 13, 1 << 15])
def test_fft_matches_device_ntt(field, rand, n):
    x = rand(2, n)
    ref_fns = make_ntt_fns(field, n)
    mxu_fns = make_mxu_ntt_fns(field, n)
    assert np.array_equal(np.asarray(mxu_fns[0](x)), np.asarray(ref_fns[0](x)))
    assert np.array_equal(np.asarray(mxu_fns[1](x)), np.asarray(ref_fns[1](x)))


@pytest.mark.parametrize("field,rand", [(GOLDILOCKS_FP, _rand_gl),
                                        (BABYBEAR_FP, _rand_bb)])
def test_ifft_roundtrip(field, rand):
    n = 1 << 13
    x = rand(1, n, seed=3)
    fft, ifft, _, _ = make_mxu_ntt_fns(field, n)
    assert np.array_equal(np.asarray(ifft(fft(x))), np.asarray(x))


def test_extreme_values_gl():
    """All-(p-1) and small-constant inputs exercise digit carries end to
    end (every byte 0xFF -> maximal balanced-digit carry chain)."""
    n = 1 << 10
    top = np.full((1, n), gl.P - 1, dtype=np.uint64)
    x = jnp.asarray(gl.pack(top))
    ref_fns = make_ntt_fns(GOLDILOCKS_FP, n)
    mxu_fns = make_mxu_ntt_fns(GOLDILOCKS_FP, n)
    assert np.array_equal(np.asarray(mxu_fns[0](x)), np.asarray(ref_fns[0](x)))


@pytest.mark.parametrize("field,rand", [(GOLDILOCKS_FP, _rand_gl),
                                        (BABYBEAR_FP, _rand_bb)])
@pytest.mark.parametrize("n", [1 << 14, 1 << 15, 1 << 17, 1 << 18])
def test_fused_pallas_matches_device_ntt(field, rand, n, monkeypatch):
    """MINISTARK_MXU_FUSED=1: the fused Pallas level kernels (digitize +
    int8 dot + recombine + twiddle in one VMEM pass) run in interpret mode
    on CPU — identical integer semantics to the XLA lowering.

    1<<18 ([6,6,6]) is the smallest fused-eligible 3-level factorization
    whose level-1 twiddle has K_prod > 1 and exercises the pre-expanded
    (R, F) twiddle planes (round-2 hardware regression: raw (M, F) planes
    + an (rt, F) BlockSpec read past row M at every 3-level size).
    1<<17 ([6,6,5]) exercises the F=32 level with PADDED digit tables
    (PF=128 column stride — the Mosaic slice-alignment fix,
    scripts/tpu_f32_pad_probe.py; hardware-validated by
    scripts/tpu_fused_sweep.py)."""
    monkeypatch.setenv("MINISTARK_MXU_FUSED", "1")
    x = rand(2, n, seed=11)
    ref_fns = make_ntt_fns(field, n)
    fus_fns = make_mxu_ntt_fns(field, n)
    assert np.array_equal(np.asarray(fus_fns[0](x)), np.asarray(ref_fns[0](x)))
    assert np.array_equal(np.asarray(fus_fns[1](x)), np.asarray(ref_fns[1](x)))


@pytest.mark.parametrize("field,rand", [(GOLDILOCKS_FP, _rand_gl),
                                        (BABYBEAR_FP, _rand_bb)])
@pytest.mark.parametrize("mode", ["1", "2"])
def test_fused_pipe_matches_device_ntt(field, rand, mode, monkeypatch):
    """MINISTARK_MXU_PIPE=1/2: the skewed software-pipeline level kernel
    (digitize tile t / dot t-1 / recombine t-2 through double-buffered
    VMEM scratch; mode 2 = guard-free) — bit-exact in interpret mode.
    Kept gated off by default (no hardware win — Mosaic doesn't
    co-schedule MXU/VPU; see BENCHMARKS.md), this stops the variant from
    rotting."""
    n = 1 << 14
    monkeypatch.setenv("MINISTARK_MXU_FUSED", "1")
    monkeypatch.setenv("MINISTARK_MXU_PIPE", mode)
    x = rand(2, n, seed=13)
    ref_fns = make_ntt_fns(field, n)
    fus_fns = make_mxu_ntt_fns(field, n)
    assert np.array_equal(np.asarray(fus_fns[0](x)), np.asarray(ref_fns[0](x)))
    assert np.array_equal(np.asarray(fus_fns[1](x)), np.asarray(ref_fns[1](x)))


@pytest.mark.parametrize("field,rand,ops", [
    (GOLDILOCKS_FP, _rand_gl, gl), (BABYBEAR_FP, _rand_bb, bb)])
def test_coset_matches_device_ntt(field, rand, ops):
    n = 1 << 13
    x = rand(1, n, seed=5)
    shift = field.from_int(7)
    if ops is gl:
        off = jnp.asarray(gl.pack([shift])[0])
        off_inv = jnp.asarray(gl.pack([field.inv(shift)])[0])
    else:
        off = jnp.asarray(np.uint32(int(shift)))
        off_inv = jnp.asarray(np.uint32(int(field.inv(shift))))
    ref = make_ntt_fns(field, n)
    mxu = make_mxu_ntt_fns(field, n)
    assert np.array_equal(np.asarray(mxu[2](x, off)), np.asarray(ref[2](x, off)))
    assert np.array_equal(
        np.asarray(mxu[3](mxu[2](x, off), off_inv)), np.asarray(x)
    )
