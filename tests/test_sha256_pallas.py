"""Pallas SHA-256 (ops/sha256_pallas.py) vs hashlib + the XLA path.

Interpret mode only (CPU) — Mosaic lowering is hardware-validated
separately by scripts/tpu_sha_probe.py (CLAUDE.md discipline: interpret
tests do NOT cover Mosaic)."""

import hashlib

import numpy as np
import pytest

from ministark_tpu.ops.sha256 import digests_to_bytes
from ministark_tpu.ops import sha256_pallas as sp


def _rows(n, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 32, size=(n, c, 2), dtype=np.uint64).astype(
        np.uint32
    )


def _row_bytes(comps):
    u64 = comps[:, :, 0].astype(np.uint64) | (
        comps[:, :, 1].astype(np.uint64) << 32
    )
    return [r.tobytes() for r in u64]


@pytest.mark.parametrize("c", [1, 2, 4, 6])
def test_row_digests_tr_vs_hashlib(c):
    n = sp.MIN_LANES
    comps = _rows(n, c, seed=c)
    got = digests_to_bytes(np.asarray(
        sp.row_digests_tr(comps, interpret=True).T
    ))
    want = [hashlib.sha256(b).digest() for b in _row_bytes(comps)]
    # spot-check a spread of lanes (full loop is slow in interpret mode)
    for i in list(range(16)) + [n // 2, n - 1]:
        assert got[i].tobytes() == want[i], f"lane {i}"


@pytest.mark.parametrize("fan", [2, 4, 8])
def test_inner_level_tr_vs_hashlib(fan):
    n = sp.MIN_LANES * fan
    rng = np.random.default_rng(fan)
    dig = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64).astype(
        np.uint32
    )
    import jax.numpy as jnp

    got = digests_to_bytes(np.asarray(
        sp.inner_level_tr(jnp.asarray(dig.T), fan, interpret=True).T
    ))
    raw = digests_to_bytes(dig)
    for p in list(range(8)) + [n // fan - 1]:
        msg = b"".join(
            raw[p * fan + c].tobytes() for c in range(fan)
        )
        assert got[p].tobytes() == hashlib.sha256(msg).digest(), f"parent {p}"


@pytest.mark.parametrize("arity", [2, 4])
def test_build_digests_tr_matches_xla_tree(arity, monkeypatch):
    """Whole-tree digests byte-identical to the XLA _build_digests."""
    from ministark_tpu.commit.index_tree import _build_digests

    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    n = sp.MIN_LANES * arity  # one pallas leaf level + pallas/XLA uppers
    comps = _rows(n, 2, seed=9)
    want = np.asarray(_build_digests(comps, arity))
    got = np.asarray(sp.build_digests_tr(comps, arity, interpret=True))
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_dispatcher_env_gate(monkeypatch):
    """_build_digests takes the pallas path under MINISTARK_SHA_PALLAS=1
    and produces the same bytes as the XLA path."""
    from ministark_tpu.commit.index_tree import _build_digests

    comps = _rows(sp.MIN_LANES, 2, seed=3)
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    want = np.asarray(_build_digests(comps, 4))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "1")
    _build_digests.clear_cache()  # env is read at trace time
    got = np.asarray(_build_digests(comps, 4))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    _build_digests.clear_cache()
    assert np.array_equal(got, want)


def test_inner_levels_fused_pallas_matches_xla(monkeypatch):
    """merkle_inner_levels_device (the PARITY trees' upper-level builder)
    takes the pallas path for wide levels under MINISTARK_SHA_PALLAS=1 and
    produces byte-identical levels to the XLA path."""
    from ministark_tpu.ops.sha256 import (
        _inner_levels_fused,
        merkle_inner_levels_device,
    )

    rng = np.random.default_rng(11)
    # fan 2 with two pallas-wide levels (8192 -> 4096 -> 2048) before the
    # narrow XLA tail — the parity-tree configuration (inner_children = 2)
    import jax.numpy as jnp

    dig = jnp.asarray(rng.integers(
        0, 1 << 32, size=(4 * sp.MIN_LANES, 8), dtype=np.uint64
    ).astype(np.uint32))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    _inner_levels_fused.clear_cache()  # env is read at trace time
    want = np.asarray(merkle_inner_levels_device(dig, 2))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "1")
    _inner_levels_fused.clear_cache()
    got = np.asarray(merkle_inner_levels_device(dig, 2))
    monkeypatch.setenv("MINISTARK_SHA_PALLAS", "0")
    _inner_levels_fused.clear_cache()
    assert got.shape == want.shape
    assert np.array_equal(got, want)
