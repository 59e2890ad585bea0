"""End-to-end sharded prover: DeviceEngine.prove over a device mesh must
produce BYTE-IDENTICAL proofs to the single-chip engine (SURVEY §7 step 9 /
BASELINE config 5). Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np

from ministark_tpu.fields import Goldilocks
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
from ministark_tpu.parallel import make_mesh
from ministark_tpu.stark import StarkConfig
from ministark_tpu.stark.engine import DeviceEngine


def _assert_equal_proofs_device(a, b):
    assert a.arthur == b.arthur
    assert a.trace_commit == b.trace_commit
    assert a.constrain_trace_commit == b.constrain_trace_commit
    assert a.constrain_queries == b.constrain_queries
    assert a.validity_queries == b.validity_queries
    fa, fb = a.fri_proof.to_host(), b.fri_proof.to_host()
    assert fa.points == fb.points
    assert fa.quotients == fb.quotients
    for ra, rb in zip(fa.queries, fb.queries):
        for (a1, a2), (b1, b2) in zip(ra, rb):
            assert a1.leaf_neighbours == b1.leaf_neighbours
            assert a1.path == b1.path
            assert a2.leaf_neighbours == b2.leaf_neighbours
            assert a2.path == b2.path


def _prove(sf, steps, mesh=None):
    dtrace = fibonacci_device_trace(sf, steps)
    cfg = StarkConfig(sf, 20, 2, steps, dtrace.constrain_number())
    return DeviceEngine(cfg, mesh=mesh).prove(dtrace)


import pytest


@pytest.mark.slow
def test_sharded_prove_byte_equal_16k_rows():
    """2^14-row trace: sharded NTT/LDE + distributed FRI fold/divide/deep
    over 8 devices vs the single-chip engine — every proof byte equal."""
    sf = Goldilocks
    steps = (1 << 14) - 1
    single = _prove(sf, steps)
    sharded = _prove(sf, steps, mesh=make_mesh(8))
    _assert_equal_proofs_device(single, sharded)


@pytest.mark.slow
def test_sharded_prove_byte_equal_device_hash(monkeypatch):
    """Sharded prove with on-device sharded Merkle builds (leaf hashing +
    subtree levels per shard) — still byte-identical."""
    import ministark_tpu.stark.engine as eng

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 256)
    sf = Goldilocks
    steps = (1 << 10) - 1
    single = _prove(sf, steps)
    monkeypatch.setenv("MINISTARK_DEVICE_HASH", "1")
    sharded = _prove(sf, steps, mesh=make_mesh(8))
    _assert_equal_proofs_device(single, sharded)


@pytest.mark.slow
def test_sharded_lde_large():
    """2^20-coefficient sharded LDE matches the single-device kernel (the
    round-1 scalability fix: device-built step-2 twiddles, no host bigint
    work at scale)."""
    import jax.numpy as jnp

    from ministark_tpu.fields import GOLDILOCKS_FP
    from ministark_tpu.ops import gl
    from ministark_tpu.ops.ntt_device import get_ntt_fns
    from ministark_tpu.parallel import sharded_lde

    F = GOLDILOCKS_FP
    n = 1 << 20
    rng = np.random.default_rng(7)
    vals = rng.integers(0, F.p, size=n // 2, dtype=np.uint64)
    packed = np.zeros((n // 2, 2), dtype=np.uint32)
    packed[:, 0] = vals & 0xFFFFFFFF
    packed[:, 1] = vals >> 32
    x = jnp.asarray(packed)[None]

    mesh = make_mesh(8)
    out = np.asarray(sharded_lde(F, x, n, mesh))
    fft, _, _, _ = get_ntt_fns(F, n)
    pad = jnp.zeros((1, n // 2, 2), dtype=jnp.uint32)
    ref = np.asarray(fft(jnp.concatenate([x, pad], axis=1)))
    assert np.array_equal(out, ref)
