"""Device engine must produce byte-identical proofs to the host prover."""

import numpy as np

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models import FibonacciClaim, Witness
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
from ministark_tpu.stark import Stark, StarkConfig, StarkProof
from ministark_tpu.stark.engine import DeviceEngine


def _host_proof(sf, steps):
    base = sf.base
    witness = Witness(secret_b=base.from_int(2))
    claim = FibonacciClaim(field=base, step=steps, output=base.from_int(13))
    trace = claim.trace(witness)
    constrains = trace.derive_constrains()
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    stark = Stark(cfg)
    return stark, constrains, stark.prove(claim, witness)


def _device_proof(sf, steps):
    dtrace = fibonacci_device_trace(sf, steps)
    cfg = StarkConfig(sf, 20, 2, steps, dtrace.constrain_number())
    engine = DeviceEngine(cfg)
    return engine.prove(dtrace)


def _assert_equal_proofs(host: StarkProof, dev: StarkProof):
    assert dev.trace_commit == host.trace_commit
    assert dev.constrain_trace_commit == host.constrain_trace_commit
    assert dev.arthur == host.arthur
    assert dev.constrain_queries == host.constrain_queries
    assert dev.validity_queries == host.validity_queries
    dev_fri = dev.fri_proof.to_host()
    assert dev_fri.points == host.fri_proof.points
    for r_dev, r_host in zip(dev_fri.quotients, host.fri_proof.quotients):
        assert r_dev == r_host
    for r_dev, r_host in zip(dev_fri.queries, host.fri_proof.queries):
        for (d1, d2), (h1, h2) in zip(r_dev, r_host):
            assert d1.leaf_neighbours == h1.leaf_neighbours
            assert d1.path == h1.path
            assert d2.leaf_neighbours == h2.leaf_neighbours
            assert d2.path == h2.path


def test_engine_matches_host_goldilocks(monkeypatch):
    # force the device FRI path even at tiny sizes
    import ministark_tpu.stark.engine as eng

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 1)
    sf = Goldilocks
    stark, constrains, host = _host_proof(sf, 9)
    dev = _device_proof(sf, 9)
    _assert_equal_proofs(host, dev)
    # device proof (host format) verifies under the host verifier
    host_format = StarkProof(
        arthur=dev.arthur,
        trace_commit=dev.trace_commit,
        constrain_trace_commit=dev.constrain_trace_commit,
        constrain_queries=dev.constrain_queries,
        validity_queries=dev.validity_queries,
        fri_proof=dev.fri_proof.to_host(),
    )
    assert stark.verify(constrains, host_format)


def test_engine_matches_host_babybear():
    sf = BabyBear
    _, _, host = _host_proof(sf, 7)
    dev = _device_proof(sf, 7)
    _assert_equal_proofs(host, dev)


def test_engine_matches_host_babybear_device_path(monkeypatch):
    import ministark_tpu.stark.engine as eng

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 8)
    sf = BabyBear
    _, _, host = _host_proof(sf, 45)
    dev = _device_proof(sf, 45)
    _assert_equal_proofs(host, dev)


def test_engine_matches_host_larger_trace(monkeypatch):
    """Crosses the device->host FRI tail boundary (DEVICE_MIN_SIZE=32)."""
    import ministark_tpu.stark.engine as eng

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 32)
    sf = Goldilocks
    stark, constrains, host = _host_proof(sf, 61)
    dev = _device_proof(sf, 61)
    _assert_equal_proofs(host, dev)


def test_engine_device_hash_identical(monkeypatch):
    """MINISTARK_DEVICE_HASH=1 (on-device SHA-256 Merkle) must not change a
    single proof byte."""
    import ministark_tpu.stark.engine as eng

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 8)
    ref = _device_proof(Goldilocks, 61)
    monkeypatch.setenv("MINISTARK_DEVICE_HASH", "1")
    dev = _device_proof(Goldilocks, 61)
    _assert_equal_proofs_device(ref, dev)


def _assert_equal_proofs_device(a, b):
    assert a.arthur == b.arthur
    assert a.trace_commit == b.trace_commit
    assert a.constrain_trace_commit == b.constrain_trace_commit
    fa, fb = a.fri_proof.to_host(), b.fri_proof.to_host()
    assert fa.points == fb.points
    for ra, rb in zip(fa.queries, fb.queries):
        for (a1, a2), (b1, b2) in zip(ra, rb):
            assert a1.path == b1.path and a2.path == b2.path


def test_engine_device_verify(monkeypatch):
    import jax.numpy as jnp
    import ministark_tpu.stark.engine as eng
    from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
    from ministark_tpu.stark.engine import DeviceEngine
    from ministark_tpu.stark import StarkConfig

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 32)
    sf = Goldilocks
    steps = 61
    dtrace = fibonacci_device_trace(sf, steps)
    cfg = StarkConfig(sf, 20, 2, steps, dtrace.constrain_number())
    engine = DeviceEngine(cfg)
    proof = engine.prove(dtrace)

    # out-of-band constrains = trace polys ++ transition outputs
    tp = engine._trace_polys(dtrace)
    trans = [f(tp) for f in dtrace.transitions]
    all_coeffs = jnp.concatenate([tp] + [t[None] for t in trans], axis=0)
    assert engine.verify(all_coeffs, proof)

    # tampered proof must fail
    bad = StarkProof(
        arthur=bytes([proof.arthur[0] ^ 1]) + proof.arthur[1:],
        trace_commit=proof.trace_commit,
        constrain_trace_commit=proof.constrain_trace_commit,
        constrain_queries=proof.constrain_queries,
        validity_queries=proof.validity_queries,
        fri_proof=proof.fri_proof,
    )
    try:
        engine.verify(all_coeffs, bad)
        assert False, "tampered proof accepted"
    except AssertionError as e:
        if "tampered" in str(e):
            raise


def test_on_device_witness_generation(monkeypatch):
    """Fully on-device trace generation must be bit-identical to the host
    path, and the resulting proof byte-equal."""
    import numpy as np
    import ministark_tpu.stark.engine as eng
    from ministark_tpu.models.fibonacci_device import (
        fibonacci_device_trace,
        fibonacci_trace_cols_on_device,
    )
    from ministark_tpu.ops.registry import get_kernels

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 8)
    for sf, steps in ((Goldilocks, 61), (BabyBear, 13)):
        kb = get_kernels(sf.base)
        host_trace = fibonacci_device_trace(sf, steps)
        dev_cols = np.asarray(fibonacci_trace_cols_on_device(sf, steps))
        host_packed = kb.pack(host_trace.cols.reshape(-1)).reshape(dev_cols.shape)
        assert np.array_equal(dev_cols, host_packed)

    sf = Goldilocks
    steps = 61
    from ministark_tpu.stark import StarkConfig
    from ministark_tpu.stark.engine import DeviceEngine

    cfg = StarkConfig(sf, 20, 2, steps, 6)
    ref = DeviceEngine(cfg).prove(fibonacci_device_trace(sf, steps))
    dev = DeviceEngine(cfg).prove(fibonacci_device_trace(sf, steps, on_device=True))
    assert dev.arthur == ref.arthur
    assert dev.trace_commit == ref.trace_commit
