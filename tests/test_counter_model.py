"""Counter AIR: host e2e on both fields + host/device proof equivalence."""

import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models.counter import CounterClaim, counter_device_trace
from ministark_tpu.stark import Stark, StarkConfig
from ministark_tpu.stark.engine import DeviceEngine


@pytest.mark.parametrize("sf,steps", [(Goldilocks, 11), (BabyBear, 6)])
def test_counter_e2e(sf, steps):
    claim = CounterClaim(field=sf.base, steps=steps)
    trace = claim.trace(None)
    constrains = trace.derive_constrains()
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    stark = Stark(cfg)
    proof = stark.prove(claim, None)
    assert stark.verify(constrains, proof)


def test_counter_device_matches_host(monkeypatch):
    import ministark_tpu.stark.engine as eng

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 8)
    sf = Goldilocks
    steps = 21
    claim = CounterClaim(field=sf.base, steps=steps)
    trace = claim.trace(None)
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    host_proof = Stark(cfg).prove(claim, None)

    dtrace = counter_device_trace(sf, steps)
    dev_proof = DeviceEngine(cfg).prove(dtrace)
    assert dev_proof.arthur == host_proof.arthur
    assert dev_proof.trace_commit == host_proof.trace_commit
    assert dev_proof.constrain_trace_commit == host_proof.constrain_trace_commit
    assert dev_proof.validity_queries == host_proof.validity_queries


def test_counter_on_device_witness_matches():
    """Closed-form on-device witness gen == host-loop columns, both fields."""
    import numpy as np

    from ministark_tpu.ops.registry import get_kernels

    for sf, steps in ((Goldilocks, 21), (BabyBear, 13)):
        kb = get_kernels(sf.base)
        host = counter_device_trace(sf, steps)
        dev = counter_device_trace(sf, steps, on_device=True)
        packed_host = kb.pack(host.cols.reshape(-1)).reshape(
            np.asarray(dev.cols_dev).shape)
        assert np.array_equal(np.asarray(dev.cols_dev), packed_host)


@pytest.mark.slow
def test_counter_device_matches_host_2e16():
    # ~5 min on the CPU backend (second AIR engine/host equivalence at 2^16)
    sf = Goldilocks
    steps = (1 << 16) - 1
    claim = CounterClaim(field=sf.base, steps=steps)
    trace = claim.trace(None)
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    host_proof = Stark(cfg).prove(claim, None)
    dev_proof = DeviceEngine(cfg).prove(counter_device_trace(sf, steps))
    assert dev_proof.arthur == host_proof.arthur
    assert dev_proof.validity_queries == host_proof.validity_queries
