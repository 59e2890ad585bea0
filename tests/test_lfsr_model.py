"""Width-8 LFSR AIR family: host roundtrip, engine/host byte equality,
fast-mode roundtrip — the prover surfaces at 16-way leaf groups."""

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models.lfsr import LfsrClaim, lfsr_device_trace
from ministark_tpu.stark import (
    FastStark,
    FastStarkConfig,
    Stark,
    StarkConfig,
)
from ministark_tpu.stark.engine import DeviceEngine


@pytest.mark.parametrize("sf,steps", [(Goldilocks, 25), (BabyBear, 13)])
def test_lfsr_host_roundtrip(sf, steps):
    claim = LfsrClaim(field=sf.base, steps=steps)
    trace = claim.trace(None)
    assert trace.constrain_number() == 16
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    stark = Stark(cfg)
    proof = stark.prove(claim, None)
    assert stark.verify(trace.derive_constrains(), proof)


def test_lfsr_device_matches_host():
    sf = Goldilocks
    steps = 25
    claim = LfsrClaim(field=sf.base, steps=steps)
    trace = claim.trace(None)
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    host_proof = Stark(cfg).prove(claim, None)
    dev_proof = DeviceEngine(cfg).prove(lfsr_device_trace(sf, steps))
    assert dev_proof.arthur == host_proof.arthur
    assert dev_proof.trace_commit == host_proof.trace_commit
    assert dev_proof.constrain_trace_commit == host_proof.constrain_trace_commit
    assert dev_proof.validity_queries == host_proof.validity_queries


def test_lfsr_fast_mode():
    sf = Goldilocks
    steps = 100
    stark = FastStark(FastStarkConfig(sf, steps, queries=8, final_len=8))
    trace = lfsr_device_trace(sf, steps)
    proof = stark.prove(trace)
    assert proof.width == 8 and proof.transitions == 8
    assert stark.verify(np.asarray(stark._constraint_polys(trace)), proof)
