"""Golden proof fixtures: the complete serialized proofs for the two e2e
configurations are pinned, so ANY change to protocol-visible behavior
(transcript bytes, RNG stream, hashing, query math, serialization) across
rounds is caught immediately. Regenerate deliberately with
scripts/regen_golden.py only when a change is *intended* and documented in
PARITY.md."""

import json
import os

import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models import fibonacci_air
from ministark_tpu.stark import Stark, StarkConfig
from ministark_tpu.stark.proof_io import proof_from_json, proof_to_json

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = [
    (Goldilocks, 9, "goldilocks_fib9"),
    (BabyBear, 7, "babybear_fib7"),
]


@pytest.mark.parametrize("sf,steps,name", CASES)
def test_proof_matches_golden(sf, steps, name):
    claim, witness = fibonacci_air(sf, steps)
    trace = claim.trace(witness)
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    proof = Stark(cfg).prove(claim, witness)
    blob = proof_to_json(sf, proof)
    golden = open(os.path.join(GOLDEN_DIR, f"{name}.json")).read()
    assert json.loads(blob) == json.loads(golden), (
        "proof diverged from the pinned golden fixture — protocol-visible "
        "behavior changed (see tests/test_golden_proofs.py docstring)"
    )


@pytest.mark.parametrize("sf,steps,name", CASES)
def test_golden_proof_verifies(sf, steps, name):
    golden = open(os.path.join(GOLDEN_DIR, f"{name}.json")).read()
    proof = proof_from_json(sf, golden)
    claim, witness = fibonacci_air(sf, steps)
    trace = claim.trace(witness)
    constrains = trace.derive_constrains()
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    assert Stark(cfg).verify(constrains, proof)


@pytest.mark.parametrize("backend", ["fri", "stir", "whir"])
def test_fast_proof_matches_golden(backend):
    """FAST-mode golden fixtures: the complete serialized FastStark proof
    per LDE backend is pinned — catches any drift in the FastTranscript
    byte schedule, index-tree digests, query schedules, or the binary
    serialization (format MSF4)."""
    import numpy as np

    from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
    from ministark_tpu.stark.fast import FastStark, FastStarkConfig
    from ministark_tpu.stark.proof_io import (
        fast_proof_from_bytes,
        fast_proof_to_bytes,
    )

    sf = Goldilocks
    trace = fibonacci_device_trace(sf, 100)
    stark = FastStark(FastStarkConfig(sf, 100, queries=4, final_len=8,
                                      lde_backend=backend))
    blob = fast_proof_to_bytes(sf, stark.prove(trace))
    golden = open(os.path.join(GOLDEN_DIR, f"fast_{backend}_fib100.bin"),
                  "rb").read()
    assert blob == golden, (
        f"fast-mode ({backend}) proof diverged from the pinned fixture — "
        "protocol-visible behavior changed (see module docstring)"
    )
    # the pinned bytes also decode and verify
    back = fast_proof_from_bytes(sf, golden)
    assert stark.verify(np.asarray(stark._constraint_polys(trace)), back)
