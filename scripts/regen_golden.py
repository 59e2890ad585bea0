#!/usr/bin/env python3
"""Regenerate the golden proof fixtures (tests/golden/). Only run this when a
protocol-visible change is INTENDED; document why in PARITY.md."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models import fibonacci_air
from ministark_tpu.stark import Stark, StarkConfig
from ministark_tpu.stark.proof_io import proof_to_json

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden")

for sf, steps, name in ((Goldilocks, 9, "goldilocks_fib9"), (BabyBear, 7, "babybear_fib7")):
    claim, witness = fibonacci_air(sf, steps)
    trace = claim.trace(witness)
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    proof = Stark(cfg).prove(claim, witness)
    path = os.path.join(GOLDEN, f"{name}.json")
    open(path, "w").write(proof_to_json(sf, proof))
    print("wrote", path)

# FAST-mode fixtures (binary MSF4 blobs), one per LDE backend
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace  # noqa: E402
from ministark_tpu.stark.fast import FastStark, FastStarkConfig  # noqa: E402
from ministark_tpu.stark.proof_io import fast_proof_to_bytes  # noqa: E402

for backend in ("fri", "stir", "whir"):
    trace = fibonacci_device_trace(Goldilocks, 100)
    stark = FastStark(FastStarkConfig(Goldilocks, 100, queries=4, final_len=8,
                                      lde_backend=backend))
    blob = fast_proof_to_bytes(Goldilocks, stark.prove(trace))
    path = os.path.join(GOLDEN, f"fast_{backend}_fib100.bin")
    open(path, "wb").write(blob)
    print("wrote", path)
