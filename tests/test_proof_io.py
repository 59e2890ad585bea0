"""Proof serialization round-trips and still verifies."""

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models import FibonacciClaim, Witness
from ministark_tpu.stark import Stark, StarkConfig
from ministark_tpu.stark.proof_io import proof_from_json, proof_to_json

import pytest


@pytest.mark.parametrize("sf,steps", [(Goldilocks, 9), (BabyBear, 7)])
def test_proof_json_roundtrip(sf, steps):
    base = sf.base
    claim = FibonacciClaim(field=base, step=steps, output=base.from_int(13))
    witness = Witness(secret_b=base.from_int(2))
    trace = claim.trace(witness)
    constrains = trace.derive_constrains()
    cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
    stark = Stark(cfg)
    proof = stark.prove(claim, witness)

    blob = proof_to_json(sf, proof)
    restored = proof_from_json(sf, blob)
    assert restored.arthur == proof.arthur
    assert restored.trace_commit == proof.trace_commit
    assert restored.constrain_queries == proof.constrain_queries
    assert restored.fri_proof.points == proof.fri_proof.points
    assert restored.fri_proof.quotients == proof.fri_proof.quotients
    assert stark.verify(constrains, restored)


def test_proof_json_field_mismatch():
    base = Goldilocks.base
    claim = FibonacciClaim(field=base, step=9, output=base.from_int(13))
    witness = Witness(secret_b=base.from_int(2))
    cfg = StarkConfig(Goldilocks, 20, 2, 9, 6)
    proof = Stark(cfg).prove(claim, witness)
    blob = proof_to_json(Goldilocks, proof)
    with pytest.raises(AssertionError, match="field mismatch"):
        proof_from_json(BabyBear, blob)
