"""Edge-case coverage: transcript misuse, Merkle errors, config bounds,
engine verify on BabyBear, zero-polynomial FRI paths."""

import numpy as np
import pytest

from ministark_tpu.commit import MerkleRoot, MerkleTree, MerkleTreeConfig
from ministark_tpu.fields import BABYBEAR_FP, BabyBear, GOLDILOCKS_FP, Goldilocks
from ministark_tpu.transcript import Arthur, IOPattern, Merlin
from ministark_tpu.utils import LeafNotFound, TranscriptError


def test_merkle_leaf_not_found():
    tree = MerkleTree(GOLDILOCKS_FP, list(range(8)), MerkleTreeConfig(2, 2))
    with pytest.raises(LeafNotFound):
        tree.generate_proof(999)


def test_merkle_check_proof_rejects_forged_leaf():
    tree = MerkleTree(GOLDILOCKS_FP, list(range(8)), MerkleTreeConfig(2, 2))
    proof = tree.generate_proof(3)
    proof.leaf_neighbours[0] = 777  # forge a neighbour
    assert not MerkleRoot(tree.root()).check_proof(GOLDILOCKS_FP, proof)


def test_merkle_check_proof_rejects_wrong_root():
    tree = MerkleTree(GOLDILOCKS_FP, list(range(8)), MerkleTreeConfig(2, 2))
    proof = tree.generate_proof(3)
    assert not MerkleRoot(b"\x00" * 32).check_proof(GOLDILOCKS_FP, proof)


def test_arthur_rejects_short_transcript():
    io = IOPattern("t").add_bytes(8, "x")
    a = Arthur(io, b"\x01\x02")
    with pytest.raises(TranscriptError):
        a.fill_next_units(8)


def test_merlin_wrong_op_order():
    io = IOPattern("t").add_bytes(4, "x").challenge_bytes(4, "c")
    m = Merlin(io)
    with pytest.raises(TranscriptError):
        m.fill_challenge_bytes(4)  # absorb declared first


def test_transcript_exhausted():
    io = IOPattern("t").add_bytes(4, "x")
    m = Merlin(io)
    m.add_bytes(b"abcd")
    with pytest.raises(TranscriptError):
        m.add_bytes(b"more")


def test_non_canonical_scalar_rejected():
    with pytest.raises(AssertionError):
        GOLDILOCKS_FP.deserialize_compressed(b"\xff" * 8)  # >= p


def test_engine_verify_babybear(monkeypatch):
    import jax.numpy as jnp

    import ministark_tpu.stark.engine as eng
    from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
    from ministark_tpu.stark import StarkConfig
    from ministark_tpu.stark.engine import DeviceEngine

    monkeypatch.setattr(eng, "DEVICE_MIN_SIZE", 8)
    steps = 13
    dtrace = fibonacci_device_trace(BabyBear, steps)
    cfg = StarkConfig(BabyBear, 20, 2, steps, dtrace.constrain_number())
    engine = DeviceEngine(cfg)
    proof = engine.prove(dtrace)
    tp = engine._trace_polys(dtrace)
    trans = [f(tp) for f in dtrace.transitions]
    all_coeffs = jnp.concatenate([tp] + [t[None] for t in trans], axis=0)
    assert engine.verify(all_coeffs, proof)


def test_trace_table_bounds():
    from ministark_tpu.air import TraceTable

    t = TraceTable(GOLDILOCKS_FP, 4, 2)
    with pytest.raises(AssertionError):
        t.add_row(4, [1, 2])          # index >= steps
    with pytest.raises(AssertionError):
        t.add_row(0, [1, 2, 3])       # wrong width
    with pytest.raises(AssertionError):
        t.add_boundary_constrain(9, 0)


def test_domain_too_large_for_two_adicity():
    from ministark_tpu.poly import Radix2EvaluationDomain

    with pytest.raises(AssertionError):
        Radix2EvaluationDomain(BABYBEAR_FP, 1 << 28)  # 2-adicity 27
