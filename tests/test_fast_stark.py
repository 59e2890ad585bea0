"""Fast-mode STARK (stark/fast.py): reference capabilities on the batched
FRI / wide-arity commitment stack. Non-parity surface — gates its own
completeness, soundness probes, and proof-size claims."""

import copy

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.models.counter import counter_device_trace
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
from ministark_tpu.stark.fast import FastStark, FastStarkConfig


def _constrains(stark, trace):
    return np.asarray(stark._constraint_polys(trace))


@pytest.mark.parametrize("sf,steps,arity", [
    (Goldilocks, 100, 4), (Goldilocks, 63, 8), (BabyBear, 77, 4),
])
def test_fast_stark_roundtrip(sf, steps, arity):
    trace = fibonacci_device_trace(sf, steps)
    stark = FastStark(FastStarkConfig(
        sf, steps, queries=8, point_queries=2, arity=arity, final_len=8,
    ))
    proof = stark.prove(trace)
    assert stark.verify(_constrains(stark, trace), proof)
    # sane proof size: KBs, not the parity format's full quotient vectors
    assert proof.size_bytes() < 200_000


def test_fast_stark_counter_model():
    sf = Goldilocks
    steps = 200
    trace = counter_device_trace(sf, steps)
    stark = FastStark(FastStarkConfig(sf, steps, queries=8, final_len=8))
    proof = stark.prove(trace)
    assert stark.verify(_constrains(stark, trace), proof)


def test_fast_stark_rejects_wrong_witness():
    """Constrains from a different witness must fail the point checks."""
    sf = Goldilocks
    steps = 60
    stark = FastStark(FastStarkConfig(sf, steps, queries=8, final_len=8))
    proof = stark.prove(fibonacci_device_trace(sf, steps))
    other = fibonacci_device_trace(sf, steps, secret_b=99)
    with pytest.raises(AssertionError):
        stark.verify(_constrains(stark, other), proof)


def test_fast_stark_rejects_tampered_evals_and_rows():
    sf = Goldilocks
    steps = 60
    ext = sf.extension
    stark = FastStark(FastStarkConfig(sf, steps, queries=8, final_len=8))
    trace = fibonacci_device_trace(sf, steps)
    proof = stark.prove(trace)
    cons = _constrains(stark, trace)

    bad = copy.deepcopy(proof)
    bad.point_evals[0][0] = ext.add(bad.point_evals[0][0], ext.one())
    with pytest.raises(AssertionError):
        stark.verify(cons, bad)

    # corrupt an opened batch row: Merkle path must fail
    bad = copy.deepcopy(proof)
    row = bytearray(bad.fri_proof.batch_openings[0].row)
    row[3] ^= 0x10
    bad.fri_proof.batch_openings[0].row = bytes(row)
    with pytest.raises(AssertionError):
        stark.verify(cons, bad)


def test_fast_proof_serialization_roundtrip():
    from ministark_tpu.stark.proof_io import (
        fast_proof_from_bytes,
        fast_proof_to_bytes,
    )

    for sf in (Goldilocks, BabyBear):
        steps = 50
        trace = fibonacci_device_trace(sf, steps)
        stark = FastStark(FastStarkConfig(sf, steps, queries=4, final_len=8))
        proof = stark.prove(trace)
        blob = fast_proof_to_bytes(sf, proof)
        back = fast_proof_from_bytes(sf, blob)
        assert stark.verify(_constrains(stark, trace), back)
        assert fast_proof_to_bytes(sf, back) == blob
        assert len(blob) <= proof.size_bytes() * 1.2  # framing overhead bound


def test_fast_stark_sharded_byte_identical():
    """FastStark over an 8-device mesh produces byte-identical proofs to the
    single-device path (BASELINE config 5 analogue for the fast stack)."""
    from jax.sharding import Mesh
    import jax

    from ministark_tpu.stark.proof_io import fast_proof_to_bytes

    sf = Goldilocks
    steps = (1 << 12) - 1
    trace = fibonacci_device_trace(sf, steps)
    cfg = FastStarkConfig(sf, steps, queries=8, final_len=8)

    single = FastStark(cfg).prove(trace)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    sharded = FastStark(cfg, mesh=mesh).prove(trace)
    assert fast_proof_to_bytes(sf, sharded) == fast_proof_to_bytes(sf, single)


def test_fast_proof_random_tamper_sweep():
    """Any single-byte corruption of a serialized fast proof must be
    rejected (decode error or verification failure) — never accepted."""
    import random

    from ministark_tpu.stark.proof_io import (
        fast_proof_from_bytes,
        fast_proof_to_bytes,
    )

    sf = Goldilocks
    steps = 60
    trace = fibonacci_device_trace(sf, steps)
    stark = FastStark(FastStarkConfig(sf, steps, queries=4, final_len=8))
    cons = _constrains(stark, trace)
    blob = bytearray(fast_proof_to_bytes(sf, stark.prove(trace)))

    rng = random.Random(1234)
    for _ in range(24):
        pos = rng.randrange(4, len(blob))   # skip magic (decode-only reject)
        old = blob[pos]
        blob[pos] ^= 1 << rng.randrange(8)
        try:
            bad = fast_proof_from_bytes(sf, bytes(blob))
            accepted = False
            try:
                accepted = stark.verify(cons, bad)
            except (AssertionError, ValueError, IndexError, OverflowError):
                pass
            assert not accepted, f"tampered byte {pos} accepted"
        except (AssertionError, ValueError, IndexError, OverflowError):
            pass  # decode rejected it — fine
        blob[pos] = old
