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


@pytest.mark.parametrize("sf,steps", [(Goldilocks, 100), (BabyBear, 77)])
def test_fast_stark_stir_backend(sf, steps):
    """The same STARK over the STIR LDT (fri/stir.py): completeness, row
    tampering, wrong witness."""
    trace = fibonacci_device_trace(sf, steps)
    stark = FastStark(FastStarkConfig(
        sf, steps, queries=8, point_queries=2, final_len=8,
        lde_backend="stir",
    ))
    proof = stark.prove(trace)
    cons = _constrains(stark, trace)
    assert stark.verify(cons, proof)
    assert proof.size_bytes() < 200_000

    bad = copy.deepcopy(proof)
    row = bytearray(bad.fri_proof.batch_openings[0][0].row)
    row[3] ^= 0x10
    bad.fri_proof.batch_openings[0][0].row = bytes(row)
    with pytest.raises(AssertionError):
        stark.verify(cons, bad)

    if sf is Goldilocks:
        other = fibonacci_device_trace(sf, steps, secret_b=99)
        with pytest.raises(AssertionError):
            stark.verify(_constrains(stark, other), proof)


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
    row = bytearray(bad.fri_proof.batch_openings[0][0].row)
    row[3] ^= 0x10
    bad.fri_proof.batch_openings[0][0].row = bytes(row)
    with pytest.raises(AssertionError):
        stark.verify(cons, bad)


@pytest.mark.slow
def test_fast_proof_serialization_roundtrip():
    from ministark_tpu.stark.proof_io import (
        fast_proof_from_bytes,
        fast_proof_to_bytes,
    )

    for sf in (Goldilocks, BabyBear):
        for backend in ("fri", "stir"):
            steps = 50
            trace = fibonacci_device_trace(sf, steps)
            stark = FastStark(FastStarkConfig(
                sf, steps, queries=4, final_len=8, lde_backend=backend,
            ))
            proof = stark.prove(trace)
            blob = fast_proof_to_bytes(sf, proof)
            back = fast_proof_from_bytes(sf, blob)
            assert stark.verify(_constrains(stark, trace), back)
            assert fast_proof_to_bytes(sf, back) == blob
            assert len(blob) <= proof.size_bytes() * 1.2 + 64  # framing bound


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_fast_stark_rejects_unbound_commitment_forgery():
    """The code-review forgery: ship honest point evaluations of the REAL
    constraint polynomials but commit a DIFFERENT low-degree batch (with
    validity := sum r^i f_i so the row relation holds by construction).
    The verifier's own-LDE row binding must reject it."""
    import jax.numpy as jnp

    from ministark_tpu.fri.batched import _scalar_bytes
    from ministark_tpu.ops.poly_device import mix_columns_jit
    from ministark_tpu.ops.registry import lift_base_array
    from ministark_tpu.stark.engine import _eval_many_jit

    sf = Goldilocks
    steps = 60
    stark = FastStark(FastStarkConfig(sf, steps, queries=4, final_len=8))
    ext, ke = stark.ext, stark.ke

    real = stark._constraint_polys(fibonacci_device_trace(sf, steps))
    fake = stark._constraint_polys(fibonacci_device_trace(sf, steps, secret_b=42))
    total, n = int(real.shape[0]), int(real.shape[1])

    # forger's prove: transcript fed with the FAKE commitment, point evals
    # computed from the REAL polynomials (what the verifier will check)
    tr = stark._transcript(3, total - 3, n)
    real_ext = lift_base_array(ke, jnp.asarray(real))
    fake_ext = lift_base_array(ke, jnp.asarray(fake))
    tree_w = stark.fri.commit(fake_ext)
    tr.absorb(tree_w.root())
    r = tr.challenge_scalar(ext)
    weights = jnp.asarray(ke.pack([ext.pow(r, i) for i in range(total)]))
    validity = mix_columns_jit(ke, fake_ext, weights)[None]
    point_evals = []
    for _ in range(stark.config.point_queries):
        z = tr.challenge_scalar(ext)
        import numpy as _np
        ev = _np.asarray(_eval_many_jit(ke, real_ext, jnp.asarray(ke.pack_scalar(z))))
        evals = [ke.unpack(ev[i:i + 1])[0] for i in range(total)]
        tr.absorb(b"".join(_scalar_bytes(ext, e) for e in evals))
        point_evals.append(evals)
    tree_v = stark.fri.commit(validity)
    tr.absorb(tree_v.root())
    fri_proof = stark.fri.prove(
        groups=[fake_ext, validity], trees=[tree_w, tree_v], transcript=tr)

    from ministark_tpu.stark.fast import FastStarkProof

    forged = FastStarkProof(width=3, transitions=total - 3,
                            point_evals=point_evals, fri_proof=fri_proof)
    with pytest.raises(AssertionError, match="committed row mismatch"):
        stark.verify(real, forged)


@pytest.mark.parametrize("backend", ["fri", "stir", "whir"])
def test_fast_stark_prove_many(backend):
    """Batched multi-trace proving: B same-shape traces in one proof; every
    commitment and the LDT amortize across the batch."""
    sf = Goldilocks
    steps = 60
    traces = [fibonacci_device_trace(sf, steps, secret_b=b) for b in (2, 5, 9)]
    stark = FastStark(FastStarkConfig(
        sf, steps, queries=8, point_queries=1, final_len=8,
        lde_backend=backend,
    ))
    proof = stark.prove_many(traces)
    assert proof.n_traces == 3
    cons = [_constrains(stark, t) for t in traces]
    assert stark.verify_many(cons, proof)

    # one wrong trace's constrains -> rejected
    bad_cons = list(cons)
    bad_cons[1] = _constrains(stark, fibonacci_device_trace(sf, steps,
                                                            secret_b=77))
    with pytest.raises(AssertionError):
        stark.verify_many(bad_cons, proof)

    # serialization roundtrip keeps the batch
    from ministark_tpu.stark.proof_io import (
        fast_proof_from_bytes,
        fast_proof_to_bytes,
    )
    blob = fast_proof_to_bytes(sf, proof)
    back = fast_proof_from_bytes(sf, blob)
    assert back.n_traces == 3
    assert stark.verify_many(cons, back)

    # batching 3 traces costs much less than 3x one trace's proof bytes
    single = stark.prove(traces[0])
    assert len(blob) < 2.2 * len(fast_proof_to_bytes(sf, single))
