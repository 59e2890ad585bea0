"""Batched multi-polynomial FRI (fast mode, fri/batched.py).

Not a parity surface — the reference has no batched FRI (its README lists
batching-adjacent work as unchecked roadmap items). These tests gate the
fast mode's own soundness/completeness claims.
"""

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.fri.batched import BatchedFri, BatchedFriConfig
from ministark_tpu.ops.registry import get_kernels
from ministark_tpu.utils.rng import ark_test_rng


def _rand_polys(ext, b, n, seed=0):
    rng = ark_test_rng()
    ke = get_kernels(ext)
    vals = [ext.rand(rng) for _ in range(b * n)]
    return np.asarray(ke.pack(vals)).reshape((b, n) + ke.elem_axes)


@pytest.mark.parametrize("sf,arity,ff", [
    (Goldilocks, 2, 2), (Goldilocks, 4, 4), (Goldilocks, 8, 4),
    pytest.param(Goldilocks, 4, 8, marks=pytest.mark.slow),
    (BabyBear, 4, 4),
])
def test_batched_fri_roundtrip(sf, arity, ff):
    ext = sf.extension
    cfg = BatchedFriConfig(ext, blowup=2, queries=8, arity=arity,
                           fold_factor=ff, final_len=8)
    fri = BatchedFri(cfg)
    polys = _rand_polys(ext, b=3, n=512)
    proof = fri.prove(polys)
    assert fri.verify(proof)
    # proof shape sanity
    assert len(proof.layer_roots) == fri._n_folds(512) - 1
    assert len(proof.final_coeffs) == 512 // ff ** fri._n_folds(512)
    assert len(proof.batch_openings) == 8


def test_batched_fri_rejects_tampering():
    ext = Goldilocks.extension
    cfg = BatchedFriConfig(ext, blowup=2, queries=4, arity=4, final_len=8)
    fri = BatchedFri(cfg)
    proof = fri.prove(_rand_polys(ext, b=2, n=128))

    import copy

    # flip a bit in an opened batch row -> leaf digest mismatch
    bad = copy.deepcopy(proof)
    row = bytearray(bad.batch_openings[0][0].row)
    row[0] ^= 1
    bad.batch_openings[0][0].row = bytes(row)
    with pytest.raises(AssertionError):
        fri.verify(bad)

    # flip a sibling digest -> path mismatch
    bad = copy.deepcopy(proof)
    g = bytearray(bad.batch_openings[1][0].groups[1])
    g[5] ^= 0xFF
    bad.batch_openings[1][0].groups[1] = bytes(g)
    with pytest.raises(AssertionError):
        fri.verify(bad)

    # tamper a final coefficient -> fold chain breaks
    bad = copy.deepcopy(proof)
    bad.final_coeffs = list(bad.final_coeffs)
    bad.final_coeffs[0] = ext.add(bad.final_coeffs[0], ext.one())
    with pytest.raises(AssertionError):
        fri.verify(bad)

    # swap a layer root -> transcript diverges and paths fail
    if proof.layer_roots:
        bad = copy.deepcopy(proof)
        bad.layer_roots = list(bad.layer_roots)
        bad.layer_roots[0] = bytes(32)
        with pytest.raises(AssertionError):
            fri.verify(bad)


def test_batched_fri_rejects_wrong_degree():
    """A 'polynomial' that is actually high-degree noise on the LDE domain
    must fail the fold consistency checks."""
    ext = Goldilocks.extension
    cfg = BatchedFriConfig(ext, blowup=2, queries=16, arity=4, final_len=8)
    fri = BatchedFri(cfg)
    polys = _rand_polys(ext, b=2, n=128)
    proof = fri.prove(polys)

    # graft openings from a DIFFERENT proof into this one: values no longer
    # lie on a low-degree codeword consistent with the final coefficients
    other = fri.prove(_rand_polys(ext, b=2, n=128, seed=1) * 0 + polys[::-1])
    bad = proof
    bad.batch_openings = other.batch_openings
    with pytest.raises(AssertionError):
        fri.verify(bad)


def test_index_tree_roundtrip():
    import jax.numpy as jnp

    from ministark_tpu.commit.index_tree import IndexMerkleTree

    rng = np.random.default_rng(7)
    for arity in (2, 4, 8):
        comps = jnp.asarray(
            rng.integers(0, 1 << 32, size=(64, 3, 2), dtype=np.uint32)
        )
        t = IndexMerkleTree(comps, arity)
        paths = t.open_many([0, 17, 63])
        for idx, p in zip([0, 17, 63], paths):
            assert IndexMerkleTree.verify_path(t.root(), 64, arity, idx, p)
            assert not IndexMerkleTree.verify_path(
                t.root(), 64, arity, (idx + 1) % 64, p
            )
