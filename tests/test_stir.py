"""STIR low-degree test (fri/stir.py, fast mode).

Not a parity surface — the reference lists STIR as an unchecked roadmap item
(README.md:36-38). These tests gate completeness, tamper rejection, the
low-degree claim itself, and the query/size advantage over the batched FRI.
"""

import copy

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.fri.batched import BatchedFri, BatchedFriConfig
from ministark_tpu.fri.stir import Stir, StirConfig, _newton_interp
from ministark_tpu.ops.registry import get_kernels
from ministark_tpu.utils.rng import ark_test_rng


def _rand_polys(ext, b, n, seed=0):
    rng = ark_test_rng()
    for _ in range(seed):
        ext.rand(rng)
    ke = get_kernels(ext)
    vals = [ext.rand(rng) for _ in range(b * n)]
    return np.asarray(ke.pack(vals)).reshape((b, n) + ke.elem_axes)


def test_newton_interp():
    ext = Goldilocks.extension
    rng = ark_test_rng()
    pts = [(ext.rand(rng), ext.rand(rng)) for _ in range(7)]
    coeffs = _newton_interp(ext, pts)
    assert len(coeffs) == 7
    for x, y in pts:
        acc = ext.zero()
        for c in reversed(coeffs):
            acc = ext.add(ext.mul(acc, x), c)
        assert acc == y


@pytest.mark.parametrize("sf,b,n", [
    pytest.param(Goldilocks, 3, 1 << 12,
                 marks=pytest.mark.slow),   # 3 quotient rounds
    (Goldilocks, 1, 1 << 8),    # single round, single poly
    pytest.param(BabyBear, 2, 1 << 10,
                 marks=pytest.mark.slow),
])
def test_stir_roundtrip(sf, b, n):
    ext = sf.extension
    stir = Stir(StirConfig(ext, k=4, blowup=2, security_bits=16,
                           final_len=16))
    proof = stir.prove(_rand_polys(ext, b=b, n=n))
    assert stir.verify(proof)
    d, N, off, t, R = stir._schedule(n)
    assert len(proof.round_roots) == R
    assert len(proof.group_roots) == 1
    assert len(proof.final_coeffs) <= d[R] // 4


def test_stir_query_schedule_decays():
    """The STIR point: per-round query counts drop geometrically with the
    improving rate (vs a constant count per FRI layer)."""
    ext = Goldilocks.extension
    stir = Stir(StirConfig(ext, k=4, blowup=2, security_bits=32,
                           final_len=16))
    d, N, off, t, R = stir._schedule(1 << 20)
    assert R >= 4
    assert t[0] == 32                     # rate 1/2 -> full lambda
    assert all(t[i + 1] < t[i] for i in range(R - 1))
    assert t[1] == 16 and t[2] == 11      # rates 1/4, 1/8


def test_stir_rejects_tampering():
    ext = Goldilocks.extension
    stir = Stir(StirConfig(ext, k=4, blowup=2, security_bits=16,
                           final_len=16))
    proof = stir.prove(_rand_polys(ext, b=2, n=1 << 10))

    # flip a bit in an opened row -> leaf digest mismatch
    bad = copy.deepcopy(proof)
    row = bytearray(bad.batch_openings[0][0].row)
    row[0] ^= 1
    bad.batch_openings[0][0].row = bytes(row)
    with pytest.raises(AssertionError):
        stir.verify(bad)

    # tamper an out-of-domain answer -> quotient chain breaks downstream
    bad = copy.deepcopy(proof)
    bad.betas = list(bad.betas)
    bad.betas[0] = ext.add(bad.betas[0], ext.one())
    with pytest.raises(AssertionError):
        stir.verify(bad)

    # tamper a final coefficient
    bad = copy.deepcopy(proof)
    bad.final_coeffs = list(bad.final_coeffs)
    bad.final_coeffs[0] = ext.add(bad.final_coeffs[0], ext.one())
    with pytest.raises(AssertionError):
        stir.verify(bad)

    # swap a commitment root -> transcript diverges and paths fail
    bad = copy.deepcopy(proof)
    bad.round_roots = list(bad.round_roots)
    bad.round_roots[0] = bytes(32)
    with pytest.raises(AssertionError):
        stir.verify(bad)


def test_stir_rejects_grafted_openings():
    """Openings consistent with a DIFFERENT committed function must fail:
    the verifier-computed fold values no longer match the quotient chain."""
    ext = Goldilocks.extension
    cfg = StirConfig(ext, k=4, blowup=2, security_bits=16, final_len=16)
    stir = Stir(cfg)
    proof = stir.prove(_rand_polys(ext, b=2, n=1 << 10))
    other = stir.prove(_rand_polys(ext, b=2, n=1 << 10, seed=5))
    bad = copy.deepcopy(proof)
    bad.batch_openings = other.batch_openings
    bad.round_openings = other.round_openings
    with pytest.raises(AssertionError):
        stir.verify(bad)


@pytest.mark.slow
def test_stir_beats_batched_fri_on_proof_size():
    """Same field, same degree bound, comparable security knobs: the STIR
    proof opens geometrically fewer rows than the batched FRI."""
    ext = Goldilocks.extension
    n, b = 1 << 12, 2
    polys = _rand_polys(ext, b=b, n=n)
    stir = Stir(StirConfig(ext, k=4, blowup=2, security_bits=32,
                           final_len=16))
    sp = stir.prove(polys)
    assert stir.verify(sp)
    fri = BatchedFri(BatchedFriConfig(ext, blowup=2, queries=32, arity=4,
                                      fold_factor=4, final_len=16))
    fp = fri.prove(polys)
    assert fri.verify(fp)
    fri_rows = len(fp.batch_openings) * len(fp.batch_openings[0]) + sum(
        len(q) for q in fp.layer_openings
    )
    stir_rows = (len(sp.batch_openings) * len(sp.batch_openings[0])
                 + sum(len(per_round) for per_round in sp.round_openings))
    # at this small n the FRI has only 5 layers; the row advantage still
    # shows (66 vs 128) and widens with depth (see the 2^20 schedule test)
    assert stir_rows < fri_rows * 2 // 3
    fri_size = (
        32 * (len(fp.group_roots) + len(fp.layer_roots))
        + sum(len(p.row) + sum(len(g) for g in p.groups)
              for q in fp.batch_openings for p in q)
        + sum(len(p.row) + sum(len(g) for g in p.groups)
              for q in fp.layer_openings for p in q)
        + 16 * len(fp.final_coeffs)
    )
    assert sp.size_bytes(ext) < fri_size


@pytest.mark.slow
def test_stir_sharded_byte_identical():
    """STIR over an 8-device mesh (sharded coset NTTs + sharded index-tree
    builds) produces the same proof as the single-device path."""
    import jax
    from jax.sharding import Mesh

    ext = Goldilocks.extension
    polys = _rand_polys(ext, b=2, n=1 << 12)
    cfg = StirConfig(ext, k=4, blowup=2, security_bits=8, final_len=16)
    single = Stir(cfg).prove(polys)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    sharded = Stir(cfg, mesh=mesh).prove(polys)

    assert sharded.group_roots == single.group_roots
    assert sharded.round_roots == single.round_roots
    assert sharded.betas == single.betas
    assert sharded.final_coeffs == single.final_coeffs

    def flat(proof):
        paths = [p for q in proof.batch_openings for p in q]
        paths += [p for rnd in proof.round_openings for p in rnd]
        return [(p.row, tuple(p.groups)) for p in paths]

    assert flat(sharded) == flat(single)


def test_grinding_roundtrip_and_rejection():
    """grinding_bits: PoW nonce must be present and valid; the STIR
    schedule spends fewer queries for the same security target."""
    ext = Goldilocks.extension
    polys = _rand_polys(ext, b=2, n=1 << 10)

    g = Stir(StirConfig(ext, k=4, blowup=2, security_bits=16, final_len=16,
                        grinding_bits=8))
    ng = Stir(StirConfig(ext, k=4, blowup=2, security_bits=16, final_len=16))
    proof = g.prove(polys)
    assert g.verify(proof)
    assert all(len(nc) == 8 for nc in proof.pow_nonces)
    # fewer queries than the no-grinding schedule at every round
    tg, tn = g._schedule(1 << 10)[3], ng._schedule(1 << 10)[3]
    assert all(a <= b for a, b in zip(tg, tn)) and tg[0] < tn[0]

    bad = copy.deepcopy(proof)
    bad.pow_nonces = list(bad.pow_nonces)
    bad.pow_nonces[0] = bytes(8)
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        g.verify(bad)

    # batched FRI grinding
    fri = BatchedFri(BatchedFriConfig(ext, blowup=2, queries=4, arity=4,
                                      final_len=16, grinding_bits=8))
    fp = fri.prove(polys)
    assert len(fp.pow_nonce) == 8
    assert fri.verify(fp)
    bad = copy.deepcopy(fp)
    bad.pow_nonce = bytes(8)
    with _pytest.raises(AssertionError):
        fri.verify(bad)
