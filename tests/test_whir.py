"""WHIR low-degree test (fri/whir.py, fast mode).

Not a parity surface — the reference lists WHIR as an unchecked roadmap item
(README.md:36-38). These tests gate the fold/sumcheck identities,
completeness, tamper rejection, sharded byte-identity, and the FastStark
integration (lde_backend="whir").
"""

import copy

import numpy as np
import pytest

from ministark_tpu.fields import BabyBear, Goldilocks
from ministark_tpu.fri.stir import Stir, StirConfig
from ministark_tpu.fri.whir import Whir, WhirConfig
from ministark_tpu.ops.registry import get_kernels
from ministark_tpu.utils.rng import ark_test_rng


def _rand_polys(ext, b, n, seed=0):
    rng = ark_test_rng()
    for _ in range(seed):
        ext.rand(rng)
    ke = get_kernels(ext)
    vals = [ext.rand(rng) for _ in range(b * n)]
    return np.asarray(ke.pack(vals)).reshape((b, n) + ke.elem_axes)


def test_fold_fiber_matches_coefficient_fold():
    """The verifier's pointwise fiber fold (kappa levels of
    (f(x)+f(-x))/2 + alpha*(f(x)-f(-x))/(2x)) equals the prover's
    coefficient-space repeated even/odd fold evaluated at x0^k."""
    import jax.numpy as jnp

    from ministark_tpu.ops.poly_device import fold_even_odd

    ext = Goldilocks.extension
    ke = get_kernels(ext)
    rng = ark_test_rng()
    n, k = 64, 4
    coeffs = [ext.rand(rng) for _ in range(n)]
    alphas = [ext.rand(rng) for _ in range(2)]  # kappa = log2(4) = 2

    whir = Whir(WhirConfig(ext, k=k, blowup=2, security_bits=8, final_len=16))
    d, N, off, t, R = whir._schedule(n)
    p_mod = whir.prime.p
    w0 = int(whir.prime.get_root_of_unity(N[0]))
    mu = pow(w0, N[0] // k, p_mod)

    def ev(cs, x):
        acc = ext.zero()
        for c in reversed(cs):
            acc = ext.add(ext.mul(acc, x), c)
        return acc

    idx = 5
    x0 = off[0] * pow(w0, idx, p_mod) % p_mod
    fiber = [ev(coeffs, ext.from_int(x0 * pow(mu, tt, p_mod) % p_mod))
             for tt in range(k)]

    # coefficient-space fold
    cur = jnp.asarray(np.asarray(ke.pack(coeffs)).reshape((n,) + ke.elem_axes))
    for a in alphas:
        cur = fold_even_odd(ke, cur, jnp.asarray(ke.pack_scalar(a)))
    folded = ke.unpack(np.asarray(cur))
    y = ext.from_int(pow(x0, k, p_mod))
    want = ev(folded, y)

    # the verifier helper is nested inside verify(); replicate its math here
    inv2 = ext.inv(ext.from_int(2))
    vals, xx0, mm = list(fiber), x0, mu
    for a in alphas:
        half = len(vals) // 2
        nxt = []
        for s in range(half):
            xs = ext.from_int(xx0 * pow(mm, s, p_mod) % p_mod)
            lo, hi = vals[s], vals[s + half]
            even = ext.mul(ext.add(lo, hi), inv2)
            odd = ext.mul(ext.sub(lo, hi),
                          ext.inv(ext.mul(ext.from_int(2), xs)))
            nxt.append(ext.add(even, ext.mul(a, odd)))
        vals, xx0, mm = nxt, xx0 * xx0 % p_mod, mm * mm % p_mod
    assert vals[0] == want


@pytest.mark.parametrize("sf,b,n,k", [
    pytest.param(Goldilocks, 3, 1 << 12, 4,
                 marks=pytest.mark.slow),   # multiple iterations
    (Goldilocks, 1, 1 << 8, 4),    # single iteration, single poly
    (Goldilocks, 2, 1 << 10, 8),   # kappa = 3
    pytest.param(BabyBear, 2, 1 << 10, 4,
                 marks=pytest.mark.slow),
])
def test_whir_roundtrip(sf, b, n, k):
    ext = sf.extension
    whir = Whir(WhirConfig(ext, k=k, blowup=2, security_bits=16,
                           final_len=16))
    proof = whir.prove(_rand_polys(ext, b=b, n=n))
    assert whir.verify(proof)
    d, N, off, t, R = whir._schedule(n)
    assert len(proof.round_roots) == R
    assert len(proof.betas) == R + 1
    assert len(proof.sumcheck) == R + 1
    assert len(proof.final_coeffs) <= d[R] // k


def test_whir_query_schedule_decays():
    """Rate improves k/2 per iteration (fold by k, domain halves), so query
    counts decay geometrically exactly like STIR's."""
    ext = Goldilocks.extension
    whir = Whir(WhirConfig(ext, k=4, blowup=2, security_bits=32,
                           final_len=16))
    d, N, off, t, R = whir._schedule(1 << 20)
    assert R >= 4
    assert t[0] == 32
    assert all(t[i + 1] < t[i] for i in range(R - 1))
    assert t[1] == 16 and t[2] == 11


def test_whir_rejects_tampering():
    ext = Goldilocks.extension
    whir = Whir(WhirConfig(ext, k=4, blowup=2, security_bits=16,
                           final_len=16))
    proof = whir.prove(_rand_polys(ext, b=2, n=1 << 10))

    # flip a bit in an opened row -> leaf digest mismatch
    bad = copy.deepcopy(proof)
    row = bytearray(bad.batch_openings[0][0].row)
    row[0] ^= 1
    bad.batch_openings[0][0].row = bytes(row)
    with pytest.raises(AssertionError):
        whir.verify(bad)

    # tamper an out-of-domain answer -> sumcheck chain breaks
    bad = copy.deepcopy(proof)
    bad.betas = list(bad.betas)
    bad.betas[0] = ext.add(bad.betas[0], ext.one())
    with pytest.raises(AssertionError):
        whir.verify(bad)

    # tamper a sumcheck message -> h(0)+h(1) != sigma
    bad = copy.deepcopy(proof)
    bad.sumcheck = copy.deepcopy(bad.sumcheck)
    bad.sumcheck[0][0][1] = ext.add(bad.sumcheck[0][0][1], ext.one())
    with pytest.raises(AssertionError):
        whir.verify(bad)

    # a CONSISTENT sumcheck forgery (h(0)+h(1) preserved by moving weight
    # between h0 and the constant... h0 += 1, h1 -= 2, h2 += 1 keeps
    # h(0)+h(1) = 2h0+h1+h2) must still die downstream
    bad = copy.deepcopy(proof)
    bad.sumcheck = copy.deepcopy(bad.sumcheck)
    h = bad.sumcheck[0][0]
    h[0] = ext.add(h[0], ext.one())
    h[1] = ext.sub(h[1], ext.add(ext.one(), ext.one()))
    h[2] = ext.add(h[2], ext.one())
    with pytest.raises(AssertionError):
        whir.verify(bad)

    # tamper a final coefficient
    bad = copy.deepcopy(proof)
    bad.final_coeffs = list(bad.final_coeffs)
    bad.final_coeffs[0] = ext.add(bad.final_coeffs[0], ext.one())
    with pytest.raises(AssertionError):
        whir.verify(bad)

    # swap a commitment root -> transcript diverges and paths fail
    bad = copy.deepcopy(proof)
    bad.round_roots = list(bad.round_roots)
    bad.round_roots[0] = bytes(32)
    with pytest.raises(AssertionError):
        whir.verify(bad)


def test_whir_rejects_grafted_openings():
    ext = Goldilocks.extension
    cfg = WhirConfig(ext, k=4, blowup=2, security_bits=16, final_len=16)
    whir = Whir(cfg)
    proof = whir.prove(_rand_polys(ext, b=2, n=1 << 10))
    other = whir.prove(_rand_polys(ext, b=2, n=1 << 10, seed=5))
    bad = copy.deepcopy(proof)
    bad.batch_openings = other.batch_openings
    bad.round_openings = other.round_openings
    with pytest.raises(AssertionError):
        whir.verify(bad)


@pytest.mark.slow
def test_whir_proof_size_comparable_to_stir():
    """WHIR opens the same geometrically-decaying query schedule as STIR;
    its extra sumcheck messages are a few scalars per iteration."""
    ext = Goldilocks.extension
    n, b = 1 << 12, 2
    polys = _rand_polys(ext, b=b, n=n)
    wp = Whir(WhirConfig(ext, k=4, blowup=2, security_bits=32,
                         final_len=16)).prove(polys)
    sp = Stir(StirConfig(ext, k=4, blowup=2, security_bits=32,
                         final_len=16)).prove(polys)
    assert wp.size_bytes(ext) < sp.size_bytes(ext) * 1.3


def test_whir_grinding():
    ext = Goldilocks.extension
    g = Whir(WhirConfig(ext, k=4, blowup=2, security_bits=16, final_len=16,
                        grinding_bits=8))
    proof = g.prove(_rand_polys(ext, b=2, n=1 << 10))
    assert g.verify(proof)
    assert all(len(nc) == 8 for nc in proof.pow_nonces)
    bad = copy.deepcopy(proof)
    bad.pow_nonces = list(bad.pow_nonces)
    bad.pow_nonces[0] = bytes(8)
    with pytest.raises(AssertionError):
        g.verify(bad)


@pytest.mark.slow
def test_whir_sharded_byte_identical():
    """WHIR over an 8-device mesh (sharded coset NTTs + sharded index-tree
    builds) produces the same proof as the single-device path."""
    import jax
    from jax.sharding import Mesh

    ext = Goldilocks.extension
    polys = _rand_polys(ext, b=2, n=1 << 12)
    cfg = WhirConfig(ext, k=4, blowup=2, security_bits=8, final_len=16)
    single = Whir(cfg).prove(polys)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    sharded = Whir(cfg, mesh=mesh).prove(polys)

    assert sharded.group_roots == single.group_roots
    assert sharded.round_roots == single.round_roots
    assert sharded.betas == single.betas
    assert sharded.sumcheck == single.sumcheck
    assert sharded.final_coeffs == single.final_coeffs

    def flat(proof):
        paths = [p for q in proof.batch_openings for p in q]
        paths += [p for rnd in proof.round_openings for p in rnd]
        return [(p.row, tuple(p.groups)) for p in paths]

    assert flat(sharded) == flat(single)


@pytest.mark.parametrize("sf,steps", [
    (Goldilocks, 100),
    pytest.param(BabyBear, 77, marks=pytest.mark.slow),
])
def test_fast_stark_whir_backend(sf, steps):
    """The fast-mode STARK over the WHIR LDT: completeness, row tampering,
    wrong witness, serialization roundtrip."""
    from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
    from ministark_tpu.stark.fast import FastStark, FastStarkConfig
    from ministark_tpu.stark.proof_io import (
        fast_proof_from_bytes,
        fast_proof_to_bytes,
    )

    trace = fibonacci_device_trace(sf, steps)
    stark = FastStark(FastStarkConfig(
        sf, steps, queries=8, point_queries=2, final_len=8,
        lde_backend="whir",
    ))
    proof = stark.prove(trace)
    cons = np.asarray(stark._constraint_polys(trace))
    assert stark.verify(cons, proof)
    assert proof.size_bytes() < 200_000

    blob = fast_proof_to_bytes(sf, proof)
    back = fast_proof_from_bytes(sf, blob)
    assert stark.verify(cons, back)

    bad = copy.deepcopy(proof)
    row = bytearray(bad.fri_proof.batch_openings[0][0].row)
    row[3] ^= 0x10
    bad.fri_proof.batch_openings[0][0].row = bytes(row)
    with pytest.raises(AssertionError):
        stark.verify(cons, bad)

    if sf is Goldilocks:
        other = fibonacci_device_trace(sf, steps, secret_b=99)
        with pytest.raises(AssertionError):
            stark.verify(np.asarray(stark._constraint_polys(other)), proof)
