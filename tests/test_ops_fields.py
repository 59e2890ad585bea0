"""Device field kernels vs the host oracle — exhaustive randomized checks.

Runs on the CPU backend (conftest) — the same jitted code runs on TPU.
"""

import numpy as np
import pytest

import jax

from ministark_tpu.fields import (
    BABYBEAR_FP,
    BABYBEAR_FP4,
    GOLDILOCKS_FP,
    GOLDILOCKS_FP2,
)
from ministark_tpu.ops import bb, gl

rng = np.random.default_rng(42)
N = 4096


def _rand_gl(n):
    return [int(x) % GOLDILOCKS_FP.p for x in rng.integers(0, 2**64, size=n, dtype=np.uint64)]


def _rand_bb(n):
    return [int(x) % BABYBEAR_FP.p for x in rng.integers(0, 2**31, size=n, dtype=np.uint64)]


EDGE_GL = [0, 1, 2, GOLDILOCKS_FP.p - 1, GOLDILOCKS_FP.p - 2, 2**32 - 1, 2**32, 2**63, 2**64 % GOLDILOCKS_FP.p]
EDGE_BB = [0, 1, 2, BABYBEAR_FP.p - 1, BABYBEAR_FP.p - 2, 2**27, 2**30]


def test_gl_pack_unpack():
    vals = _rand_gl(64) + EDGE_GL
    assert list(gl.unpack(gl.pack(vals))) == vals


@pytest.mark.parametrize("op,host", [
    (gl.add, GOLDILOCKS_FP.add),
    (gl.sub, GOLDILOCKS_FP.sub),
    (gl.mul, GOLDILOCKS_FP.mul),
])
def test_gl_binops(op, host):
    a = _rand_gl(N) + EDGE_GL + EDGE_GL
    b = _rand_gl(N) + EDGE_GL + list(reversed(EDGE_GL))
    out = jax.jit(op)(gl.pack(a), gl.pack(b))
    expected = [host(x, y) for x, y in zip(a, b)]
    assert list(gl.unpack(out)) == expected


def test_gl_neg():
    a = _rand_gl(256) + EDGE_GL
    out = jax.jit(gl.neg)(gl.pack(a))
    assert list(gl.unpack(out)) == [GOLDILOCKS_FP.neg(x) for x in a]


def test_gl_pow_scalar():
    a = _rand_gl(64)
    for e in (0, 1, 2, 3, 5, 1 << 20, GOLDILOCKS_FP.p - 2):
        out = gl.pow_scalar(gl.pack(a), e)
        assert list(gl.unpack(out)) == [GOLDILOCKS_FP.pow(x, e) for x in a]


def test_gl_ext_mul():
    E = GOLDILOCKS_FP2
    a = [(x, y) for x, y in zip(_rand_gl(N), _rand_gl(N))]
    b = [(x, y) for x, y in zip(_rand_gl(N), _rand_gl(N))]
    pa = gl.pack(np.array(a, dtype=object))
    pb = gl.pack(np.array(b, dtype=object))
    out = gl.unpack(jax.jit(gl.ext_mul)(pa, pb))
    expected = [E.mul(x, y) for x, y in zip(a, b)]
    got = [tuple(row) for row in out]
    assert got == expected

    outs = gl.unpack(jax.jit(gl.ext_sub)(pa, pb))
    assert [tuple(r) for r in outs] == [E.sub(x, y) for x, y in zip(a, b)]


@pytest.mark.parametrize("op,host", [
    (bb.add, BABYBEAR_FP.add),
    (bb.sub, BABYBEAR_FP.sub),
    (bb.mul, BABYBEAR_FP.mul),
])
def test_bb_binops(op, host):
    a = _rand_bb(N) + EDGE_BB + EDGE_BB
    b = _rand_bb(N) + EDGE_BB + list(reversed(EDGE_BB))
    out = jax.jit(op)(bb.pack(a), bb.pack(b))
    assert list(bb.unpack(out)) == [host(x, y) for x, y in zip(a, b)]


def test_bb_mul_worst_cases():
    """Barrett reduction corner cases: products near 2^62 and multiples of p."""
    F = BABYBEAR_FP
    cases = []
    for a in (F.p - 1, F.p - 2, 2**30, 2**30 + 1, 1, 0):
        for b in (F.p - 1, F.p - 2, 2**30, 2**27 * 15, 1):
            cases.append((a, b))
    a = [c[0] for c in cases]
    b = [c[1] for c in cases]
    out = bb.unpack(bb.mul(bb.pack(a), bb.pack(b)))
    assert list(out) == [F.mul(x, y) for x, y in zip(a, b)]


def test_bb_fp4_mul():
    E = BABYBEAR_FP4
    n = 1024
    raw_a = [tuple(_rand_bb(4)) for _ in range(n)]
    raw_b = [tuple(_rand_bb(4)) for _ in range(n)]
    pa = bb.pack(np.array(raw_a, dtype=object))
    pb = bb.pack(np.array(raw_b, dtype=object))
    out = bb.unpack(jax.jit(bb.fp4_mul)(pa, pb))
    for i in range(n):
        ea = E.from_base_coeffs(raw_a[i])
        eb = E.from_base_coeffs(raw_b[i])
        expected = E.base_coeffs(E.mul(ea, eb))
        assert tuple(out[i]) == expected


def test_bb_pow_scalar():
    a = _rand_bb(64)
    for e in (0, 1, 7, BABYBEAR_FP.p - 2):
        out = bb.pow_scalar(bb.pack(a), e)
        assert list(bb.unpack(out)) == [BABYBEAR_FP.pow(x, e) for x in a]
