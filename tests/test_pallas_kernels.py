"""Pallas kernels vs host oracle (interpret mode on the CPU test mesh)."""

import numpy as np
import jax.numpy as jnp

from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import gl
from ministark_tpu.ops.pallas_kernels import _TILE, gl_mul_pallas

rng = np.random.default_rng(21)


def test_gl_mul_pallas():
    n = 2 * _TILE
    a = [int(x) % GOLDILOCKS_FP.p for x in rng.integers(0, 2**64, size=n, dtype=np.uint64)]
    b = [int(x) % GOLDILOCKS_FP.p for x in rng.integers(0, 2**64, size=n, dtype=np.uint64)]
    out = gl.unpack(np.asarray(gl_mul_pallas(jnp.asarray(gl.pack(a)), jnp.asarray(gl.pack(b)))))
    assert list(out) == [GOLDILOCKS_FP.mul(x, y) for x, y in zip(a, b)]
