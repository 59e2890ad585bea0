"""Repro: fused MXU-NTT at 3-level sizes (K_prod>1 twiddle levels) vs the
XLA device NTT, interpret mode on CPU. Run: python scripts/repro_fused.py"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
).strip()
os.environ["MINISTARK_MXU_FUSED"] = "1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ministark_tpu.utils.cache import setup_jax_cache  # noqa: E402

setup_jax_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ministark_tpu.fields import GOLDILOCKS_FP  # noqa: E402
from ministark_tpu.ops import gl  # noqa: E402
from ministark_tpu.ops.ntt_device import make_ntt_fns  # noqa: E402
from ministark_tpu.ops.ntt_mxu import factorize, make_mxu_ntt_fns  # noqa: E402


def rand_gl(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64)
    out = np.zeros((batch, n, 2), dtype=np.uint32)
    out[..., 0] = vals & 0xFFFFFFFF
    out[..., 1] = vals >> 32
    return jnp.asarray(out)


for L in (17, 18):
    n = 1 << L
    print(f"n=2^{L} factors={factorize(n)}", flush=True)
    x = rand_gl(1, n, seed=7)
    ref = make_ntt_fns(GOLDILOCKS_FP, n)
    fus = make_mxu_ntt_fns(GOLDILOCKS_FP, n)
    a = np.asarray(fus[0](x))
    b = np.asarray(ref[0](x))
    ok = np.array_equal(a, b)
    print(f"  fwd match: {ok}", flush=True)
    if not ok:
        bad = np.nonzero((a != b).any(axis=-1))
        print(f"  first mismatch at {bad[1][0]}, n_bad={len(bad[1])}")
print("done")
