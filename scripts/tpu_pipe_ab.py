"""Hardware A/B of the skewed-pipeline fused NTT level vs the straight
fused kernel: bit-check both against the independent non-MXU oracle, then
slope-time (bench_kernels._time_chained).

PIPE_SIZES env: comma-separated log2 sizes (default "20,21").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_kernels import _time_chained
from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import gl, ntt_mxu
from ministark_tpu.ops.ntt_device import make_ntt_fns

rng = np.random.default_rng(0)
sizes = [int(s) for s in os.environ.get("PIPE_SIZES", "20,21").split(",")]

for logn in sizes:
    n = 1 << logn
    x = jnp.asarray(gl.pack(
        rng.integers(0, 1 << 62, size=(2, n), dtype=np.uint64)))
    os.environ["MINISTARK_MXU_FUSED"] = "1"
    os.environ["MINISTARK_MXU_PIPE"] = os.environ.get("PIPE_MODE", "1")
    fns_pipe = ntt_mxu.make_mxu_ntt_fns(GOLDILOCKS_FP, n)
    os.environ["MINISTARK_MXU_PIPE"] = "0"
    fns_straight = ntt_mxu.make_mxu_ntt_fns(GOLDILOCKS_FP, n)
    os.environ.pop("MINISTARK_MXU_FUSED", None)

    ref = make_ntt_fns(GOLDILOCKS_FP, n)[0]
    y_ref = np.asarray(ref(x))
    ok_p = np.array_equal(np.asarray(fns_pipe[0](x)), y_ref)
    ok_s = np.array_equal(np.asarray(fns_straight[0](x)), y_ref)
    print(f"2^{logn}: pipe bit-exact={ok_p} straight bit-exact={ok_s}",
          flush=True)
    if not ok_p:
        continue
    t_p = _time_chained(fns_pipe[0], x)
    t_s = _time_chained(fns_straight[0], x)
    print(f"2^{logn}: pipe "
          f"{None if t_p is None else round(t_p * 1e3, 3)} ms vs straight "
          f"{None if t_s is None else round(t_s * 1e3, 3)} ms", flush=True)
