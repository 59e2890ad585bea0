"""Hardware validation of the fused Pallas MXU-NTT: bit-check vs the XLA
MXU path on the real TPU at 2^20/2^21 (3-level factorizations with
K_prod>1 twiddle levels), then slope-time both. Run on the axon backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import gl
from ministark_tpu.ops import ntt_mxu
from ministark_tpu.ops.ntt_device import get_ntt_fns

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_kernels import _time_chained  # noqa: E402

print(f"backend: {jax.default_backend()}", flush=True)
rng = np.random.default_rng(0)
for logn in (20, 21):
    m = 1 << logn
    x = jnp.asarray(gl.pack(
        rng.integers(0, 1 << 62, size=(2, m), dtype=np.uint64)))
    os.environ["MINISTARK_MXU_FUSED"] = "1"
    fns = ntt_mxu.make_mxu_ntt_fns(GOLDILOCKS_FP, m)
    os.environ.pop("MINISTARK_MXU_FUSED", None)
    ref = get_ntt_fns(GOLDILOCKS_FP, m)[0]
    t0 = time.time()
    a = np.asarray(fns[0](x))
    print(f"2^{logn}: fused first call {time.time()-t0:.1f}s", flush=True)
    b = np.asarray(ref(x))
    ok = np.array_equal(a, b)
    print(f"2^{logn}: bit-match {ok}", flush=True)
    if not ok:
        bad = np.nonzero((a != b).any(axis=-1))
        print(f"  n_bad={len(bad[0])} first={bad[0][0]},{bad[1][0]}")
        continue
    tf = _time_chained(fns[0], x)
    tx = _time_chained(ref, x)
    print(f"2^{logn}: fused {tf*1e3:.2f} ms vs XLA {tx*1e3:.2f} ms", flush=True)
print("done")
