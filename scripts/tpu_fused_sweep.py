"""Hardware sweep: fused Pallas MXU-NTT vs the XLA MXU path at every
fused-eligible size the engine's FRI chain touches (fft only; the
variant-level checks live in scripts/tpu_bisect.py). Run on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ministark_tpu.fields import BABYBEAR_FP, GOLDILOCKS_FP
from ministark_tpu.ops import gl
from ministark_tpu.ops import ntt_mxu

F = (BABYBEAR_FP if os.environ.get("SWEEP_FIELD") == "babybear"
     else GOLDILOCKS_FP)
rng = np.random.default_rng(1)
fail = []
for logn in [int(s) for s in
             os.environ.get("SWEEP_LOGNS", "15,16,18,19").split(",")]:
    n = 1 << logn
    if not ntt_mxu.fused_supports(n):
        print(f"2^{logn}: fused_supports=False (skipped)", flush=True)
        continue
    if F is BABYBEAR_FP:
        x = jnp.asarray(rng.integers(0, F.p, size=(2, n), dtype=np.uint32))
    else:
        x = jnp.asarray(gl.pack(
            rng.integers(0, F.p, size=(2, n), dtype=np.uint64)))
    os.environ["MINISTARK_MXU_FUSED"] = "1"
    f1 = ntt_mxu.make_mxu_ntt_fns(F, n)
    os.environ["MINISTARK_MXU_FUSED"] = "0"
    f0 = ntt_mxu.make_mxu_ntt_fns(F, n)
    os.environ.pop("MINISTARK_MXU_FUSED", None)
    t0 = time.time()
    ok = np.array_equal(np.asarray(f1[0](x)), np.asarray(f0[0](x)))
    print(f"2^{logn} {ntt_mxu.factorize(n)}: "
          f"{'PASS' if ok else 'FAIL'} ({time.time() - t0:.1f}s)", flush=True)
    if not ok:
        fail.append(logn)
print("failures:", fail if fail else "none")
sys.exit(1 if fail else 0)
