"""Per-level fused-NTT debug on real TPU: compare each _fused_level output
against the same level run in interpret mode (plain jax ops, compiled under
jit — the XLA lowering that end-to-end tests validate).

Context: fused NTT mismatches on hardware at n=2^17 [6,6,5] while 2^14
[7,7], 2^20 [7,7,6] and 2^21 [7,7,7] pass — isolating which level (and
which F) Mosaic miscompiles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import ntt_mxu as M

F = GOLDILOCKS_FP
n = int(os.environ.get("LVL_N", str(1 << 17)))
B = 2
root = int(F.get_root_of_unity(n))
limbs, NA, NB = M._params(F.p)
factors, v_mats, tws, tws_flat, v_pads = M._build_tables(F, n, root)
kp = M.gl_ops.pack([M._recombine_const(F.p)])[0]
kc_np = (np.uint32(kp[0]), np.uint32(kp[1]))
Fs = [1 << lf for lf in factors]
print("factors:", factors, flush=True)

rng = np.random.default_rng(7)


def rand_planes(shape):
    v = rng.integers(0, F.p, size=shape, dtype=np.uint64)
    return (jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((v >> 32).astype(np.uint32)))


shape = (B,) + tuple(Fs)
for lvl in range(len(Fs)):
    planes = rand_planes(shape)
    args = dict(Vd=v_mats[lvl], NA=NA, NB=NB, kc_np=kc_np,
                tw_flat=tws_flat[lvl], scalar_np=None)
    out_hw = M._fused_level(planes, interpret=False, **args)
    it = jax.jit(lambda pl: M._fused_level(pl, interpret=True, **args))
    out_it = it(planes)
    ok = all(np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(out_hw, out_it))
    print(f"level {lvl} F={Fs[lvl]} tw={tws_flat[lvl] is not None}: "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    if not ok:
        a = np.asarray(out_hw[0])
        b = np.asarray(out_it[0])
        bad = np.argwhere(a != b)
        print(f"  plane0 mismatches: {bad.shape[0]}/{a.size}; first idx "
              f"{bad[0] if bad.shape[0] else None}", flush=True)
    # next level's input shape: axis 1 cycled to the back
    shape = (B,) + tuple(Fs[lvl + 1:]) + tuple(Fs[:lvl + 1])
