"""Bisect the TPU-only engine paths against their XLA/host oracles.

Run on the real TPU (default backend). Each check prints PASS/FAIL; run
with TPU_BISECT_ITEMS=ntt,fold,eval to select subsets.

Context: BENCH r3 cold prove failed the verifier's DEEP linearity check —
the prover's FRI data was internally inconsistent. Suspects are exactly the
code paths that only execute on TPU: the fused Pallas MXU-NTT variants
(ifft trailing scalar, coset_fft pre-multiply — only fft was
hardware-validated) and the fused fold/divide + eval executables
(stark/engine.py dispatches them only on non-CPU backends).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ministark_tpu.fields import GOLDILOCKS_FP, GOLDILOCKS_FP2
from ministark_tpu.ops import gl
from ministark_tpu.ops import ntt_mxu
from ministark_tpu.ops.registry import get_kernels

items = os.environ.get("TPU_BISECT_ITEMS", "ntt,fold,eval").split(",")
rng = np.random.default_rng(42)
F = GOLDILOCKS_FP
ext = GOLDILOCKS_FP2
ke = get_kernels(ext)

failures = []


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
    if not ok:
        failures.append(name)


def fused_fns(n, on):
    old = os.environ.get("MINISTARK_MXU_FUSED")
    os.environ["MINISTARK_MXU_FUSED"] = "1" if on else "0"
    try:
        return ntt_mxu.make_mxu_ntt_fns(F, n)
    finally:
        if old is None:
            os.environ.pop("MINISTARK_MXU_FUSED", None)
        else:
            os.environ["MINISTARK_MXU_FUSED"] = old


if "ntt" in items:
    for logn, batch in ((14, 2), (17, 2), (20, 3), (21, 6)):
        n = 1 << logn
        x = jnp.asarray(gl.pack(
            rng.integers(0, F.p, size=(batch, n), dtype=np.uint64)))
        f1 = fused_fns(n, True)
        f0 = fused_fns(n, False)
        t0 = time.time()
        check(f"fused fft    2^{logn} b{batch}",
              np.array_equal(np.asarray(f1[0](x)), np.asarray(f0[0](x))))
        check(f"fused ifft   2^{logn} b{batch}",
              np.array_equal(np.asarray(f1[1](x)), np.asarray(f0[1](x))))
        off = jnp.asarray(gl.pack([12345])[0])
        offi = jnp.asarray(gl.pack([int(F.inv(F.from_int(12345)))])[0])
        check(f"fused cosetF 2^{logn} b{batch}",
              np.array_equal(np.asarray(f1[2](x, off)),
                             np.asarray(f0[2](x, off))))
        check(f"fused cosetI 2^{logn} b{batch}",
              np.array_equal(np.asarray(f1[3](x, offi)),
                             np.asarray(f0[3](x, offi))))
        print(f"  ({time.time() - t0:.1f}s)", flush=True)

if "fold" in items:
    from ministark_tpu.stark.engine import _fold_div_fused, _fold_jit, \
        _sub_head2_jit, _synth_div_jit, _pad_to_jit

    for logn in (12, 18, 21):
        m = 1 << logn
        vals_u = rng.integers(0, F.p, size=(m, 2), dtype=np.uint64)
        coeffs = jnp.asarray(gl.pack(vals_u))
        z = ext.from_base_coeffs((12345, 67890))
        alpha = ext.from_base_coeffs((99991, 31337))
        dv = ext.from_base_coeffs((777, 4242))
        zp = jnp.asarray(ke.pack_scalar(z))
        ap = jnp.asarray(ke.pack_scalar(alpha))
        dvp = jnp.asarray(ke.pack_scalar(dv))
        zinv = jnp.asarray(ke.pack_scalar(ext.inv(z)))
        fused = np.asarray(_fold_div_fused(ke, coeffs, zp, ap, dvp, zinv))
        # split oracle (the CPU/test path, same planar kernels but separate
        # executables without the optimization_barrier fusion)
        folded = _fold_jit(ke, coeffs, ap)
        zero = jnp.zeros_like(dvp)
        folded = _sub_head2_jit(ke, folded, dvp, zero)
        q = _synth_div_jit(ke, folded, zp, zinv)
        split = np.asarray(_pad_to_jit(ke, q, m // 2))
        check(f"fold_div fused vs split 2^{logn}",
              np.array_equal(fused, split))
        if logn <= 12:
            # independent host oracle (exact Python ints): fold even/odd,
            # subtract dv at x^0, divide by (x - z) by synthetic division
            cs = [ext.from_base_coeffs((int(a), int(b))) for a, b in vals_u]
            folded_h = [ext.add(cs[2 * i], ext.mul(alpha, cs[2 * i + 1]))
                        for i in range(m // 2)]
            folded_h[0] = ext.sub(folded_h[0], dv)
            qh = [ext.zero()] * (m // 2)
            acc = ext.zero()
            for i in range(m // 2 - 1, 0, -1):
                acc = ext.add(folded_h[i], ext.mul(acc, z))
                qh[i - 1] = acc
            exp = np.stack([np.asarray(ke.pack_scalar(v)) for v in qh])
            check(f"fold_div fused vs HOST 2^{logn}",
                  np.array_equal(fused.reshape(exp.shape), exp))

if "eval" in items:
    from ministark_tpu.ops.poly_device import eval_many, eval_even_odd
    from ministark_tpu.poly import DensePolynomial

    for logn in (12, 20):
        m = 1 << logn
        vals_u = rng.integers(0, F.p, size=(m, 2), dtype=np.uint64)
        coeffs = jnp.asarray(gl.pack(vals_u))
        z = ext.from_base_coeffs((314159, 271828))
        zp = jnp.asarray(ke.pack_scalar(z))
        got = ke.unpack(np.asarray(
            jax.jit(eval_many, static_argnums=0)(ke, coeffs[None], zp)))[0]
        vals = [(int(a), int(b)) for a, b in vals_u]
        want = DensePolynomial(ext, [ext.from_base_coeffs(v) for v in vals]
                               ).evaluate(z)
        check(f"eval_many 2^{logn} vs host", got == want)
        fe, fo = jax.jit(eval_even_odd, static_argnums=0)(ke, coeffs, zp)
        fe = ke.unpack(np.asarray(fe)[None])[0]
        fo = ke.unpack(np.asarray(fo)[None])[0]
        ev = DensePolynomial(
            ext, [ext.from_base_coeffs(v) for v in vals[0::2]]).evaluate(z)
        od = DensePolynomial(
            ext, [ext.from_base_coeffs(v) for v in vals[1::2]]).evaluate(z)
        check(f"eval_even_odd 2^{logn} vs host", fe == ev and fo == od)

print("failures:", failures if failures else "none")
sys.exit(1 if failures else 0)
