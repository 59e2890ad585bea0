"""Batched radix-2 NTT / iNTT / coset-LDE on device arrays.

Design (TPU-first, see SURVEY.md §7):

* data lives in HBM as uint32 limb arrays — Goldilocks (batch, N, 2),
  BabyBear (batch, N); a whole multi-column trace transforms as one batch;
* a transform is log2(N) fully-vectorized butterfly stages under one ``jit``;
  each stage reshapes to (batch, blocks, 2, half) and applies
  u +/- w*v with a precomputed per-stage twiddle vector (static constants,
  baked into the executable) — pure VPU work that XLA fuses and tiles;
* the bit-reversal input permutation is a single static gather;
* coset scaling multiplies by on-device-computed offset powers (the offset is
  a Fiat-Shamir challenge, so powers come from a log-depth associative scan);
* extension-field codewords need no extension NTT: the 2-adic roots lie in
  the base prime subfield (fields/host.py), so an Fp2/Fp4 transform is just
  the base transform batched over the tower coefficients.

Bit-exact with poly/domain.py (tests/test_ops_ntt.py); the sharded multi-chip
variant lives in parallel/ntt_sharded.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import bb as bb_ops
from . import gl as gl_ops


def _field_ops(field):
    """Pick the limb kernel module + packers for a base prime field."""
    if field.p == gl_ops.P:
        return gl_ops
    if field.p == bb_ops.P:
        return bb_ops
    raise ValueError(f"no device kernels for field modulus {field.p}")


@lru_cache(maxsize=None)
def _bitrev_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles(p: int, root: int, n: int):
    """Per-stage twiddle tables for generator ``root`` of order n.

    Stage s (length = 2^s blocks) uses w_len = root^(n/length), twiddles
    w_len^k for k < length/2. Returned as a tuple of packed numpy arrays.
    """
    tables = []
    length = 2
    while length <= n:
        w_len = pow(root, n // length, p)
        tw = [1] * (length // 2)
        for k in range(1, length // 2):
            tw[k] = (tw[k - 1] * w_len) % p
        tables.append(tuple(tw))
        length *= 2
    return tuple(tables)


def _pack_twiddles(ops, p, root, n):
    return [
        jnp.asarray(ops.pack(list(tw))) for tw in _stage_twiddles(p, root, n)
    ]


def _ntt_core(ops, x, twiddles, n):
    """x: (batch, n[, limbs]) in bit-reversed order -> natural-order NTT."""
    batch = x.shape[0]
    length = 2
    for tw in twiddles:
        half = length // 2
        blocks = n // length
        xr = x.reshape((batch, blocks, 2, half) + x.shape[2:])
        e = xr[:, :, 0]
        o = xr[:, :, 1]
        wv = ops.mul(o, tw[None, None])
        out = jnp.stack([ops.add(e, wv), ops.sub(e, wv)], axis=2)
        # fence each unrolled stage (chained fused field muls re-execute
        # producers per use — see ops/poly_device.py::_ob)
        x = jax.lax.optimization_barrier(
            out.reshape((batch, n) + x.shape[2:])
        )
        length *= 2
    return x


def _powers(ops, scalar, n):
    """[1, s, s^2, ..., s^(n-1)] via exponent-bit ladder (fixed shapes,
    log2(n) fori_loop iterations — see ops/poly_device.py::powers)."""
    one = jnp.zeros_like(scalar)
    if scalar.ndim == 1:  # limbed (goldilocks): [1, 0]
        one = one.at[0].set(1)
    else:
        one = one + 1
    pw0 = jnp.broadcast_to(one, (n,) + tuple(scalar.shape))
    if n == 1:
        return pw0
    log_n = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(b, carry):
        pw, x2 = carry
        bit = ((idx >> b) & 1) == 1
        mask = bit.reshape((n,) + (1,) * scalar.ndim)
        pw = jnp.where(mask, ops.mul(pw, jnp.broadcast_to(x2, pw.shape)), pw)
        return pw, ops.mul(x2, x2)

    pw, _ = jax.lax.fori_loop(0, log_n, body, (pw0, scalar))
    return pw


@lru_cache(maxsize=None)
def _root_powers_table(p: int, root: int, count: int):
    """[root^0 .. root^(count-1)] as a host tuple (cached)."""
    out = [1] * count
    for i in range(1, count):
        out[i] = (out[i - 1] * root) % p
    return tuple(out)


def _ntt_fori(ops, x, rev, tw_table, n):
    """Fixed-shape in-place DIT NTT: log2(n) fori_loop iterations, each a
    handful of gathers + one butterfly over the full (batch, n[, limbs])
    array. The tiny loop body keeps backend compile time flat in n (the
    unrolled-stages variant costs minutes per size on some backends), while
    execution stays bandwidth-bound.

    tw_table: (n/2[, limbs]) powers root^0..root^(n/2-1)."""
    log_n = n.bit_length() - 1
    rev = jnp.asarray(rev)
    tw_table = jnp.asarray(tw_table)  # numpy callers embed as a literal
    x = x[:, rev]
    idx = jnp.arange(n, dtype=jnp.uint32)

    def stage(s, x):
        su = s.astype(jnp.uint32)
        half = jnp.uint32(1) << (su - 1)            # L/2 for L = 2^s
        q = idx & (2 * half - 1)                    # position within block
        is_hi = q >= half
        lo_idx = idx - jnp.where(is_hi, half, jnp.uint32(0))
        hi_idx = lo_idx + half
        u = x[:, lo_idx]
        v = x[:, hi_idx]
        # twiddle exponent k << (log_n - s) with k = idx mod half
        exp = (idx & (half - 1)) << (jnp.uint32(log_n) - su)
        w = tw_table[exp]
        wv = ops.mul(v, w[None])
        out_lo = ops.add(u, wv)
        out_hi = ops.sub(u, wv)
        mask = is_hi.reshape((1, n) + (1,) * (x.ndim - 2))
        return jnp.where(mask, out_hi, out_lo)

    return jax.lax.fori_loop(1, log_n + 1, stage, x)


@partial(jax.jit, static_argnames=("ops",))
def _fft_impl(x, rev, tw, *, ops):
    return _ntt_fori(ops, x, rev, tw, x.shape[1])


@partial(jax.jit, static_argnames=("ops",))
def _ifft_impl(x, rev, tw_inv, n_inv, *, ops):
    y = _ntt_fori(ops, x, rev, tw_inv, x.shape[1])
    return ops.mul(y, n_inv[None, None])


@partial(jax.jit, static_argnames=("ops",))
def _coset_fft_impl(x, offset, rev, tw, *, ops):
    pw = _powers(ops, offset, x.shape[1])
    scaled = ops.mul(x, pw[None])
    return _ntt_fori(ops, scaled, rev, tw, x.shape[1])


@partial(jax.jit, static_argnames=("ops",))
def _coset_ifft_impl(x, offset_inv, rev, tw_inv, n_inv, *, ops):
    y = _ntt_fori(ops, x, rev, tw_inv, x.shape[1])
    y = ops.mul(y, n_inv[None, None])
    pw = _powers(ops, offset_inv, x.shape[1])
    return ops.mul(y, pw[None])


# Above this size the four-step factorization wins: two unrolled ~sqrt(n)
# NTT passes + transposes compile to SMALL executables (tunnel-friendly) and
# execute in a few contiguous HBM passes, vs the gather-based fori kernel's
# log2(n) permuted passes.
FOUR_STEP_MIN = 1 << 13


def _packed_one_like(scalar):
    """Packed field 1 with the same element shape as ``scalar``."""
    one = jnp.zeros_like(scalar)
    if scalar.ndim >= 1:  # limbed: set the low limb of the last axis chain
        idx = (0,) * scalar.ndim
        one = one.at[idx].set(1)
    else:
        one = one + 1
    return one


def _pow_traced(ops, base_packed, exp, nbits: int):
    """base^exp for a TRACED integer exponent via square-and-multiply over a
    static bit count (exp < 2^nbits). Used for per-shard offset powers."""
    one = _packed_one_like(base_packed)

    def body(b, carry):
        acc, sq = carry
        bit = (exp >> b) & 1
        acc = jnp.where(bit == 1, ops.mul(acc, sq), acc)
        return acc, ops.mul(sq, sq)

    acc, _ = jax.lax.fori_loop(0, max(nbits, 1), body, (one, base_packed))
    return acc


def _twiddle_rows(ops, row_bases, n2: int):
    """W[i, j] = row_bases[i]^j via j-bit repeated squaring (device-only).

    row_bases: (n1, *limbs). Shared by the single-chip four-step
    (row_bases = root^i) and the sharded NTT (row_bases = root^(i0+i) for a
    shard's local rows) — no host bigint loops at any size."""
    a = row_bases
    elem_nd = a.ndim - 1
    one = _packed_one_like(a[0])
    W = jnp.broadcast_to(one, (a.shape[0], n2) + tuple(a.shape[1:]))
    jidx = jnp.arange(n2)
    a2 = a
    for b in range((n2 - 1).bit_length()):
        mask = ((jidx >> b) & 1) == 1
        m = mask.reshape((1, n2) + (1,) * elem_nd)
        # barrier per unrolled step: fused chained field muls re-execute the
        # producer at every use site (exponential in chain depth, see
        # ops/poly_device.py::_ob)
        W = jax.lax.optimization_barrier(jnp.where(m, ops.mul(W, a2[:, None]), W))
        a2 = jax.lax.optimization_barrier(ops.mul(a2, a2))
    return W


def _twiddle_matrix(ops, root_packed, n1: int, n2: int):
    """W[i, j] = root^(i*j) on device via j-bit repeated squaring."""
    return _twiddle_rows(ops, _powers(ops, root_packed, n1), n2)


def _four_step_core(ops, x, n1: int, n2: int, rev1, tw1, rev2, tw2, W):
    """X[k2 + n2*k1] four-step NTT; x: (batch, n[, limbs]) natural order.

    rev2/tw2: tables for the length-n2 pass; rev1/tw1 for length-n1;
    W: (n1, n2[, limbs]) twiddle matrix root^(n1_idx * k2)."""
    batch = x.shape[0]
    elem = x.shape[2:]
    n = n1 * n2
    A = jnp.swapaxes(x.reshape((batch, n2, n1) + elem), 1, 2)   # A[b, i1, i2]
    B = _ntt_core(ops, A.reshape((batch * n1, n2) + elem)[:, rev2], tw2, n2)
    B = B.reshape((batch, n1, n2) + elem)
    B = ops.mul(B, W[None])
    C = jnp.swapaxes(B, 1, 2)                                   # (b, k2, i1)
    D = _ntt_core(ops, C.reshape((batch * n2, n1) + elem)[:, rev1], tw1, n1)
    D = D.reshape((batch, n2, n1) + elem)
    out = jnp.swapaxes(D, 1, 2).reshape((batch, n) + elem)      # X[k2 + n2*k1]
    return out


def _make_four_step_fns(field, n: int):
    ops = _field_ops(field)
    p = field.p
    root = field.get_root_of_unity(n)
    root_inv = field.inv(root)
    n_inv = field.inv(field.from_int(n))

    log_n = n.bit_length() - 1
    n2 = 1 << (log_n // 2)
    n1 = n // n2
    root1, root1_inv = field.get_root_of_unity(n1), field.inv(field.get_root_of_unity(n1))
    root2, root2_inv = field.get_root_of_unity(n2), field.inv(field.get_root_of_unity(n2))

    rev1 = jnp.asarray(_bitrev_indices(n1))
    rev2 = jnp.asarray(_bitrev_indices(n2))
    tw1_f = _pack_twiddles(ops, p, root1, n1)
    tw1_i = _pack_twiddles(ops, p, root1_inv, n1)
    tw2_f = _pack_twiddles(ops, p, root2, n2)
    tw2_i = _pack_twiddles(ops, p, root2_inv, n2)
    n_inv_packed = jax.device_put(jnp.asarray(ops.pack([n_inv])[0]))
    root_p = jax.device_put(jnp.asarray(ops.pack([root])[0]))
    root_inv_p = jax.device_put(jnp.asarray(ops.pack([root_inv])[0]))

    tw_gen = jax.jit(
        lambda rp: _twiddle_matrix(ops, rp, n1, n2), static_argnums=()
    )
    W_f = jax.device_put(tw_gen(root_p))
    W_i = jax.device_put(tw_gen(root_inv_p))

    @jax.jit
    def fft(x):
        return _four_step_core(ops, x, n1, n2, rev1, tw1_f, rev2, tw2_f, W_f)

    @jax.jit
    def ifft(x):
        y = _four_step_core(ops, x, n1, n2, rev1, tw1_i, rev2, tw2_i, W_i)
        return ops.mul(y, n_inv_packed[None, None])

    @jax.jit
    def coset_fft(x, offset):
        pw = _powers(ops, offset, n)
        scaled = ops.mul(x, pw[None])
        return _four_step_core(ops, scaled, n1, n2, rev1, tw1_f, rev2, tw2_f, W_f)

    @jax.jit
    def coset_ifft(x, offset_inv):
        y = _four_step_core(ops, x, n1, n2, rev1, tw1_i, rev2, tw2_i, W_i)
        y = ops.mul(y, n_inv_packed[None, None])
        pw = _powers(ops, offset_inv, n)
        return ops.mul(y, pw[None])

    return fft, ifft, coset_fft, coset_ifft


def make_ntt_fns(field, n: int):
    """Build jitted (fft, ifft, coset_fft, coset_ifft) closures for size n.

    All take/return (batch, n[, limbs]) uint32 arrays in natural order.
    The coset variants take the offset as a traced device scalar (it is a
    Fiat-Shamir challenge).

    The bit-reversal and twiddle-power tables are passed as runtime ARGUMENTS
    (device-resident, uploaded once) instead of baked constants: embedded
    multi-MB constants make the compiled executables enormous, which is
    brutal when executables travel a slow tunnel (this environment ships
    AOT blobs at ~10 MB/s).

    Sizes >= FOUR_STEP_MIN use the four-step factorization (two unrolled
    ~sqrt(n) passes + transposes): small executables AND contiguous
    near-roofline memory access. On TPU, supported sizes use the Pallas
    VMEM-resident four-step (ops/ntt_pallas.py) — ~5 HBM passes total
    instead of one read+write per butterfly stage. MINISTARK_PALLAS=1/0
    forces it on/off (the build is cached per (field, n): set the env var
    before the first transform of that size).
    """
    from . import ntt_mxu, ntt_pallas

    environ = __import__("os").environ
    env_mxu = environ.get("MINISTARK_MXU")
    use_mxu = (
        ntt_mxu.supports(n) and n >= FOUR_STEP_MIN
        and (env_mxu == "1" or (env_mxu != "0" and ntt_pallas._on_tpu()))
    )
    if use_mxu:
        return ntt_mxu.make_mxu_ntt_fns(field, n)
    env = environ.get("MINISTARK_PALLAS")
    use_pallas = ntt_pallas.supports(n) and (
        env == "1" or (env != "0" and ntt_pallas._on_tpu())
    )
    if use_pallas:
        return ntt_pallas.make_pallas_ntt_fns(field, n)
    if n >= FOUR_STEP_MIN:
        return _make_four_step_fns(field, n)
    ops = _field_ops(field)
    p = field.p
    root = field.get_root_of_unity(n)
    root_inv = field.inv(root)
    n_inv = field.inv(field.from_int(n))

    rev = jax.device_put(jnp.asarray(_bitrev_indices(n)))
    half = max(n // 2, 1)
    tw_fwd = jax.device_put(jnp.asarray(ops.pack(list(_root_powers_table(p, root, half)))))
    tw_inv = jax.device_put(jnp.asarray(ops.pack(list(_root_powers_table(p, root_inv, half)))))
    n_inv_packed = jax.device_put(jnp.asarray(ops.pack([n_inv])[0]))

    def fft(x):
        return _fft_impl(x, rev, tw_fwd, ops=ops)

    def ifft(x):
        return _ifft_impl(x, rev, tw_inv, n_inv_packed, ops=ops)

    def coset_fft(x, offset):
        return _coset_fft_impl(x, offset, rev, tw_fwd, ops=ops)

    def coset_ifft(x, offset_inv):
        return _coset_ifft_impl(x, offset_inv, rev, tw_inv, n_inv_packed, ops=ops)

    return fft, ifft, coset_fft, coset_ifft


@lru_cache(maxsize=None)
def _cached_ntt_fns(field_key, n):
    from ..fields import BABYBEAR_FP, GOLDILOCKS_FP

    field = {"gl": GOLDILOCKS_FP, "bb": BABYBEAR_FP}[field_key]
    return make_ntt_fns(field, n)


def get_ntt_fns(field, n: int):
    key = "gl" if field.p == gl_ops.P else "bb"
    return _cached_ntt_fns(key, n)


# ---------------------------------------------------------------------------
# Host-facing helpers used by the generic (list-based) protocol layers
# ---------------------------------------------------------------------------


def batch_ifft_columns_device(field, flat_data, length, width, domain):
    """iFFT all columns of a row-major host matrix via the device kernel."""
    base = field  # trace matrices are base-field
    ops = _field_ops(base)
    mat = np.array(flat_data, dtype=object).reshape(length, width).T  # (w, n)
    x = jnp.asarray(ops.pack(mat))
    _, ifft, _, coset_ifft = get_ntt_fns(base, length)
    if domain.offset == base.one():
        out = ifft(x)
    else:
        off_inv = jnp.asarray(ops.pack([domain.offset_inv])[0])
        out = coset_ifft(x, off_inv)
    res = ops.unpack(np.asarray(jax.device_get(out)))
    return [list(res[i]) for i in range(width)]
