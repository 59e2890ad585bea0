"""Device polynomial primitives: evaluation, synthetic division, folding.

These are the FRI/DEEP-ALI hot ops (SURVEY §3.1/§3.3) expressed as
log-depth data-parallel programs instead of the reference's sequential loops:

* ``eval_poly``     — Horner becomes powers-scan + log-tree reduction
                      (reference: ark Horner ``Polynomial::evaluate``,
                      used at src/fri.rs:151-153 and src/starks.rs:139-149);
* ``synth_div``     — division by (x - z) is a first-order linear recurrence,
                      computed with ``jax.lax.associative_scan`` over affine
                      composition (reference: ark long division `/`,
                      src/fri.rs:99-101,166);
* ``fold_even_odd`` — f_e + alpha*f_o on strided slices (src/fri.rs:361-372);
* ``mix_columns``   — sum_i r^i * col_i batched linear mix (src/starks.rs:108-117).

All generic over the field kernel registry; bit-exact vs host (tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import FieldKernels

# Fusion fence for chained field muls. XLA's elementwise loop fusion inlines a
# producer's expression at EVERY use site of EVERY consumer; a wide-integer
# field mul reads each input component ~4-6 times, so a chain of k fused muls
# executes ~5^k times the work (measured 60x for a 3-deep Fp2 chain on
# XLA:CPU). A barrier after each mul layer materializes the result once and
# restores linear cost; the few extra memory passes are noise next to that.
_ob = jax.lax.optimization_barrier


def _mask_where(k: FieldKernels, mask_1d, a, b):
    """elementwise select with a (n,)-mask broadcast over element limb axes."""
    extra = a.ndim - 1
    m = mask_1d.reshape(mask_1d.shape + (1,) * extra)
    return jnp.where(m, a, b)


def field_sum(k: FieldKernels, arr, axis: int = 0):
    """Reduction with the field's add along ``axis``.

    Implemented as a fixed-shape Hillis-Steele fold under ``fori_loop`` so the
    traced graph size is O(log-iterations of ONE add), not O(n) — XLA compiles
    wide integer element ops slowly, so graph size is the scarce resource.
    """
    arr = jnp.moveaxis(arr, axis, 0)
    n = arr.shape[0]
    if n == 1:
        return arr[0]
    log_n = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(t, a):
        s = jnp.int32(1) << t
        rolled = jnp.roll(a, -s, axis=0)
        summed = k.add(a, rolled)
        return _mask_where(k, idx + s < n, summed, a)

    return jax.lax.fori_loop(0, log_n, body, arr)[0]


def powers(k: FieldKernels, x, n: int):
    """[1, x, ..., x^(n-1)] via exponent bits: pw_i = prod_b x^(2^b*bit_b(i)).

    log2(n) fori_loop iterations over a fixed (n, *elem) shape — one multiply
    and one square per iteration, so the compiled graph stays tiny."""
    one = jnp.broadcast_to(k.one(), tuple(x.shape))
    pw0 = jnp.broadcast_to(one, (n,) + tuple(x.shape))
    if n == 1:
        return pw0
    if n == 2:
        # direct construction: the generic path's trip-count-1 fori_loop gets
        # unrolled by XLA into a select/shift chain that sends the algebraic
        # simplifier into a "circular simplification loop" under the SPMD
        # partitioner (root-caused by scripts/mimc_simplifier_probe.py)
        return jnp.stack([one, x])
    log_n = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(b, carry):
        pw, x2 = carry
        bit = (idx >> b) & 1
        x2b = jnp.broadcast_to(x2, pw.shape)
        pw = _mask_where(k, bit == 1, k.mul(pw, x2b), pw)
        return pw, k.mul(x2, x2)

    pw, _ = jax.lax.fori_loop(0, log_n, body, (pw0, x))
    return pw


def eval_poly(k: FieldKernels, coeffs, x):
    """Evaluate sum_i coeffs[i] * x^i. ``coeffs``: (n, *elem); ``x``: (*elem)."""
    n = coeffs.shape[0]
    pw = powers(k, x, n)
    return field_sum(k, k.mul(coeffs, pw), axis=0)


def eval_many(k: FieldKernels, coeffs_batch, x):
    """Evaluate B polynomials at one point: (B, n, *elem), (*elem) -> (B, *elem).
    The powers ladder is shared across the batch; planar fast path above
    PLANAR_MIN."""
    from .planar import field_sum_planes, get_planar, powers_planes

    n = coeffs_batch.shape[1]
    pc = get_planar(k)
    if pc is not None and n >= PLANAR_MIN:
        pw = powers_planes(pc, pc.scalar_planes(x), n)        # (C, n)

        def one(c):
            s = field_sum_planes(pc, pc.mul(pc.to_planes(c), pw))
            return pc.from_planes(s[:, None])[0]

        return jax.vmap(one)(coeffs_batch)
    pw = powers(k, x, n)
    return field_sum(k, k.mul(coeffs_batch, pw[None]), axis=1)


def eval_poly_base_coeffs_ext_point(k_ext: FieldKernels, base_coeffs, x):
    """Evaluate a base-coefficient polynomial at an extension point without
    materializing the lifted coefficients: multiply the (base-scalar) powers
    componentwise."""
    from .registry import lift_base_array

    lifted = lift_base_array(k_ext, base_coeffs)
    return eval_poly(k_ext, lifted, x)


def synth_div(k: FieldKernels, coeffs, z):
    """Exact division by (x - z): returns quotient coefficients (n-1, *elem).

    q_{n-2} = c_{n-1};  q_{i-1} = c_i + z * q_i  (i descending)
    Computed as an associative scan over affine maps t -> a*t + b with
    (a, b) composition; assumes the division is exact (remainder = f(z) = 0),
    as in every reference use site.
    """
    n = coeffs.shape[0]
    assert n >= 1
    if n == 1:
        return coeffs[:0]
    # process from the top coefficient down: r_j over j = n-1 .. 1
    c_rev = coeffs[::-1]  # c_{n-1}, c_{n-2}, ..., c_0
    zb = jnp.broadcast_to(z, (n - 1,) + tuple(z.shape))

    def compose(p, q):
        a1, b1 = p
        a2, b2 = q
        return k.mul(a1, a2), k.add(k.mul(a2, b1), b2)

    # running value r after absorbing c_{n-1}..c_{n-1-j}: r_{j+1} = z*r_j + c
    a = zb
    b = c_rev[: n - 1]
    aa, bb_ = jax.lax.associative_scan(compose, (a, b), axis=0)
    del aa
    # q_{n-1-1-j} ... the scan's b at step j equals the Horner prefix that IS
    # the quotient coefficient q_{n-2-j}; reverse back to ascending order
    return bb_[::-1]


_FOLD_ROW = 1024


def _even_odd_split(coeffs):
    """coeffs[0::2], coeffs[1::2] — via a 2D-row view when the length allows:
    strided slices on a 1024-wide lane axis run ~3.5x faster on TPU than on
    the major axis of a tiny-minor-dim array (scripts/fold_probe2.py)."""
    n = coeffs.shape[0]
    elem = tuple(coeffs.shape[1:])
    if n % (2 * _FOLD_ROW) == 0:
        w = coeffs.reshape((n // _FOLD_ROW, _FOLD_ROW) + elem)
        even = w[:, 0::2].reshape((n // 2,) + elem)
        odd = w[:, 1::2].reshape((n // 2,) + elem)
        return even, odd
    even = coeffs[0::2]
    odd = coeffs[1::2]
    if odd.shape[0] < even.shape[0]:
        pad = jnp.zeros_like(even[: even.shape[0] - odd.shape[0]])
        odd = jnp.concatenate([odd, pad], axis=0)
    return even, odd


# Minimum coefficient count for the limb-planar fast paths (ops/planar.py):
# below this the layout conversion outweighs the win, and tail rounds are
# host-side anyway.
PLANAR_MIN = 2048


def fold_even_odd(k: FieldKernels, coeffs, alpha):
    """f_even + alpha * f_odd over coefficient slices (split_factor 2)."""
    from .planar import fold_planes, get_planar

    pc = get_planar(k)
    if pc is not None and coeffs.shape[0] >= PLANAR_MIN:
        out = fold_planes(pc, pc.to_planes(coeffs), pc.scalar_planes(alpha))
        return pc.from_planes(out)
    even, odd = _even_odd_split(coeffs)
    return k.add(even, k.mul(odd, jnp.broadcast_to(alpha, odd.shape)))


def fold_factor(k: FieldKernels, coeffs, alpha, F: int):
    """sum_j alpha^j * coeffs[F*i + j]: F-way coefficient fold (production
    FRI folding factor; F == 2 is the reference's even/odd fold)."""
    from .planar import fold_factor_planes, get_planar

    n = coeffs.shape[0]
    assert n % F == 0
    pc = get_planar(k)
    if pc is not None and n >= PLANAR_MIN:
        out = fold_factor_planes(pc, pc.to_planes(coeffs),
                                 pc.scalar_planes(alpha), F)
        return pc.from_planes(out)
    acc = coeffs[0::F]
    a_pow = alpha
    for j in range(1, F):
        acc = k.add(acc, k.mul(coeffs[j::F], jnp.broadcast_to(a_pow, acc.shape)))
        if j + 1 < F:
            a_pow = k.mul(a_pow, alpha)
    return acc


def mix_columns(k: FieldKernels, cols, weights):
    """sum_i weights[i] * cols[i]; cols: (w, n, *elem), weights: (w, *elem)."""
    w = cols.shape[0]
    weighted = k.mul(cols, jnp.broadcast_to(weights[:, None], cols.shape))
    return field_sum(k, weighted, axis=0)


def suffix_sums(k: FieldKernels, arr):
    """S_i = sum_{j >= i} arr[j] — Hillis-Steele over a fixed shape."""
    n = arr.shape[0]
    if n == 1:
        return arr
    log_n = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(t, a):
        s = jnp.int32(1) << t
        rolled = jnp.roll(a, -s, axis=0)  # rolled[i] = a[i+s] (wrapped)
        summed = k.add(a, rolled)
        return _mask_where(k, idx + s < n, summed, a)

    return jax.lax.fori_loop(0, log_n, body, arr)


def synth_div_suffix(k: FieldKernels, coeffs, zp, zinvp):
    """Quotient of division by (x - z) via the closed form
    q_i = z^{-(i+1)} * sum_{j >= i+1} c_j z^j.

    Requires z != 0 (callers host-fallback on the zero challenge);
    ``zinvp`` = packed z^{-1}. The planar fast path uses the blocked
    local-power formulation (2 full-length muls; ops/planar.py); the
    packed fallback builds both power tables directly — exact in modular
    arithmetic either way.
    """
    from .planar import get_planar, synth_div_planes

    n = coeffs.shape[0]
    pc = get_planar(k)
    if pc is not None and n >= PLANAR_MIN:
        q = synth_div_planes(
            pc, pc.to_planes(coeffs),
            pc.scalar_planes(zp), pc.scalar_planes(zinvp),
        )
        return pc.from_planes(q)
    pw = powers(k, zp, n)                       # z^0 .. z^{n-1}
    t = _ob(k.mul(coeffs, pw))
    suf = suffix_sums(k, t)                      # T_i = sum_{j>=i} c_j z^j
    ipw = powers(k, zinvp, n)                    # zinv^0 .. zinv^{n-1}
    # z^{-(i+1)} = zinv^i * zinv  for i in [0, n-2]
    inv_pw = _ob(
        k.mul(ipw[: n - 1], jnp.broadcast_to(zinvp, ipw[: n - 1].shape))
    )
    return k.mul(suf[1:], inv_pw)


def eval_even_odd(k: FieldKernels, coeffs, zp):
    """(f_even(z), f_odd(z)) for the coefficient-split halves."""
    from .planar import eval_even_odd_planes, get_planar

    pc = get_planar(k)
    if pc is not None and coeffs.shape[0] >= PLANAR_MIN:
        fe, fo = eval_even_odd_planes(pc, pc.to_planes(coeffs), pc.scalar_planes(zp))
        return pc.from_planes(fe[:, None])[0], pc.from_planes(fo[:, None])[0]
    even, odd = _even_odd_split(coeffs)
    m = even.shape[0]
    pw = powers(k, zp, m)
    fe = field_sum(k, k.mul(even, pw), axis=0)
    fo = field_sum(k, k.mul(odd, pw), axis=0)
    return fe, fo


def prefix_products(k: FieldKernels, arr):
    """P_i = prod_{j <= i} arr[j] (Hillis-Steele over field mul)."""
    n = arr.shape[0]
    if n == 1:
        return arr
    log_n = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(t, a):
        s = jnp.int32(1) << t
        rolled = jnp.roll(a, s, axis=0)  # rolled[i] = a[i-s]
        prod = k.mul(a, rolled)
        return _mask_where(k, idx >= s, prod, a)

    return jax.lax.fori_loop(0, log_n, body, arr)


def batch_inverse(k: FieldKernels, arr, total_inv):
    """Montgomery batch inversion: n inversions for one (host-side) inversion
    plus O(n log n) multiplies (SURVEY §2.2's ark-ff `batched inversion`
    line item). ``total_inv`` = packed inverse of prod(arr) computed on host
    from a single pulled scalar. All inputs must be nonzero.

    inv(a_i) = P_{i-1} * S_{i+1} * total_inv for prefix P and suffix S
    products (P_{-1} = S_{n} = 1).
    """
    n = arr.shape[0]
    pre = prefix_products(k, arr)                 # P_i incl a_i
    suf = prefix_products(k, arr[::-1])[::-1]     # S_i = prod_{j>=i}
    one = jnp.broadcast_to(k.one(), tuple(arr.shape[1:]))
    p_prev = jnp.concatenate([one[None], pre[:-1]], axis=0)
    s_next = jnp.concatenate([suf[1:], one[None]], axis=0)
    ti = jnp.broadcast_to(total_inv, arr.shape)
    return k.mul(_ob(k.mul(p_prev, s_next)), ti)


def batch_inverse_full(field, k: FieldKernels, arr):
    """Convenience wrapper: pulls the total product (one element), inverts it
    on host, and finishes on device."""
    pre = prefix_products(k, arr)
    total = k.unpack(np.asarray(pre[-1:]))[0]
    tinv = jnp.asarray(k.pack_scalar(field.inv(total)))
    return batch_inverse(k, arr, tinv)


# jitted entry points (kernel namespace is a static argument; FieldKernels
# instances are cached singletons so jit caching works by identity)
eval_poly_jit = jax.jit(eval_poly, static_argnums=0)
synth_div_jit = jax.jit(synth_div, static_argnums=0)
fold_even_odd_jit = jax.jit(fold_even_odd, static_argnums=0)
mix_columns_jit = jax.jit(mix_columns, static_argnums=0)
