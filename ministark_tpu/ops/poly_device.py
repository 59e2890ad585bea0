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

from .registry import FieldKernels


def field_sum(k: FieldKernels, arr, axis: int = 0):
    """Tree reduction with the field's add along ``axis`` (length power of 2
    not required)."""
    n = arr.shape[axis]
    arr = jnp.moveaxis(arr, axis, 0)
    while n > 1:
        half = n // 2
        even = arr[: 2 * half : 2]
        odd = arr[1 : 2 * half : 2]
        red = k.add(even, odd)
        if n % 2:
            red = jnp.concatenate([red, arr[-1:]], axis=0)
        arr = red
        n = arr.shape[0]
    return arr[0]


def powers(k: FieldKernels, x, n: int):
    """[1, x, ..., x^(n-1)] via log-depth associative scan."""
    base = jnp.broadcast_to(x, (n,) + tuple(x.shape))
    one = jnp.broadcast_to(k.one(), base[0].shape)
    seq = jnp.concatenate([one[None], base[:-1]], axis=0)
    return jax.lax.associative_scan(k.mul, seq, axis=0)


def eval_poly(k: FieldKernels, coeffs, x):
    """Evaluate sum_i coeffs[i] * x^i. ``coeffs``: (n, *elem); ``x``: (*elem)."""
    n = coeffs.shape[0]
    pw = powers(k, x, n)
    return field_sum(k, k.mul(coeffs, pw), axis=0)


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


def fold_even_odd(k: FieldKernels, coeffs, alpha):
    """f_even + alpha * f_odd over coefficient slices (split_factor 2)."""
    n = coeffs.shape[0]
    even = coeffs[0::2]
    odd = coeffs[1::2]
    if odd.shape[0] < even.shape[0]:
        pad = jnp.zeros_like(even[: even.shape[0] - odd.shape[0]])
        odd = jnp.concatenate([odd, pad], axis=0)
    return k.add(even, k.mul(odd, jnp.broadcast_to(alpha, odd.shape)))


def mix_columns(k: FieldKernels, cols, weights):
    """sum_i weights[i] * cols[i]; cols: (w, n, *elem), weights: (w, *elem)."""
    w = cols.shape[0]
    weighted = k.mul(cols, jnp.broadcast_to(weights[:, None], cols.shape))
    return field_sum(k, weighted, axis=0)
