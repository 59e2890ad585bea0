"""Field-kernel registry: maps host field objects (fields/host.py) to their
device kernel namespaces, packers and shape metadata.

Every kernel set operates on uint32 arrays whose trailing axes encode the
element: Goldilocks base (..., 2); Goldilocks Fp2 (..., 2, 2); BabyBear base
(...,); BabyBear Fp2 (..., 2); BabyBear Fp4 (..., 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

from . import bb, gl


@dataclass(frozen=True)
class FieldKernels:
    field: object                  # host field (oracle + constants)
    base_field: object             # host base prime field
    elem_axes: Tuple[int, ...]     # trailing element shape
    add: Callable
    sub: Callable
    mul: Callable
    scale_base: Callable           # elementwise multiply by base scalar array
    pack: Callable                 # list of host scalars -> numpy uint32
    unpack: Callable               # device array -> list of host scalars
    pack_scalar: Callable          # one host scalar -> numpy uint32 elem
    one: Callable                  # () -> device one element
    zeros: Callable                # (n,) -> device zero array


def _gl_base():
    F = None

    def pack(vals):
        return gl.pack(np.array(list(vals), dtype=object))

    def unpack(arr):
        return [int(v) for v in gl.unpack(np.asarray(arr))]

    def one():
        return jnp.asarray(np.array([1, 0], dtype=np.uint32))

    def zeros(n):
        return jnp.zeros((n, 2), dtype=jnp.uint32)

    return dict(
        elem_axes=(2,), add=gl.add, sub=gl.sub, mul=gl.mul,
        scale_base=lambda a, s: gl.mul(a, jnp.broadcast_to(s, a.shape)),
        pack=pack, unpack=unpack,
        pack_scalar=lambda v: gl.pack([v])[0],
        one=one, zeros=zeros,
    )


def _gl_ext():
    def pack(vals):
        return gl.pack(np.array([[c0, c1] for (c0, c1) in vals], dtype=object))

    def unpack(arr):
        u = gl.unpack(np.asarray(arr))
        return [(int(r[0]), int(r[1])) for r in u]

    def one():
        return jnp.asarray(np.array([[1, 0], [0, 0]], dtype=np.uint32))

    def zeros(n):
        return jnp.zeros((n, 2, 2), dtype=jnp.uint32)

    def scale_base(a, s):
        return gl.ext_scale_base(a, jnp.broadcast_to(s, a.shape[:-2] + (2,)))

    return dict(
        elem_axes=(2, 2), add=gl.ext_add, sub=gl.ext_sub, mul=gl.ext_mul,
        scale_base=scale_base,
        pack=pack, unpack=unpack,
        pack_scalar=lambda v: gl.pack(np.array([[v[0], v[1]]], dtype=object))[0],
        one=one, zeros=zeros,
    )


def _bb_base():
    def pack(vals):
        return np.asarray([int(v) for v in vals], dtype=np.uint32)

    def unpack(arr):
        return [int(v) for v in np.asarray(arr)]

    return dict(
        elem_axes=(), add=bb.add, sub=bb.sub, mul=bb.mul,
        scale_base=lambda a, s: bb.mul(a, jnp.broadcast_to(s, a.shape)),
        pack=pack, unpack=unpack,
        pack_scalar=lambda v: np.uint32(int(v)),
        one=lambda: jnp.asarray(np.uint32(1)),
        zeros=lambda n: jnp.zeros((n,), dtype=jnp.uint32),
    )


def _bb_fp4():
    def pack(vals):
        flat = [[v[0][0], v[0][1], v[1][0], v[1][1]] for v in vals]
        return np.asarray(flat, dtype=np.uint32)

    def unpack(arr):
        a = np.asarray(arr)
        return [((int(r[0]), int(r[1])), (int(r[2]), int(r[3]))) for r in a]

    def one():
        return jnp.asarray(np.array([1, 0, 0, 0], dtype=np.uint32))

    return dict(
        elem_axes=(4,), add=bb.fp4_add, sub=bb.fp4_sub, mul=bb.fp4_mul,
        scale_base=lambda a, s: bb.mul(a, jnp.broadcast_to(s[..., None] if jnp.ndim(s) == a.ndim - 1 else s, a.shape)),
        pack=pack, unpack=unpack,
        pack_scalar=lambda v: np.asarray([v[0][0], v[0][1], v[1][0], v[1][1]], dtype=np.uint32),
        one=one,
        zeros=lambda n: jnp.zeros((n, 4), dtype=jnp.uint32),
    )


_BUILDERS = {}


def get_kernels(field) -> FieldKernels:
    """Kernels for a host field object from fields/host.py."""
    from ..fields import (
        BABYBEAR_FP,
        BABYBEAR_FP4,
        GOLDILOCKS_FP,
        GOLDILOCKS_FP2,
    )

    key = id(field)
    if key not in _BUILDERS:
        if field is GOLDILOCKS_FP:
            cfg, basef = _gl_base(), GOLDILOCKS_FP
        elif field is GOLDILOCKS_FP2:
            cfg, basef = _gl_ext(), GOLDILOCKS_FP
        elif field is BABYBEAR_FP:
            cfg, basef = _bb_base(), BABYBEAR_FP
        elif field is BABYBEAR_FP4:
            cfg, basef = _bb_fp4(), BABYBEAR_FP
        else:
            raise ValueError(f"no device kernels for {field!r}")
        _BUILDERS[key] = FieldKernels(field=field, base_field=basef, **cfg)
    return _BUILDERS[key]


def lift_base_array(field_kernels: FieldKernels, base_arr):
    """Embed a base-field device array (n[, 2]) into the extension layout."""
    ax = field_kernels.elem_axes
    if ax == ():  # base bb
        return base_arr
    if ax == (2,) and field_kernels.field.extension_degree == 1:
        return base_arr  # base gl
    if ax == (2, 2):  # gl fp2: (n, 2) -> (n, 2, 2) with c1 = 0
        z = jnp.zeros_like(base_arr)
        return jnp.stack([base_arr, z], axis=-2)
    if ax == (4,):  # bb fp4: (n,) -> (n, 4)
        z = jnp.zeros_like(base_arr)
        return jnp.stack([base_arr, z, z, z], axis=-1)
    raise ValueError(ax)
