"""Pallas SHA-256: the whole 64-round compression in VMEM, lanes tiled.

Why: the XLA path (ops/sha256.py sha256_blocks) runs the message schedule
as a ``fori_loop`` over a (64, lanes) buffer — at 2^21 lanes that is a
512 MB HBM array written once and re-read row-by-row by the round loop,
plus a transpose and a concatenated pad block per level. The tree build
(`commit/index_tree._build_digests`, the fast mode's commit hot path —
reference hot spot src/merkle.rs:81-148) measured ~4.7x off its
hash-compute bound (BENCHMARKS.md "Speed of light").

Here one grid step hashes a tile of SUB*128 lanes with every intermediate
(the 64-entry schedule, the 8-word state) living in VMEM/vregs:

* input words arrive TRANSPOSED — shape (n_data_words, lanes) — so each
  message word is a native (SUB, 128) VPU tile; the per-level transpose
  is a cheap XLA relayout outside the kernel;
* constant message tails (SHA padding blocks, zero filler) are python
  constants materialized in-kernel — they never touch HBM;
* the schedule and round loops are ``fori_loop``s over a (64, SUB, 128)
  VMEM scratch with the round constants in SMEM: fully unrolling them
  instead trips a superlinear XLA:CPU pass in the interpret lowering
  (48-step schedule + 64 rounds: 3.4 s to compile at 48 rounds, 10.9 s
  at 56, >390 s at 64 — measured this round), and the loop form costs
  Mosaic nothing since every intermediate stays in VMEM either way.

Digest-exact vs hashlib / ops/sha256.py (tests/test_sha256_pallas.py);
hardware bit-validation: scripts/tpu_sha_probe.py. Gated by
MINISTARK_SHA_PALLAS (auto = on real TPU, mirroring ops/ntt_mxu).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sha256 import _H0, _K, _bswap32, _inner_level, _pad_block

SUB = 16          # sublanes per tile -> SUB*128 lanes per grid step
MIN_LANES = SUB * 128


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def enabled() -> bool:
    env = os.environ.get("MINISTARK_SHA_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return _on_tpu()


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress(s_ref, w_ref, k_ref, mask=None):
    """One SHA-256 block over (SUB, 128) u32 tiles, in place on s_ref
    (the (16, SUB, 128) state scratch: rows 0-7 = running state a..h,
    rows 8-15 = the block-entry snapshot). w_ref: (64, SUB, 128) scratch
    whose first 16 rows hold the message words; k_ref: the (64,) round
    constants in SMEM. ``mask``: optional (SUB, 128) bool tile — lanes
    where it is False keep their block-entry state (per-lane variable
    message lengths, matching sha256_blocks' ``active`` semantics).

    Both loops carry only a scalar — vector loop carries whose init is a
    splat constant get a REPLICATED Mosaic layout that the body's computed
    values cannot legally relayout back to ("Invalid relayout:
    non-singleton logical dimension is replicated in destination but not
    in source", hit on hardware twice this round), so all vector state
    lives in refs."""

    def sched(i, carry):
        x15, x2 = w_ref[i - 15], w_ref[i - 2]
        s0 = _rotr(x15, 7) ^ _rotr(x15, 18) ^ (x15 >> np.uint32(3))
        s1 = _rotr(x2, 17) ^ _rotr(x2, 19) ^ (x2 >> np.uint32(10))
        w_ref[i] = w_ref[i - 16] + s0 + w_ref[i - 7] + s1
        return carry

    jax.lax.fori_loop(16, 64, sched, 0)

    def rnd(i, carry):
        a, b, c, d = s_ref[0], s_ref[1], s_ref[2], s_ref[3]
        e, f, g, h = s_ref[4], s_ref[5], s_ref[6], s_ref[7]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k_ref[i] + w_ref[i]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        s_ref[0] = t1 + S0 + maj
        s_ref[1], s_ref[2], s_ref[3] = a, b, c
        s_ref[4] = d + t1
        s_ref[5], s_ref[6], s_ref[7] = e, f, g
        return carry

    jax.lax.fori_loop(0, 64, rnd, 0)
    for i in range(8):  # feed-forward: state += block-entry snapshot
        v = s_ref[i] + s_ref[8 + i]
        if mask is not None:
            v = jnp.where(mask, v, s_ref[8 + i])
        s_ref[i] = v
        s_ref[8 + i] = v


def _make_kernel(n_data: int, n_blocks: int, tail: tuple):
    """tail: python u32s for message words n_data .. n_blocks*16-1."""

    def kernel(k_ref, msg_ref, out_ref, w_ref, s_ref):
        shape = (SUB, 128)
        for i, h in enumerate(_H0):
            init = jnp.full(shape, np.uint32(h), jnp.uint32)
            s_ref[i] = init
            s_ref[8 + i] = init
        for blk in range(n_blocks):
            for j in range(16):
                g = blk * 16 + j
                if g < n_data:
                    w_ref[j] = msg_ref[g]
                else:
                    w_ref[j] = jnp.full(shape, np.uint32(tail[g - n_data]),
                                        jnp.uint32)
            _compress(s_ref, w_ref, k_ref)
        for i in range(8):
            out_ref[i] = s_ref[i]

    return kernel


def sha256_tr(words_t, n_blocks: int, tail, interpret: bool):
    """words_t: (n_data, L) u32 big-endian message words, messages in
    COLUMNS; L % MIN_LANES == 0. tail: np.uint32 array/list covering word
    indices n_data..n_blocks*16-1 (identical for every message). Returns
    (8, L) digests, transposed."""
    n_data, L = words_t.shape
    assert L % MIN_LANES == 0 and n_data + len(tail) == n_blocks * 16
    wt = words_t.reshape(n_data, L // 128, 128)
    out = pl.pallas_call(
        _make_kernel(n_data, n_blocks, tuple(int(t) for t in tail)),
        out_shape=jax.ShapeDtypeStruct((8, L // 128, 128), jnp.uint32),
        grid=(L // MIN_LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # round constants
            pl.BlockSpec((n_data, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, SUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, SUB, 128), jnp.uint32),
                        pltpu.VMEM((16, SUB, 128), jnp.uint32)],
        interpret=interpret,
    )(jnp.asarray(_K), wt)
    return out.reshape(8, L)


def _make_masked_kernel(n_blocks: int):
    """Per-lane variable-length messages: every lane carries ``n_blocks``
    padded blocks plus an active mask; inactive blocks leave the lane's
    state untouched (the parity leaf hash, ops/leaf_hash.py)."""

    def kernel(k_ref, msg_ref, act_ref, out_ref, w_ref, s_ref):
        shape = (SUB, 128)
        for i, h in enumerate(_H0):
            init = jnp.full(shape, np.uint32(h), jnp.uint32)
            s_ref[i] = init
            s_ref[8 + i] = init
        for blk in range(n_blocks):
            for j in range(16):
                w_ref[j] = msg_ref[blk * 16 + j]
            _compress(s_ref, w_ref, k_ref, mask=act_ref[blk] != 0)
        for i in range(8):
            out_ref[i] = s_ref[i]

    return kernel


def sha256_masked_tr(words_t, active_t, interpret: bool):
    """words_t: (n_blocks*16, L) u32 big-endian padded message words,
    messages in COLUMNS; active_t: (n_blocks, L) u32 (nonzero = the lane
    processes that block). L % MIN_LANES == 0. Returns (8, L) digests,
    transposed. Digest-equal to ops/sha256.sha256_blocks(words, active)."""
    n_words, L = words_t.shape
    assert n_words % 16 == 0 and L % MIN_LANES == 0
    n_blocks = n_words // 16
    wt = words_t.reshape(n_words, L // 128, 128)
    at = active_t.reshape(n_blocks, L // 128, 128)
    out = pl.pallas_call(
        _make_masked_kernel(n_blocks),
        out_shape=jax.ShapeDtypeStruct((8, L // 128, 128), jnp.uint32),
        grid=(L // MIN_LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # round constants
            pl.BlockSpec((n_words, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, SUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, SUB, 128), jnp.uint32),
                        pltpu.VMEM((16, SUB, 128), jnp.uint32)],
        interpret=interpret,
    )(jnp.asarray(_K), wt, at)
    return out.reshape(8, L)


def row_digests_tr(comps, interpret: bool):
    """(n, C, 2) u32 rows -> (8, n) transposed digests; n % MIN_LANES == 0.
    Matches ops/sha256.binary_row_digests (raw little-endian u64 bytes)."""
    n, C, _ = comps.shape
    m = 8 * C
    n_blocks = (m + 9 + 63) // 64
    tail = np.zeros(n_blocks * 16 - 2 * C, dtype=np.uint32)
    tail[0] = 0x80000000
    tail[-2] = (m * 8) >> 32
    tail[-1] = (m * 8) & 0xFFFFFFFF
    words_t = _bswap32(comps).reshape(n, 2 * C).T
    return sha256_tr(words_t, n_blocks, tail, interpret)


def inner_level_tr(dig_t, fan: int, interpret: bool):
    """(8, n) transposed digests -> (8, n//fan) transposed parents.
    Matches ops/sha256._inner_level (concatenated child digests +
    one constant pad block, per src/merkle.rs:171-177)."""
    n = dig_t.shape[1]
    n_par = n // fan
    # word g of parent p = digest word g%8 of child p*fan + g//8
    words_t = (dig_t.reshape(8, n_par, fan)
               .transpose(2, 0, 1).reshape(8 * fan, n_par))
    return sha256_tr(words_t, fan // 2 + 1, _pad_block(fan * 32), interpret)


def build_digests_tr(comps, arity: int, interpret: bool):
    """Full index-tree digest build (leaves first, root last), identical
    layout and bytes to commit/index_tree._build_digests. Levels narrower
    than one tile fall back to the XLA path (they are O(tile) work)."""
    levels_t = [row_digests_tr(comps, interpret)]
    while levels_t[-1].shape[1] > 1:
        cur = levels_t[-1]
        f = min(arity, cur.shape[1])
        if cur.shape[1] >= MIN_LANES * f:  # parent level still tile-sized
            levels_t.append(inner_level_tr(cur, f, interpret))
        else:
            levels_t.append(_inner_level(cur.T, f).T)
    return jnp.concatenate(levels_t, axis=1).T
