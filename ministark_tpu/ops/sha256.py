"""Batched SHA-256 on device (uint32 lanes, jnp/XLA).

The compression function is pure 32-bit integer arithmetic — ideal VPU work:
one kernel invocation hashes n messages in parallel, vectorized over lanes.
Message schedules and rounds are statically unrolled (~1.1k ops per block).

Used for Merkle inner levels (fixed 64-byte messages -> exactly 2 blocks) and
as the building block for on-device leaf hashing. Digest-equal to hashlib /
the native C++ engine (tests/test_ops_sha256.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _compress_block(state, w16):
    """state: (8, lanes) u32; w16: (16, lanes) u32. Both loops are
    ``fori_loop``s over fixed shapes — XLA compile time is pathological for
    long unrolled integer chains, so the graph must stay tiny."""
    lanes = w16.shape[1]
    w = jnp.concatenate([w16, jnp.zeros((48, lanes), U32)], axis=0)

    def sched(i, w):
        w15 = w[i - 15]
        w2 = w[i - 2]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
        return w.at[i].set(w[i - 16] + s0 + w[i - 7] + s1)

    w = jax.lax.fori_loop(16, 64, sched, w)
    k = jnp.asarray(_K)

    def rnd(i, s):
        a, b, c, d, e, f, g, h = s
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k[i] + w[i]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g)

    out = jax.lax.fori_loop(0, 64, rnd, tuple(state))
    return [s + v for s, v in zip(state, out)]


def sha256_blocks(msgs, active=None):
    """msgs: (lanes, n_blocks, 16) uint32 big-endian words (already padded).
    active: optional (lanes, n_blocks) bool — lanes skip inactive blocks
    (for per-lane variable block counts). Returns (lanes, 8) digests."""
    lanes = msgs.shape[0]
    n_blocks = msgs.shape[1]
    state = [jnp.broadcast_to(jnp.uint32(h), (lanes,)) for h in _H0]
    for b in range(n_blocks):
        w16 = jnp.transpose(msgs[:, b, :])  # (16, lanes)
        new_state = _compress_block(state, w16)
        if active is None:
            state = new_state
        else:
            m = active[:, b]
            state = [jnp.where(m, ns, s) for ns, s in zip(new_state, state)]
    return jnp.stack(state, axis=1)


sha256_blocks_jit = jax.jit(sha256_blocks)


# ---------------------------------------------------------------------------
# Merkle inner level: parents of a (n, 8)-digest level with fan-in 2.
# Message = 64 bytes (two digests) -> block0 = the digests, block1 = padding.
# ---------------------------------------------------------------------------

def _pad_block(msg_bytes: int) -> np.ndarray:
    """Final all-padding SHA-256 block for a block-aligned message length."""
    assert msg_bytes % 64 == 0
    blk = np.zeros(16, dtype=np.uint32)
    blk[0] = 0x80000000
    blk[15] = msg_bytes * 8  # message length in bits
    return blk


_PAD_BLOCK_64 = _pad_block(64)


def _inner_level(digests, fan_in: int):
    """One Merkle level, traceable: (n, 8) words -> (n // fan_in, 8) parents.
    Message = fan_in concatenated digests (fan_in//2 data blocks + padding),
    matching the reference's inner-node hashing (src/merkle.rs:81-148) for
    any power-of-two fan_in."""
    n = digests.shape[0]
    groups = digests.reshape(n // fan_in, fan_in // 2, 16)
    pad = jnp.broadcast_to(
        jnp.asarray(_pad_block(fan_in * 32)), (n // fan_in, 1, 16)
    )
    msgs = jnp.concatenate([groups, pad], axis=1)
    return sha256_blocks(msgs)


@jax.jit
def merkle_inner_level2(digests):
    """digests: (n, 8) uint32 (big-endian words) -> (n//2, 8) parents."""
    return _inner_level(digests, 2)


@partial(jax.jit, static_argnums=1)
def _inner_levels_fused(leaf_digests, fan_in: int):
    """All upper levels in ONE executable (the level loop unrolls at trace
    time over static shapes — one dispatch for the whole tree instead of one
    jit + dispatch per level size). Levels narrower than the fan-in fold
    with whatever remains (a 2^21-leaf 4-ary tree ends with a fan-in-2
    level).

    Wide levels take the Pallas VMEM compression (sha256_pallas
    inner_level_tr — bit-identical digests, ~3x over the XLA path on TPU,
    hardware-validated for fan 2/4/8 by scripts/tpu_sha_probe.py); levels
    narrower than a lane tile stay on XLA. The MINISTARK_SHA_PALLAS gate is
    read at TRACE time, like commit/index_tree._build_digests."""
    from . import sha256_pallas as sp

    use_pallas = sp.enabled()
    levels = []
    cur = leaf_digests
    cur_t = None  # transposed (8, n) form carried between Pallas levels
    while cur.shape[0] > 1:
        f = min(fan_in, cur.shape[0])
        if (use_pallas and cur.shape[0] >= sp.MIN_LANES * f
                and cur.shape[0] % (sp.MIN_LANES * f) == 0):
            cur_t = cur.T if cur_t is None else cur_t
            cur_t = sp.inner_level_tr(cur_t, f, interpret=not sp._on_tpu())
            cur = cur_t.T
        else:
            cur = _inner_level(cur, f)
            cur_t = None
        levels.append(cur)
    return jnp.concatenate(levels, axis=0)


def merkle_inner_levels_device(leaf_digests, fan_in: int = 2):
    """Build all upper levels on device; returns the concatenated levels as a
    (total, 8) uint32 array (level-by-level order, root last)."""
    assert fan_in >= 2 and fan_in & (fan_in - 1) == 0, "fan-in must be 2^k"
    if leaf_digests.shape[0] <= 1:
        return leaf_digests[:0]
    return _inner_levels_fused(leaf_digests, fan_in)


# ---------------------------------------------------------------------------
# Binary row hashing (fast / non-parity mode): SHA-256 over the raw
# little-endian u64 bytes of a row of field components. Unlike the parity
# leaf hash (ops/leaf_hash.py, decimal Display preimages per the reference's
# src/merkle.rs:162-168), every lane has the SAME static message length, so
# no per-lane masking is needed — one dense batched compression.
# Host equivalent: hashlib.sha256(row_le_bytes).digest().
# ---------------------------------------------------------------------------

def _bswap32(x):
    return (
        ((x & jnp.uint32(0xFF)) << 24)
        | ((x & jnp.uint32(0xFF00)) << 8)
        | ((x >> 8) & jnp.uint32(0xFF00))
        | (x >> 24)
    )


@jax.jit
def binary_row_digests(comps):
    """comps: (n, C, 2) u32 [lo, hi] pairs -> (n, 8) digests of the rows'
    C little-endian u64s (8C bytes per message, statically padded)."""
    n, C, _ = comps.shape
    m = 8 * C                                # message bytes
    n_blocks = (m + 9 + 63) // 64
    total_words = n_blocks * 16
    words = _bswap32(comps).reshape(n, 2 * C)  # LE bytes as BE SHA words
    tail = np.zeros(total_words - 2 * C, dtype=np.uint32)
    tail[0] = 0x80000000
    tail[-2] = (m * 8) >> 32
    tail[-1] = (m * 8) & 0xFFFFFFFF
    msgs = jnp.concatenate(
        [words, jnp.broadcast_to(jnp.asarray(tail), (n, tail.shape[0]))], axis=1
    )
    return sha256_blocks(msgs.reshape(n, n_blocks, 16))


def digests_to_bytes(digests) -> np.ndarray:
    """(n, 8) uint32 big-endian words -> (n, 32) uint8."""
    d = np.asarray(digests)
    out = np.empty((d.shape[0], 32), dtype=np.uint8)
    for i in range(8):
        out[:, 4 * i] = (d[:, i] >> 24) & 0xFF
        out[:, 4 * i + 1] = (d[:, i] >> 16) & 0xFF
        out[:, 4 * i + 2] = (d[:, i] >> 8) & 0xFF
        out[:, 4 * i + 3] = d[:, i] & 0xFF
    return out


def bytes_to_digests(b: np.ndarray):
    """(n, 32) uint8 -> (n, 8) uint32 big-endian words."""
    b = np.asarray(b, dtype=np.uint32).reshape(-1, 8, 4)
    return jnp.asarray((b[:, :, 0] << 24) | (b[:, :, 1] << 16) | (b[:, :, 2] << 8) | b[:, :, 3])
