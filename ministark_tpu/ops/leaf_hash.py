"""On-device Merkle leaf hashing: decimal Display-string preimages + SHA-256.

The reference hashes leaf groups as SHA-256 over the concatenated ASCII
decimal strings of the field elements (src/merkle.rs:162-168) — an awkward
fit for SIMD lanes, handled here entirely on device:

  1. every u64 component is decomposed into 20 decimal digits with a
     multiply-by-magic divide-by-10 ladder (no integer division needed);
  2. each leaf group becomes a sequence of *segments* (constant byte runs
     like "QuadExtField(" and variable-length digit runs); per-lane segment
     lengths/prefix offsets place every output byte with masked gathers;
  3. standard SHA-256 padding positions (0x80, bit length) are computed
     per lane and the batched compression runs with per-lane active block
     masks (ops/sha256.py).

Supported element formats (field_fmt codes from commit/packed_tree.py):
  fmt 0 — base field decimal           (1 u64 component)
  fmt 1 — QuadExtField(c0 + c1 * u)    (2 components)
  fmt 2 — nested Fp4 Display           (4 components)

Digest-equal to the native C++ engine and hashlib (tests/test_leaf_hash.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sha256 import sha256_blocks
from .u32 import mul32_wide, mul64_wide

U32 = jnp.uint32

_MAGIC_LO = jnp.uint32(0xCCCCCCCD)
_MAGIC_HI = jnp.uint32(0xCCCCCCCC)
MAX_DIGITS = 20


def u64_digits(lo, hi, max_digits: int = MAX_DIGITS):
    """(…,) u32 pairs -> (…, max_digits) digits, least-significant first,
    plus (…,) digit-count lengths (>= 1).

    ``max_digits`` <= 10 switches to a u32-only ladder (valid when every
    value fits u32 — e.g. BabyBear components < 2^31): half the steps at
    ~a third the per-step cost of the 64-bit ladder, ~6x cheaper digit
    extraction for the Fp4 decimal preimages (measured 3.7x slower BB FRI
    trees vs GL before this — scripts/tpu_bb_vs_gl_probe.py)."""
    digits = []
    if max_digits <= 10:
        v = lo
        for _ in range(max_digits):
            # q = floor(v / 10) = mulhi32(v, 0xCCCCCCCD) >> 3
            _, q = mul32_wide(v, _MAGIC_LO)
            q = q >> 3
            digits.append(v - q * jnp.uint32(10))
            v = q
    else:
        for _ in range(max_digits):
            # q = floor(v / 10) = mulhi64(v, 0xCCCC...CD) >> 3
            x0, x1, x2, x3 = mul64_wide(lo, hi, _MAGIC_LO, _MAGIC_HI)
            q_lo = (x2 >> 3) | (x3 << 29)
            q_hi = x3 >> 3
            d = lo - q_lo * jnp.uint32(10)
            digits.append(d)
            lo, hi = q_lo, q_hi
    dig = jnp.stack(digits, axis=-1)  # (…, max_digits) LSB first
    nz = dig != 0
    idx = jnp.arange(max_digits, dtype=jnp.int32)
    top = jnp.max(jnp.where(nz, idx + 1, 0), axis=-1)
    length = jnp.maximum(top, 1)
    return dig, length


# chunked-extraction magic constants — each verified EXACT over its input
# range (exhaustive small ranges + 300k adversarial/random samples at the
# boundaries; derivation in the round-5 work log):
#   floor(v / 10^10), v < 2^64:  mulhi64(v, _M_1E10) >> 33  (= x3 >> 1)
#   floor(x / 12500), x < 1.25e9: mulhi32(x, _M_1E5) >> 10
#   floor(x / 10^5),  x < 2^31:   mulhi32(x, _M_1E5) >> 13
#   floor(x / 10),    x < 2^17:   ((x >> 1) * 52429) >> 18
_M_1E10_LO = jnp.uint32(0xBDEDD5BF)
_M_1E10_HI = jnp.uint32(0xDBE6FECE)
_M_1E5 = jnp.uint32(0x14F8B589)
_M_DIV10_SMALL = jnp.uint32(52429)


def u64_digit_nibbles(lo, hi, max_digits: int = MAX_DIGITS):
    """(…,) u32 pairs -> ((…, nw) u32 nibble-packed digits, (…,) lengths).

    Each digit lands as a 4-bit nibble (LSB-first: digit i at bits
    4*(i%8) of word i//8), so the placement pass reads digit ``didx``
    with one word select plus a per-lane variable shift instead of a
    ``max_digits``-way one-hot select chain (VERDICT r4 item 4).

    CHUNKED extraction (round 5): the straight 20-step mulhi64
    divide-by-10 ladder measured 43 ms alone at 2^21 fmt-1 — the
    leaf-hash bottleneck. Instead: one exact magic divide splits
    v = q1*10^10 + r1, one more splits r1 = a*10^5 + b (and q1 =
    a2*10^5 + b2), then all digits come from 5-step u32 mini-ladders on
    values < 2^17 whose divide-by-10 is a single 32-bit multiply —
    ~3x fewer word-ops than the wide ladder. max_digits == 10 assumes
    values < 2^31 (BabyBear); other widths take the generic ladder."""
    nw = (max_digits + 7) // 8
    words = [jnp.zeros_like(lo) for _ in range(nw)]
    top = jnp.zeros_like(lo, dtype=jnp.int32)

    def put(i, d, prev):
        words[i // 8] = words[i // 8] | (d << jnp.uint32(4 * (i % 8)))
        return jnp.where(d != 0, jnp.int32(i + 1), prev)

    def mini_ladder(x, base, t, nd=5):
        # x < 2^17: 5 decimal digits, one u32 multiply per step
        for j in range(nd):
            q = ((x >> 1) * _M_DIV10_SMALL) >> 18
            t = put(base + j, x - q * jnp.uint32(10), t)
            x = q
        return t

    if max_digits == 20:
        # v = q1*10^10 + r1 (exact mulhi64 magic; q1 = hi64(v*M) >> 33,
        # and since the shift is >= 32 that is just x3 >> 1)
        _, _, x2, x3 = mul64_wide(lo, hi, _M_1E10_LO, _M_1E10_HI)
        q1 = x3 >> 1                                      # < 2^31
        # r1 = v - q1*10^10, 10^10 = 2*2^32 + 0x540BE400
        p0, p1 = mul32_wide(q1, jnp.uint32(0x540BE400))
        r1_lo = lo - p0
        borrow = (lo < p0).astype(jnp.uint32)
        r1_hi = hi - (p1 + (q1 << 1)) - borrow            # < 3
        # r1 = a*10^5 + b  (a = floor((r1 >> 3) / 12500), exact)
        r8 = (r1_lo >> 3) | (r1_hi << 29)
        _, ah = mul32_wide(r8, _M_1E5)
        a = ah >> 10                                      # < 10^5
        b = r1_lo - a * jnp.uint32(100000)                # low-word exact
        # q1 = a2*10^5 + b2
        _, a2h = mul32_wide(q1, _M_1E5)
        a2 = a2h >> 13                                    # < 2^15
        b2 = q1 - a2 * jnp.uint32(100000)
        top = mini_ladder(b, 0, top)
        top = mini_ladder(a, 5, top)
        top = mini_ladder(b2, 10, top)
        top = mini_ladder(a2, 15, top)
    elif max_digits == 10:
        v = lo                                            # < 2^31
        _, a2h = mul32_wide(v, _M_1E5)
        a2 = a2h >> 13
        b2 = v - a2 * jnp.uint32(100000)
        top = mini_ladder(b2, 0, top)
        top = mini_ladder(a2, 5, top)
    else:  # generic fallback: the original wide ladder
        for i in range(max_digits):
            x0, x1, x2, x3 = mul64_wide(lo, hi, _MAGIC_LO, _MAGIC_HI)
            q_lo = (x2 >> 3) | (x3 << 29)
            q_hi = x3 >> 3
            top = put(i, lo - q_lo * jnp.uint32(10), top)
            lo, hi = q_lo, q_hi
    length = jnp.maximum(top, 1)
    return jnp.stack(words, axis=-1), length


# segment descriptors per format: list of ("const", bytes) | ("digits", comp)
_FMT_SEGMENTS = {
    0: [("digits", 0)],
    1: [("const", b"QuadExtField("), ("digits", 0), ("const", b" + "),
        ("digits", 1), ("const", b" * u)")],
    2: [("const", b"QuadExtField(QuadExtField("), ("digits", 0),
        ("const", b" + "), ("digits", 1), ("const", b" * u) + QuadExtField("),
        ("digits", 2), ("const", b" + "), ("digits", 3), ("const", b" * u) * u)")],
}


def _group_segments(fmt: int, leafs_per_node: int):
    """Expanded segment list for one whole leaf group."""
    segs = []
    for e in range(leafs_per_node):
        for kind, v in _FMT_SEGMENTS[fmt]:
            segs.append((kind, v, e))
    return segs


def _max_group_bytes(fmt: int, leafs_per_node: int,
                     max_digits: int = MAX_DIGITS) -> int:
    const_len = sum(len(v) for kind, v, _ in _group_segments(fmt, leafs_per_node)
                    if kind == "const")
    n_digit_segs = sum(1 for kind, _, _ in _group_segments(fmt, leafs_per_node)
                       if kind == "digits")
    return const_len + n_digit_segs * max_digits


def leaf_hash_device(comps_u32, leafs_per_node: int, fmt: int,
                     max_digits: int = MAX_DIGITS, use_pallas=None):
    """comps_u32: (n_elems, comps, 2) uint32 [lo, hi] component words.
    Returns (n_groups, 8) uint32 digests (big-endian words).

    ``max_digits``: decimal-digit bound per component — 20 for u64 fields
    (Goldilocks), 10 for u32 fields (BabyBear: p < 2^31). Smaller bounds
    shrink the digit ladder, the placement loops AND the preimage buffer.

    ``use_pallas``: None = auto (sha256_pallas.enabled() + shape gate);
    False forces the XLA compression — used by the sharded tree builder,
    where pallas_call under shard_map is not hardware-validated on real
    multi-chip meshes (single-chip probes don't cover that lowering)."""
    comps = {0: 1, 1: 2, 2: 4}[fmt]
    n_elems = comps_u32.shape[0]
    assert n_elems % leafs_per_node == 0
    n_groups = n_elems // leafs_per_node
    k = leafs_per_node

    # digits per (group, elem-in-group, comp), packed 4-bit LSB-first
    lo = comps_u32[..., 0].reshape(n_groups, k, comps)
    hi = comps_u32[..., 1].reshape(n_groups, k, comps)
    nib, dlen = u64_digit_nibbles(lo, hi, max_digits)  # (g,k,c,nw), (g,k,c)
    nw = nib.shape[-1]

    segs = _group_segments(fmt, k)
    B = _max_group_bytes(fmt, k, max_digits)
    nseg = len(segs)

    # per-segment lengths -> (g, nseg)
    seg_lens = []
    for kind, v, e in segs:
        if kind == "const":
            seg_lens.append(jnp.full((n_groups,), len(v), jnp.int32))
        else:
            seg_lens.append(dlen[:, e, v].astype(jnp.int32))
    seg_len = jnp.stack(seg_lens, axis=1)
    starts = jnp.cumsum(seg_len, axis=1) - seg_len          # (g, nseg)
    total_len = jnp.sum(seg_len, axis=1)                    # (g,)

    # static per-segment position bounds: segment s can only occupy
    # [min_start_s, max_start_s + max_len_s); every placement pass below
    # runs on that WINDOW, not the full B-wide buffer (the windows sum to
    # ~1.5x B instead of nseg x B — most of the old placement cost)
    min_starts, max_starts, mn, mx = [], [], 0, 0
    for kind, v, e in segs:
        min_starts.append(mn)
        max_starts.append(mx)
        step = len(v) if kind == "const" else 1
        mn += step
        mx += len(v) if kind == "const" else max_digits
    min_total = mn                                          # all-1-digit case
    assert mx == B

    out = jnp.zeros((n_groups, B), jnp.uint8)
    for s, (kind, v, e) in enumerate(segs):
        a = min_starts[s]
        b = min(max_starts[s] + (len(v) if kind == "const" else max_digits),
                B)
        tpos = jnp.arange(a, b, dtype=jnp.int32)[None, :]   # (1, W)
        win = out[:, a:b]
        s0 = starts[:, s : s + 1]                           # (g, 1)
        ln = seg_len[:, s : s + 1]
        inseg = (tpos >= s0) & (tpos < s0 + ln)
        off = tpos - s0                                     # (g, W)
        # NOTE: broadcast-compare selection, NOT take_along_axis — per-row
        # gathers on the minor axis are pathologically slow on TPU (~200x
        # for this kernel).
        if kind == "const":
            for i, byte_val in enumerate(v):
                win = jnp.where(inseg & (off == i), jnp.uint8(byte_val), win)
        else:
            # digit chars MSB-first: digit index = len-1-off (LSB-first
            # store). ONE pass: select the nibble word (nw <= 3), then a
            # per-lane variable shift extracts the digit — replaces the
            # old max_digits-way one-hot chain over the full buffer.
            didx = jnp.clip(ln - 1 - off, 0, max_digits - 1)  # (g, W)
            wsel = jnp.broadcast_to(nib[:, e, v, 0:1], didx.shape)
            for wi in range(1, nw):
                wsel = jnp.where((didx >> 3) == wi,
                                 nib[:, e, v, wi:wi + 1], wsel)
            digit = (wsel >> ((didx & 7) << 2).astype(jnp.uint32)) \
                & jnp.uint32(15)
            win = jnp.where(inseg, (digit + 48).astype(jnp.uint8), win)
        out = out.at[:, a:b].set(win)

    # SHA-256 padding: 0x80 at total_len; 64-bit BE bit length at block end
    max_blocks = (B + 8) // 64 + 1
    PB = max_blocks * 64
    if PB > B:
        out = jnp.concatenate(
            [out, jnp.zeros((n_groups, PB - B), jnp.uint8)], axis=1
        )
    # 0x80 terminator: total_len is in [min_total, B] — windowed pass
    tb = B + 1
    tpos = jnp.arange(min_total, tb, dtype=jnp.int32)[None, :]
    win = jnp.where(tpos == total_len[:, None], jnp.uint8(0x80),
                    out[:, min_total:tb])
    out = out.at[:, min_total:tb].set(win)
    last_block = (total_len + 8) // 64                      # (g,)
    bitlen = (total_len.astype(jnp.uint32) * 8)
    # bit length fits in 32 bits; bytes PB-4.. of the last active block.
    # last_block spans a static range — window the length-byte passes too
    lb_min = (min_total + 8) // 64
    lb_max = (B + 8) // 64
    wa, wb = lb_min * 64 + 56, lb_max * 64 + 64
    bpos = jnp.arange(wa, wb, dtype=jnp.int32)[None, :]
    win = out[:, wa:wb]
    len_base = last_block * 64 + 56
    for j in range(8):
        shift = (7 - j) * 8  # static python int
        if shift >= 32:
            continue  # bit length < 2^32; high bytes stay zero
        val = ((bitlen >> jnp.uint32(shift)) & jnp.uint32(0xFF)).astype(jnp.uint8)
        win = jnp.where(bpos == (len_base + j)[:, None], val[:, None], win)
    out = out.at[:, wa:wb].set(win)

    # bytes -> (g, blocks, 16) BE words
    w = out.reshape(n_groups, max_blocks, 16, 4).astype(jnp.uint32)
    words = (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]
    active = jnp.arange(max_blocks, dtype=jnp.int32)[None, :] <= last_block[:, None]

    # wide batches take the Pallas VMEM compression (digest-identical; the
    # XLA path streams a (64, lanes) schedule buffer through HBM per block
    # — the masked variant of the same hardware-validated kernel as the
    # binary row hash). Gate read at TRACE time like index_tree.
    from . import sha256_pallas as sp

    if use_pallas is None:
        use_pallas = sp.enabled()
    if use_pallas and n_groups % sp.MIN_LANES == 0 \
            and n_groups >= sp.MIN_LANES:
        digests_t = sp.sha256_masked_tr(
            words.reshape(n_groups, -1).T,
            active.astype(jnp.uint32).T,
            interpret=not sp._on_tpu(),
        )
        return digests_t.T
    return sha256_blocks(words, active)


leaf_hash_device_jit = jax.jit(leaf_hash_device, static_argnums=(1, 2, 3))
