"""Break the fmt-1 FRI-round tree build (2^21 leaves) into its stages on
real TPU: digit extraction, byte placement, masked-SHA compression, inner
levels — all slope-timed (bench_kernels._time_chained).

VERDICT r4 item 4: the one-hot byte placement feeding the masked SHA
kernel is believed to carry the remaining ~2x of the 110 ms tree build.
This probe measures it directly before any rewrite.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_kernels import _time_chained
from ministark_tpu.fields import GOLDILOCKS_FP
from ministark_tpu.ops import leaf_hash as lh
from ministark_tpu.ops import sha256_pallas as sp

N = int(os.environ.get("LH_N", str(1 << 21)))     # leaves (ext elements)
K = 2                                              # leafs_per_node (FRI tree)
FMT = 1                                            # QuadExtField Display
MD = 20

rng = np.random.default_rng(11)
v = rng.integers(0, GOLDILOCKS_FP.p, size=(N, 2), dtype=np.uint64)
comps = jnp.asarray(np.stack(
    [(v & 0xFFFFFFFF).astype(np.uint32), (v >> 32).astype(np.uint32)],
    axis=-1))                                      # (N, 2, 2)

n_groups = N // K
print(f"N={N} groups={n_groups}", flush=True)

results = {}


def chain(build):
    def body(u):
        d = build(u)
        return u.at[0, 0, 0].set(d.reshape(-1)[0])
    return body


# --- full leaf hash (placement + masked SHA) ---
full = jax.jit(lambda c: lh.leaf_hash_device(c, K, FMT, MD))
results["leaf_hash_full"] = _time_chained(chain(full), comps, k1=2, k2=8)
print("leaf_hash_full:", results["leaf_hash_full"], flush=True)


# --- placement only: everything up to (words, active), cheap projection ---
def placement_only(c):
    import ministark_tpu.ops.leaf_hash as L
    comps_n = {0: 1, 1: 2, 2: 4}[FMT]
    n_elems = c.shape[0]
    g = n_elems // K
    lo = c[..., 0].reshape(g, K, comps_n)
    hi = c[..., 1].reshape(g, K, comps_n)
    dig, dlen = L.u64_digits(lo, hi, MD)
    segs = L._group_segments(FMT, K)
    B = L._max_group_bytes(FMT, K, MD)
    seg_lens = []
    for kind, vv, e in segs:
        if kind == "const":
            seg_lens.append(jnp.full((g,), len(vv), jnp.int32))
        else:
            seg_lens.append(dlen[:, e, vv].astype(jnp.int32))
    seg_len = jnp.stack(seg_lens, axis=1)
    starts = jnp.cumsum(seg_len, axis=1) - seg_len
    total_len = jnp.sum(seg_len, axis=1)
    tpos = jnp.arange(B, dtype=jnp.int32)[None, :]
    out = jnp.zeros((g, B), jnp.uint8)
    for s, (kind, vv, e) in enumerate(segs):
        s0 = starts[:, s: s + 1]
        ln = seg_len[:, s: s + 1]
        inseg = (tpos >= s0) & (tpos < s0 + ln)
        off = tpos - s0
        if kind == "const":
            for i, byte_val in enumerate(vv):
                out = jnp.where(inseg & (off == i), jnp.uint8(byte_val), out)
        else:
            didx = ln - 1 - off
            for j in range(MD):
                d_j = dig[:, e, vv, j].astype(jnp.uint8) + jnp.uint8(48)
                out = jnp.where(inseg & (didx == j), d_j[:, None], out)
    return out


place_jit = jax.jit(placement_only)
results["placement_only"] = _time_chained(chain(place_jit), comps, k1=2, k2=8)
print("placement_only:", results["placement_only"], flush=True)


# --- digit extraction only ---
def digits_only(c):
    comps_n = {0: 1, 1: 2, 2: 4}[FMT]
    g = c.shape[0] // K
    lo = c[..., 0].reshape(g, K, comps_n)
    hi = c[..., 1].reshape(g, K, comps_n)
    dig, dlen = lh.u64_digits(lo, hi, MD)
    return dig.astype(jnp.uint32) + dlen[..., None].astype(jnp.uint32)


results["digits_only"] = _time_chained(chain(jax.jit(digits_only)), comps,
                                       k1=2, k2=8)
print("digits_only:", results["digits_only"], flush=True)


# --- masked SHA only (pre-built words/active) ---
B = lh._max_group_bytes(FMT, K, MD)
max_blocks = (B + 8) // 64 + 1
words = jnp.asarray(rng.integers(
    0, 1 << 32, size=(n_groups, max_blocks * 16), dtype=np.uint64
).astype(np.uint32))
active = jnp.asarray(
    (rng.integers(0, 2, size=(n_groups, max_blocks)) + 1 > 0)
    .astype(np.uint32))


def sha_only(w):
    return sp.sha256_masked_tr(w.T, active.T, interpret=not sp._on_tpu()).T


def sha_chain(w):
    d = sha_only(w)
    return w.at[0, 0].set(d[0, 0])


results["masked_sha_only"] = _time_chained(sha_chain, words, k1=2, k2=8)
print("masked_sha_only:", results["masked_sha_only"], flush=True)


# --- full parity tree build (leaf hash + inner levels), the 110 ms number ---
from ministark_tpu.ops.sha256 import merkle_inner_levels_device


def tree(c):
    leaves = lh.leaf_hash_device(c, K, FMT, MD)
    return merkle_inner_levels_device(leaves, 2)


results["tree_full"] = _time_chained(chain(jax.jit(tree)), comps, k1=2, k2=6)
print("tree_full:", results["tree_full"], flush=True)

for k, t in results.items():
    print(f"{k}: {None if t is None else round(t * 1e3, 3)} ms", flush=True)
