"""Batched multi-polynomial FRI over wide-arity Merkle trees (fast mode).

The reference protocol (src/fri.rs) commits ONE polynomial per FRI instance
over fan-in-2 trees with value-searched openings — replicated bit-exactly in
fri/fri.py + stark/engine.py. This module is the OPT-IN non-parity mode from
BASELINE.md ("2^20-row trace, batched multi-poly FRI, 4/8-ary Merkle"): the
production-style protocol that amortizes one FRI across B polynomials.

Protocol (standard batched FRI):
  1. LDE all B polynomials to the size-N evaluation domain (one batched
     component NTT) and commit them ROW-WISE in a single wide-arity Merkle
     tree (commit/index_tree.py): leaf i = the B values at domain index i.
  2. Squeeze rho; the batch polynomial is g = sum_j rho^j f_j (one device
     mix). g's layer-0 codeword needs NO separate commitment — the verifier
     recomputes g(x) at any queried index from the batch tree's row.
  3. Fold layers with per-layer challenges alpha_r (coefficient-space
     even/odd fold, ops/poly_device.py fold_even_odd — the same kernel the
     parity engine uses), committing each intermediate codeword, until the
     coefficient tail fits in the clear.
  4. Queries are BY INDEX (no value-search quirk): for each sampled index
     the verifier checks the batch row against rho, then walks the fold
     chain layer_{r+1}(x^2) == (u+v)/2 + alpha_r*(u-v)/(2x) down to the
     plaintext tail.

Everything heavy (NTTs, folds, row hashing, tree levels) runs on device;
the verifier is pure host (hashlib + host field ops) and touches only
Q * log N scalars.

Soundness: per query, each fold halves degree; the batch check binds all B
polynomials to g. Challenges derive from a ratcheted SHA-256 transcript
(FastTranscript) — domain-separated, not the parity nimue sponge.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.index_tree import IndexMerklePath, IndexMerkleTree
from ..ops.ntt_device import get_ntt_fns
from ..ops.poly_device import fold_even_odd, mix_columns
from ..ops.registry import get_kernels


# --------------------------------------------------------------- transcript
class FastTranscript:
    """Ratcheted SHA-256 transcript (absorb / squeeze, domain-separated)."""

    def __init__(self, label: bytes):
        self._state = hashlib.sha256(b"ministark-fast-v1/" + label).digest()

    def absorb(self, data: bytes):
        self._state = hashlib.sha256(self._state + b"\x01" + data).digest()

    def challenge_bytes(self, n: int) -> bytes:
        out = b""
        i = 0
        while len(out) < n:
            out += hashlib.sha256(
                self._state + b"\x02" + i.to_bytes(8, "little")
            ).digest()
            i += 1
        self._state = hashlib.sha256(self._state + b"\x03").digest()
        return out[:n]

    def challenge_scalar(self, field):
        d = field.extension_degree
        raw = self.challenge_bytes(16 * d)
        prime = field
        while prime.extension_degree > 1:
            prime = prime.base
        comps = tuple(
            int.from_bytes(raw[16 * i : 16 * (i + 1)], "little") % prime.p
            for i in range(d)
        )
        return field.from_base_coeffs(comps) if d > 1 else comps[0]

    def challenge_indices(self, count: int, bound: int) -> List[int]:
        raw = self.challenge_bytes(8 * count)
        return [
            int.from_bytes(raw[8 * i : 8 * (i + 1)], "little") % bound
            for i in range(count)
        ]


# --------------------------------------------------------------- config
@dataclass
class BatchedFriConfig:
    """``field`` is the (extension) field the polynomials live in."""

    field: object
    blowup: int = 2
    queries: int = 32
    arity: int = 4
    final_len: int = 32  # ship the tail in the clear at this coeff length

    def __post_init__(self):
        assert self.blowup >= 2 and self.blowup & (self.blowup - 1) == 0
        assert self.arity >= 2 and self.arity & (self.arity - 1) == 0
        assert self.final_len >= 1 and self.final_len & (self.final_len - 1) == 0
        assert self.queries >= 1


@dataclass
class BatchedFriResult:
    """Truthy verification result carrying the authenticated query rows
    (index, row values at idx, row values at idx + N/2) for outer protocols
    (stark/fast.py) to impose their own row relations."""

    rows: List[Tuple[int, List, List]]

    def __bool__(self) -> bool:
        return True


@dataclass
class BatchedFriProof:
    b: int                      # number of batched polynomials
    n: int                      # per-polynomial coefficient length
    batch_root: bytes
    layer_roots: List[bytes]    # layers 1..R-1
    final_coeffs: List          # layer R coefficients, in the clear
    batch_openings: List[Tuple[IndexMerklePath, IndexMerklePath]]   # per query
    layer_openings: List[List[Tuple[IndexMerklePath, IndexMerklePath]]]


def _scalar_bytes(field, s) -> bytes:
    return b"".join(
        int(c).to_bytes(8, "little") for c in (
            field.base_coeffs(s) if field.extension_degree > 1 else (s,)
        )
    )


def _row_values(field, row: bytes, count: int) -> List:
    """Decode a tree row (count field values as LE u64 components)."""
    d = field.extension_degree
    vals = []
    for j in range(count):
        comps = tuple(
            int.from_bytes(row[8 * (j * d + i) : 8 * (j * d + i + 1)], "little")
            for i in range(d)
        )
        vals.append(field.from_base_coeffs(comps) if d > 1 else comps[0])
    return vals


# --------------------------------------------------------------- device ops
@partial(jax.jit, static_argnums=0)
def _rows_to_comps_jit(limbed: bool, rows):
    """(N, ..., *elem) packed rows -> (N, C, 2) u32 [lo, hi] for hashing."""
    n = rows.shape[0]
    if limbed:          # trailing axis is already the (lo, hi) u32 pair
        return rows.reshape(n, -1, 2)
    flat = rows.reshape(n, -1)
    return jnp.stack([flat, jnp.zeros_like(flat)], axis=-1)


_fold_jit = jax.jit(fold_even_odd, static_argnums=0)
_mix_jit = jax.jit(mix_columns, static_argnums=0)


class BatchedFri:
    def __init__(self, config: BatchedFriConfig, mesh=None,
                 mesh_axis: str = "shards"):
        """``mesh``: optional jax.sharding.Mesh — LDE NTTs and Merkle
        builds shard over it (proof bytes identical to single-device)."""
        self.cfg = config
        self.ext = config.field
        self.ke = get_kernels(self.ext)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # packed ext layout = (first elem axis) prime components, so the
        # component NTT runs over the PRIME field (bb fp4's .base is fp2)
        self._ntt_base = self._prime(self.ext)

    @staticmethod
    def _prime(field):
        while field.extension_degree > 1:
            field = field.base
        return field

    # -- batched component NTT: ext NTT = base NTT per base component
    def _fft_batched(self, coeffs, domain_size: int):
        """coeffs: (..., m, *ke.elem) packed ext, m <= domain_size."""
        a = coeffs
        m = a.shape[-1 - len(self.ke.elem_axes)]
        lead = a.ndim - 1 - len(self.ke.elem_axes)
        if m < domain_size:
            pad_shape = a.shape[:lead] + (domain_size - m,) + a.shape[lead + 1:]
            a = jnp.concatenate(
                [a, jnp.zeros(pad_shape, dtype=jnp.uint32)], axis=lead
            )
        comp = jnp.moveaxis(a, lead + 1, lead)      # (..., comps, N, *base_elem)
        flat = comp.reshape((-1,) + comp.shape[lead + 1:])
        fft = self._fft_fn(domain_size)
        ev = fft(flat).reshape(comp.shape)
        return jnp.moveaxis(ev, lead, lead + 1)     # (..., N, *ke.elem)

    def _fft_fn(self, domain_size: int):
        if self.mesh is not None:
            from ..parallel.ntt_sharded import can_shard, get_sharded_ntt_fns

            if can_shard(domain_size, self.mesh.shape[self.mesh_axis]):
                return get_sharded_ntt_fns(
                    self._ntt_base, domain_size, self.mesh, self.mesh_axis
                )[0]
        return get_ntt_fns(self._ntt_base, domain_size)[0]

    def _limbed(self) -> bool:
        kb = get_kernels(self._ntt_base)
        return kb.elem_axes == (2,)

    def _tree(self, rows) -> IndexMerkleTree:
        return IndexMerkleTree(
            _rows_to_comps_jit(self._limbed(), rows), self.cfg.arity,
            mesh=self.mesh, mesh_axis=self.mesh_axis,
        )

    def _transcript(self, b: int, n: int) -> FastTranscript:
        tr = FastTranscript(b"batched-fri")
        tr.absorb(
            b"%d/%d/%d/%d/%d/%d"
            % (b, n, self.cfg.blowup, self.cfg.arity, self.cfg.queries,
               self.cfg.final_len)
        )
        return tr

    def _n_folds(self, n: int) -> int:
        assert n > self.cfg.final_len, "nothing to fold — ship the polys"
        return (n // self.cfg.final_len).bit_length() - 1

    # ------------------------------------------------------------- prove
    def commit(self, polys) -> IndexMerkleTree:
        """The batched commitment: LDE all B polynomials (one batched
        component NTT) + one wide-arity row tree. Benchmarked standalone
        (BASELINE config 4)."""
        N = self.cfg.blowup * int(polys.shape[1])
        evals0 = self._fft_batched(polys, N)        # (B, N, *elem)
        return self._tree(jnp.moveaxis(evals0, 0, 1))

    def prove(self, polys, transcript: FastTranscript = None) -> BatchedFriProof:
        """polys: packed (B, n, *ke.elem) ext coefficient array (device).

        ``transcript``: bind the FRI into an outer protocol's transcript
        (stark/fast.py); a fresh one is derived when omitted."""
        cfg = self.cfg
        ext, ke = self.ext, self.ke
        b, n = int(polys.shape[0]), int(polys.shape[1])
        assert n & (n - 1) == 0
        N = cfg.blowup * n
        R = self._n_folds(n)
        tr = transcript if transcript is not None else self._transcript(b, n)

        batch_tree = self.commit(polys)
        tr.absorb(batch_tree.root())

        rho = tr.challenge_scalar(ext)
        weights = jnp.asarray(ke.pack([ext.pow(rho, j) for j in range(b)]))
        cur = _mix_jit(ke, polys, weights)          # g coeffs (n, *elem)

        layer_trees: List[IndexMerkleTree] = []
        alphas = []
        for r in range(R):
            alpha = tr.challenge_scalar(ext)
            alphas.append(alpha)
            cur = _fold_jit(ke, cur, jnp.asarray(ke.pack_scalar(alpha)))
            if r < R - 1:
                cw = self._fft_batched(cur, N >> (r + 1))
                t = self._tree(cw)
                layer_trees.append(t)
                tr.absorb(t.root())

        final_coeffs = ke.unpack(np.asarray(cur))
        tr.absorb(b"".join(_scalar_bytes(ext, s) for s in final_coeffs))

        idxs = tr.challenge_indices(cfg.queries, N // 2)

        batch_openings = self._open_pairs(batch_tree, [(i, i + N // 2) for i in idxs])
        layer_openings: List[List] = [[] for _ in idxs]
        for r, t in enumerate(layer_trees, start=1):
            Nr = N >> r
            pairs = []
            for i in idxs:
                ir = i % (Nr // 2)
                pairs.append((ir, ir + Nr // 2))
            opened = self._open_pairs(t, pairs)
            for qi, pair in enumerate(opened):
                layer_openings[qi].append(pair)

        return BatchedFriProof(
            b=b, n=n, batch_root=batch_tree.root(),
            layer_roots=[t.root() for t in layer_trees],
            final_coeffs=final_coeffs,
            batch_openings=batch_openings, layer_openings=layer_openings,
        )

    @staticmethod
    def _open_pairs(tree: IndexMerkleTree, pairs):
        flat = [i for p in pairs for i in p]
        opened = tree.open_many(flat)
        return [(opened[2 * q], opened[2 * q + 1]) for q in range(len(pairs))]

    # ------------------------------------------------------------- verify
    def verify(self, proof: BatchedFriProof,
               transcript: FastTranscript = None) -> "BatchedFriResult":
        cfg = self.cfg
        ext = self.ext
        b, n = proof.b, proof.n
        N = cfg.blowup * n
        R = self._n_folds(n)
        assert len(proof.layer_roots) == R - 1
        assert len(proof.final_coeffs) <= n >> R

        tr = transcript if transcript is not None else self._transcript(b, n)
        tr.absorb(proof.batch_root)
        rho = tr.challenge_scalar(ext)
        alphas = []
        for r in range(R):
            alphas.append(tr.challenge_scalar(ext))
            if r < R - 1:
                tr.absorb(proof.layer_roots[r])
        tr.absorb(b"".join(_scalar_bytes(ext, s) for s in proof.final_coeffs))
        idxs = tr.challenge_indices(cfg.queries, N // 2)

        half = ext.inv(ext.from_int(2))
        rho_pows = [ext.pow(rho, j) for j in range(b)]
        w0 = ext.get_root_of_unity(N)

        rows = []
        for qi, idx in enumerate(idxs):
            pu, pv = proof.batch_openings[qi]
            assert IndexMerkleTree.verify_path(
                proof.batch_root, N, cfg.arity, idx, pu
            ), "batch path u"
            assert IndexMerkleTree.verify_path(
                proof.batch_root, N, cfg.arity, idx + N // 2, pv
            ), "batch path v"
            fu = _row_values(ext, pu.row, b)
            fv = _row_values(ext, pv.row, b)
            u = v = ext.zero()
            for j in range(b):
                u = ext.add(u, ext.mul(rho_pows[j], fu[j]))
                v = ext.add(v, ext.mul(rho_pows[j], fv[j]))

            pos = idx                 # position of u in the current layer
            x = ext.pow(w0, idx)
            for r in range(R):
                Nr = N >> r
                # fold: layer_{r+1}(x^2) = (u+v)/2 + alpha*(u-v)/(2x)
                even = ext.mul(ext.add(u, v), half)
                odd = ext.mul(ext.mul(ext.sub(u, v), half), ext.inv(x))
                expected = ext.add(even, ext.mul(alphas[r], odd))
                nxt_pos = pos              # i_{r-1} indexes layer r+1 directly
                x = ext.mul(x, x)
                if r < R - 1:
                    Nn = Nr // 2
                    ir = nxt_pos % (Nn // 2)
                    pu, pv = proof.layer_openings[qi][r]
                    root = proof.layer_roots[r]
                    assert IndexMerkleTree.verify_path(
                        root, Nn, cfg.arity, ir, pu
                    ), f"layer {r+1} path u"
                    assert IndexMerkleTree.verify_path(
                        root, Nn, cfg.arity, ir + Nn // 2, pv
                    ), f"layer {r+1} path v"
                    u = _row_values(ext, pu.row, 1)[0]
                    v = _row_values(ext, pv.row, 1)[0]
                    got = u if nxt_pos < Nn // 2 else v
                    assert got == expected, f"fold mismatch at layer {r+1}"
                    if nxt_pos >= Nn // 2:
                        # u corresponds to ir; adjust x to w_{r+1}^{ir}
                        x = ext.neg(x)
                    pos = ir
                else:
                    # evaluate the plaintext tail at x (already squared)
                    acc = ext.zero()
                    for c in reversed(proof.final_coeffs):
                        acc = ext.add(ext.mul(acc, x), c)
                    assert acc == expected, "final layer mismatch"
            rows.append((idx, fu, fv))
        return BatchedFriResult(rows=rows)
