"""STIR low-degree test (fast mode): shift-and-quotient FRI with
geometrically decreasing query counts.

The reference's own roadmap lists STIR as an unchecked TODO
(/root/reference/README.md:36-38); this is the TPU-native realization on the
fast-mode commitment stack (index trees, FastTranscript, batched component
NTTs). Construction follows Arnon-Chiesa-Fenzi-Yogev 2024 ("STIR:
Reed-Solomon proximity testing with fewer queries"):

Per round, instead of FRI's fold-only step (which keeps the rate fixed and
so needs the full ~lambda/log(1/rho) queries at EVERY round), STIR re-evaluates
the k-fold of the current function on a domain only HALF the size — the rate
improves by 2/k per round, so round i needs only ~lambda/log2(1/rho_i) queries:
query counts decay geometrically and the proof is dominated by the first
round alone.

Round i (functions f_0..f_R, committed evaluations C_0..C_R):
  1. fold randomness r:   g_i = Fold_k(f_{i-1}, r)  (coefficient-space:
     sum_j r^j f_j where f(x) = sum_j x^j f_j(x^k) — ops/poly_device
     fold_factor, one strided weighted sum on device);
  2. commit C_i = evals of g_i over L_i, a coset of size N_i = N_{i-1}/2
     (offsets chosen per round so L_i is disjoint from the quotient point
     set, asserted at schedule build);
  3. out-of-domain sample z_i, answer beta_i = g_i(z_i);
  4. stir queries: t_{i-1} row indices into C_{i-1}'s k-coset rows; the
     VERIFIER computes v_j = Fold_k(f_{i-1}, r)(y_j) itself from the opened
     rows (size-k inverse DFT), so a committed g_i that disagrees with the
     true fold gets quotiented into a far-from-low-degree f_i;
  5. next function by quotient + degree correction:
       f_i = DegCor(Quotient(g_i, G_i), r_cor, d_i),
     G_i = {(z_i, beta_i)} U {(y_j, v_j)};  Quotient(g, G) =
     (g - Ans_G)/V_G with Ans_G the interpolation through G and V_G its
     vanishing polynomial (|G_i| on-device synthetic divisions,
     ops/poly_device synth_div_suffix); DegCor multiplies by
     sum_{l<=e} (r_cor x)^l to restore degree d_i (e = |G_i| shifted adds).
Final: p = Fold_k(f_R, r_R) ships in the clear; t_R spot checks bind it to
C_R through the same quotient relation.

The verifier is pure host (hashlib + host field ops) and touches
sum_i t_i * k scalars — with k=4, blowup=2, lambda=32 at n=2^20 that is
~80 opened rows TOTAL vs ~320 for the batched FRI at the same security.

Like fri/batched.py this is NOT a parity surface; the reference has no STIR.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.index_tree import IndexMerklePath, IndexMerkleTree
from ..ops.poly_device import eval_many, fold_factor, synth_div_suffix
from ..ops.registry import get_kernels
from .batched import (
    BatchedFri,
    BatchedFriConfig,
    FastTranscript,
    _mix_jit,
    _row_values,
    _scalar_bytes,
)

_fold_factor_jit = jax.jit(fold_factor, static_argnums=(0, 3))


# --------------------------------------------------------------- config
@dataclass
class StirConfig:
    """``field`` is the (extension) field the polynomials live in."""

    field: object
    k: int = 4                 # per-round folding factor (>= 4: rate must improve)
    blowup: int = 2            # initial inverse rate
    security_bits: int = 32    # per-round query soundness target
    final_len: int = 32        # ship the final fold in the clear at this length
    arity: int = 4             # Merkle tree fan-in
    grinding_bits: int = 0     # PoW before each query sampling: buys
                               # grinding_bits of the target without queries

    def __post_init__(self):
        assert self.k in (4, 8, 16), "k must exceed the per-round domain shrink (2)"
        assert self.blowup >= 2 and self.blowup & (self.blowup - 1) == 0
        assert self.arity >= 2 and self.arity & (self.arity - 1) == 0
        assert self.final_len >= 1 and self.final_len & (self.final_len - 1) == 0
        assert self.security_bits >= 1
        assert 0 <= self.grinding_bits <= 32
        assert self.grinding_bits < self.security_bits


@dataclass
class StirResult:
    """Truthy verification result carrying the authenticated C_0 query rows
    for outer protocols (stark/fast.py) to impose their own row relations:
    per query, (index, vals) where vals[t][b] is polynomial b's value at
    coset point t of the queried row (same shape as BatchedFriResult)."""

    rows: List

    def __bool__(self) -> bool:
        return True


@dataclass
class StirProof:
    group_sizes: List[int]     # polynomials per C_0 commitment group
    n: int                     # per-polynomial coefficient length (d_0)
    group_roots: List[bytes]   # C_0: one coset-row tree per group
    round_roots: List[bytes]   # C_1 .. C_R
    betas: List                # R out-of-domain answers
    final_coeffs: List         # p = Fold_k(f_R, r_R), in the clear
    batch_openings: List[List[IndexMerklePath]]   # [query][group], idxs_0
    round_openings: List[List[IndexMerklePath]]   # [i-1][query]: C_i rows
    pow_nonces: List[bytes] = None                # per-query-phase grinding

    @property
    def b(self) -> int:
        return sum(self.group_sizes)

    def size_bytes(self, field) -> int:
        sc = 8 * field.extension_degree
        paths = [p for q in self.batch_openings for p in q]
        paths += [p for per_round in self.round_openings for p in per_round]
        return (
            32 * (len(self.group_roots) + len(self.round_roots))
            + sum(len(p.row) + sum(len(g) for g in p.groups) for p in paths)
            + sc * (len(self.betas) + len(self.final_coeffs))
        )


# ------------------------------------------------------------- host helpers
def _newton_interp(ext, pts):
    """Coefficients (low-to-high, len == len(pts)) of the unique polynomial
    through ``pts`` = [(x, y)] — Newton divided differences, O(m^2)."""
    m = len(pts)
    xs = [p[0] for p in pts]
    coef = [p[1] for p in pts]          # divided-difference table, in place
    for j in range(1, m):
        for i in range(m - 1, j - 1, -1):
            num = ext.sub(coef[i], coef[i - 1])
            den = ext.sub(xs[i], xs[i - j])
            coef[i] = ext.mul(num, ext.inv(den))
    # expand the Newton form sum_i coef[i] * prod_{l<i} (x - xs[l])
    out = [ext.zero()] * m
    basis = [ext.one()]                 # prod so far, low-to-high
    for i in range(m):
        for d, c in enumerate(basis):
            out[d] = ext.add(out[d], ext.mul(coef[i], c))
        if i + 1 < m:
            nxt = [ext.zero()] * (len(basis) + 1)
            negx = ext.neg(xs[i])
            for d, c in enumerate(basis):
                nxt[d] = ext.add(nxt[d], ext.mul(c, negx))
                nxt[d + 1] = ext.add(nxt[d + 1], c)
            basis = nxt
    return out


def _eval_poly(ext, coeffs, x):
    acc = ext.zero()
    for c in reversed(coeffs):
        acc = ext.add(ext.mul(acc, x), c)
    return acc


def _geom_eval(ext, r, x, e):
    """sum_{l=0}^{e} (r*x)^l."""
    rx = ext.mul(r, x)
    acc = ext.one()
    term = ext.one()
    for _ in range(e):
        term = ext.mul(term, rx)
        acc = ext.add(acc, term)
    return acc


# ------------------------------------------------------------- device ops
@partial(jax.jit, static_argnums=0)
def _eval_points_jit(ke, coeffs, pts):
    """Evaluate ONE polynomial (n, *elem) at many points (m, *elem)."""

    def one(pt):
        return eval_many(ke, coeffs[None], pt)[0]

    return jax.vmap(one)(pts)


@partial(jax.jit, static_argnums=0)
def _quot_degcor_jit(ke, coeffs, ans, roots, scales, rcor_pows):
    """f = DegCor(Quotient(g, G), r_cor) on device, fixed length d:

    subtract Ans_G from the head, divide by each (x - root) with the
    suffix-scan synthetic division (fori over the |G| roots, re-padded to
    d each step), then multiply by sum_l (r_cor x)^l as |G|+1 shifted adds.

    ans/roots/scales: (m, *elem); scales[j] = roots[j]^-1;
    rcor_pows: (m+1, *elem) packed powers of r_cor."""
    d = coeffs.shape[0]
    m = roots.shape[0]
    head = ke.sub(coeffs[: ans.shape[0]], ans)
    cur = jnp.concatenate([head, coeffs[ans.shape[0]:]], axis=0)

    zpad = jnp.zeros((1,) + tuple(cur.shape[1:]), dtype=jnp.uint32)

    def div_body(j, c):
        q = synth_div_suffix(ke, c, roots[j], scales[j])
        return jnp.concatenate([q, zpad], axis=0)

    cur = jax.lax.fori_loop(0, m, div_body, cur)

    idx = jnp.arange(d)
    zeros = jnp.zeros_like(cur)

    def cor_body(l, o):
        shifted = jnp.roll(cur, l, axis=0)
        term = ke.mul(shifted, jnp.broadcast_to(rcor_pows[l][None], cur.shape))
        keep = (idx >= l).reshape((d,) + (1,) * (cur.ndim - 1))
        return ke.add(o, jnp.where(keep, term, zeros))

    return jax.lax.fori_loop(0, rcor_pows.shape[0], cor_body, zeros)


# round-schedule cache keyed by every parameter _schedule reads; holds only
# plain int tuples (never protocol instances or meshes)
_SCHEDULE_CACHE: dict = {}


# --------------------------------------------------------------- protocol
class Stir:
    def __init__(self, config: StirConfig, mesh=None, mesh_axis: str = "shards"):
        self.cfg = config
        self.ext = config.field
        self.ke = get_kernels(self.ext)
        # reuse the fast-mode commitment helpers (component NTT, coset rows,
        # fused index-tree build, optional mesh sharding)
        self._bf = BatchedFri(
            BatchedFriConfig(
                config.field, blowup=config.blowup, queries=1,
                arity=config.arity, fold_factor=config.k, final_len=1,
            ),
            mesh=mesh, mesh_axis=mesh_axis,
        )
        self.prime = self._bf._ntt_base
        self.kb = get_kernels(self.prime)

    # -------------------------------------------------------- schedule
    def _schedule(self, n: int):
        """(d, N, off, t, R): degrees d_i, domain sizes N_i, coset offsets
        off_i, per-function query counts t_i, for rounds i = 0..R.

        Cached module-level by the parameters it reads (an lru_cache on the
        method would pin every Stir instance — and its captured mesh — for
        process lifetime)."""
        cfg = self.cfg
        key = (self.prime.p, self.prime.generator, cfg.k, cfg.blowup,
               cfg.security_bits, cfg.grinding_bits, cfg.final_len, n)
        cached = _SCHEDULE_CACHE.get(key)
        if cached is not None:
            return cached
        k = cfg.k
        p = self.prime.p
        g = self.prime.generator
        d = [n]
        N = [cfg.blowup * n]
        while d[-1] // k > cfg.final_len:
            d.append(d[-1] // k)
            N.append(N[-1] // 2)
        R = len(d) - 1
        off = [pow(g, i + 1, p) for i in range(R + 1)]
        for i in range(1, R + 1):
            # L_i must avoid the round-i quotient points L_{i-1}^k: cosets
            # a*H_i and b*H' (H' subset H_i) intersect iff (a/b)^{N_i} == 1
            c = off[i] * pow(pow(off[i - 1], k, p), p - 2, p) % p
            assert pow(c, N[i], p) != 1, "coset offsets collide — pick new ones"
        t = []
        lam = cfg.security_bits - cfg.grinding_bits
        for i in range(R + 1):
            rate_log = (N[i] // d[i]).bit_length() - 1
            t.append(min(max(1, -(-lam // rate_log)), N[i] // k))
        assert d[R] >= k and N[R] >= k
        for i in range(1, R + 1):
            assert t[i - 1] + 1 < d[i], (
                f"round {i}: |G|={t[i-1]+1} must stay below degree {d[i]}"
            )
        _SCHEDULE_CACHE[key] = (d, N, off, t, R)
        return d, N, off, t, R

    def _transcript(self, b: int, n: int) -> FastTranscript:
        tr = FastTranscript(b"stir")
        cfg = self.cfg
        tr.absorb(b"%d/%d/%d/%d/%d/%d/%d/%d" % (
            b, n, cfg.k, cfg.blowup, cfg.security_bits, cfg.final_len,
            cfg.arity, cfg.grinding_bits,
        ))
        return tr

    def _commit(self, coeffs_2d, N: int, offset: int) -> IndexMerkleTree:
        """coeffs (B, m, *elem) -> coset-row index tree over offset*<w_N>."""
        offp = jnp.asarray(self.kb.pack([offset])[0])
        ev = self._coset_fft_batched(coeffs_2d, N, offp)
        return self._bf._tree(self._bf._coset_rows(ev, self.cfg.k))

    def _coset_fft_batched(self, coeffs, domain_size: int, offp):
        """BatchedFri._fft_batched, but over the coset offset*<w_N>."""
        ke = self.ke
        a = coeffs
        lead = a.ndim - 1 - len(ke.elem_axes)
        m = a.shape[lead]
        if m < domain_size:
            pad_shape = a.shape[:lead] + (domain_size - m,) + a.shape[lead + 1:]
            a = jnp.concatenate(
                [a, jnp.zeros(pad_shape, dtype=jnp.uint32)], axis=lead
            )
        comp = jnp.moveaxis(a, lead + 1, lead)
        flat = comp.reshape((-1,) + comp.shape[lead + 1:])
        from ..parallel.ntt_sharded import select_ntt_fns

        coset_fft = select_ntt_fns(
            self.prime, domain_size, self._bf.mesh, self._bf.mesh_axis
        )[2]
        ev = coset_fft(flat, offp).reshape(comp.shape)
        return jnp.moveaxis(ev, lead, lead + 1)

    def _ood_ok(self, z) -> bool:
        """z must lie outside the prime field (domains and quotient points
        are prime-field cosets); negligible failure probability."""
        comps = self.ext.base_coeffs(z)
        return any(int(c) != 0 for c in comps[1:])

    @staticmethod
    def _dedupe(idxs: List[int]) -> List[int]:
        return sorted(set(idxs))

    # ----------------------------------------------------------- prove
    def commit(self, polys) -> IndexMerkleTree:
        """Commitment of one polynomial group over L_0 (coset-row tree).
        The CALLER absorbs the root into its transcript at the protocol
        point where the group is bound (stark/fast.py)."""
        n = int(polys.shape[1])
        d, N, off, t, R = self._schedule(n)
        return self._commit(polys, N[0], off[0])

    def binding_lde(self, ext_coeffs):
        """(N_0, k, evals over L_0) for outer-protocol row binding — same
        contract as BatchedFri.binding_lde, over THIS backend's coset."""
        n = int(ext_coeffs.shape[1])
        d, N, off, t, R = self._schedule(n)
        offp = jnp.asarray(self.kb.pack([off[0]])[0])
        return N[0], self.cfg.k, self._coset_fft_batched(ext_coeffs, N[0], offp)

    def prove(self, polys=None, transcript: FastTranscript = None,
              groups=None, trees=None) -> StirProof:
        """Standalone: ``prove(polys)`` — one group, committed and absorbed
        internally on a fresh transcript.

        Multi-group (outer protocols): ``prove(groups=[...], trees=[...],
        transcript=tr)`` — the caller committed each group via ``commit``
        and absorbed every root BEFORE any challenge; STIR continues from
        rho (same contract as BatchedFri.prove)."""
        cfg = self.cfg
        ext, ke = self.ext, self.ke
        k = cfg.k
        if groups is None:
            assert polys is not None
            groups = [polys]
        n = int(groups[0].shape[1])
        group_sizes = [int(g.shape[0]) for g in groups]
        b = sum(group_sizes)
        assert n & (n - 1) == 0
        assert all(int(g.shape[1]) == n for g in groups)
        d, N, off, t, R = self._schedule(n)
        if trees is None:
            assert transcript is None and len(groups) == 1
            tr = self._transcript(b, n)
            trees = [self.commit(groups[0])]
            tr.absorb(trees[0].root())
        else:
            assert transcript is not None and len(trees) == len(groups)
            tr = transcript

        rho = tr.challenge_scalar(ext)
        weights = jnp.asarray(ke.pack([ext.pow(rho, j) for j in range(b)]))
        allp = groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=0)
        cur = _mix_jit(ke, allp, weights)           # f_0 coeffs (n, *elem)

        round_trees: List[IndexMerkleTree] = []
        betas: List = []
        all_idxs: List[List[int]] = []
        pow_nonces: List[bytes] = []
        for i in range(1, R + 1):
            r = tr.challenge_scalar(ext)
            cur = _fold_factor_jit(ke, cur, jnp.asarray(ke.pack_scalar(r)), k)
            tree = self._commit(cur[None], N[i], off[i])
            round_trees.append(tree)
            tr.absorb(tree.root())

            z = tr.challenge_scalar(ext)
            assert self._ood_ok(z), "out-of-domain sample hit the prime field"
            beta_arr = np.asarray(
                _eval_points_jit(ke, cur, jnp.asarray(ke.pack_scalar(z))[None])
            )
            beta = ke.unpack(beta_arr)[0]
            betas.append(beta)
            tr.absorb(_scalar_bytes(ext, beta))

            pow_nonces.append(tr.grind(cfg.grinding_bits))
            idxs = self._dedupe(tr.challenge_indices(t[i - 1], N[i - 1] // k))
            all_idxs.append(idxs)
            r_cor = tr.challenge_scalar(ext)

            # quotient point set G_i: the honest g_i(y_j) equal the
            # verifier's fold values by construction
            w_prev = self.prime.get_root_of_unity(N[i - 1])
            ys = [
                ext.from_int(
                    pow(off[i - 1] * pow(int(w_prev), j, self.prime.p)
                        % self.prime.p, k, self.prime.p)
                )
                for j in idxs
            ]
            vs_arr = np.asarray(_eval_points_jit(
                ke, cur, jnp.asarray(np.stack([
                    np.asarray(ke.pack_scalar(y)) for y in ys
                ]))
            ))
            vs = ke.unpack(vs_arr)
            G = [(z, beta)] + list(zip(ys, vs))
            cur = self._apply_quot_degcor(cur, G, r_cor, d[i])

        r_fin = tr.challenge_scalar(ext)
        cur = _fold_factor_jit(ke, cur, jnp.asarray(ke.pack_scalar(r_fin)), k)
        final_coeffs = ke.unpack(np.asarray(cur[: d[R] // k]))
        tr.absorb(b"".join(_scalar_bytes(ext, s) for s in final_coeffs))
        pow_nonces.append(tr.grind(cfg.grinding_bits))
        idxs_fin = self._dedupe(tr.challenge_indices(t[R], N[R] // k))
        all_idxs.append(idxs_fin)

        per_group = [tree.open_many(all_idxs[0]) for tree in trees]
        batch_openings = [
            [per_group[g][qi] for g in range(len(trees))]
            for qi in range(len(all_idxs[0]))
        ]
        round_openings = [
            round_trees[i - 1].open_many(all_idxs[i]) for i in range(1, R + 1)
        ]
        return StirProof(
            group_sizes=group_sizes, n=n,
            group_roots=[tree.root() for tree in trees],
            round_roots=[tree.root() for tree in round_trees],
            betas=betas, final_coeffs=final_coeffs,
            batch_openings=batch_openings, round_openings=round_openings,
            pow_nonces=pow_nonces,
        )

    def _apply_quot_degcor(self, cur, G, r_cor, d_i: int):
        """cur (d_i, *elem) g_i coeffs -> f_i coeffs (device)."""
        ext, ke = self.ext, self.ke
        m = len(G)
        ans = _newton_interp(ext, G)
        pts = [x for (x, _) in G]
        ans_p = jnp.asarray(np.stack([np.asarray(ke.pack_scalar(c)) for c in ans]))
        roots_p = jnp.asarray(np.stack([np.asarray(ke.pack_scalar(x)) for x in pts]))
        scales_p = jnp.asarray(np.stack([
            np.asarray(ke.pack_scalar(ext.inv(x))) for x in pts
        ]))
        rpows_p = jnp.asarray(np.stack([
            np.asarray(ke.pack_scalar(ext.pow(r_cor, l))) for l in range(m + 1)
        ]))
        return _quot_degcor_jit(ke, cur, ans_p, roots_p, scales_p, rpows_p)

    # ----------------------------------------------------------- verify
    def verify(self, proof: StirProof,
               transcript: FastTranscript = None) -> "StirResult":
        cfg = self.cfg
        ext = self.ext
        k = cfg.k
        b, n = proof.b, proof.n
        d, N, off, t, R = self._schedule(n)
        assert len(proof.round_roots) == R
        assert len(proof.betas) == R
        assert len(proof.round_openings) == R
        assert len(proof.final_coeffs) <= d[R] // k
        pow_nonces = proof.pow_nonces or [b""] * (R + 1)
        assert len(pow_nonces) == R + 1

        if transcript is None:
            assert len(proof.group_sizes) == 1
            tr = self._transcript(b, n)
            tr.absorb(proof.group_roots[0])
        else:
            # outer protocols absorb every group root themselves BEFORE rho
            tr = transcript
        rho = tr.challenge_scalar(ext)
        rho_pows = [ext.pow(rho, j) for j in range(b)]

        p_mod = self.prime.p
        w = [self.prime.get_root_of_unity(Ni) for Ni in N]
        inv_k = ext.inv(ext.from_int(k))
        # k-th root of unity inside each domain + inverse powers
        mu_inv = []
        for i in range(R + 1):
            mu = pow(int(w[i]), N[i] // k, p_mod)
            mui = ext.inv(ext.from_int(mu))
            mu_inv.append([ext.pow(mui, tt) for tt in range(k)])

        def row_xs(i: int, idx: int):
            """The k coset x-values of row ``idx`` of C_i."""
            x0 = off[i] * pow(int(w[i]), idx, p_mod) % p_mod
            mu = pow(int(w[i]), N[i] // k, p_mod)
            return [ext.from_int(x0 * pow(mu, tt, p_mod) % p_mod)
                    for tt in range(k)]

        def fold_from_row(i: int, idx: int, fvals, r):
            """Fold_k(f_i, r)(y) from f_i's values on row idx's coset:
            f_j(y) = (1/k) x0^{-j} sum_t mu^{-jt} fvals[t]."""
            x0 = ext.from_int(off[i] * pow(int(w[i]), idx, p_mod) % p_mod)
            x_inv = ext.inv(x0)
            acc = ext.zero()
            r_pow = ext.one()
            xj = ext.one()
            for j in range(k):
                s = ext.zero()
                for tt in range(k):
                    s = ext.add(s, ext.mul(mu_inv[i][(tt * j) % k], fvals[tt]))
                fj = ext.mul(ext.mul(s, inv_k), xj)
                acc = ext.add(acc, ext.mul(r_pow, fj))
                r_pow = ext.mul(r_pow, r)
                xj = ext.mul(xj, x_inv)
            return acc

        # params[i] lets us evaluate f_i at a point of L_i given C_i's value:
        # None for i=0 (f_0 = rho-mix of the committed batch), else
        # (ans_coeffs, quotient points, r_cor, e)
        params: List = [None]

        def f_value(i: int, x, committed):
            if i == 0:
                acc = ext.zero()
                for bj in range(b):
                    acc = ext.add(acc, ext.mul(rho_pows[bj], committed[bj]))
                return acc
            ans, pts, r_cor, e = params[i]
            v = ext.one()
            for ptx in pts:
                v = ext.mul(v, ext.sub(x, ptx))
            q = ext.mul(ext.sub(committed, _eval_poly(ext, ans, x)),
                        ext.inv(v))
            return ext.mul(q, _geom_eval(ext, r_cor, x, e))

        result_rows: List = []      # authenticated C_0 rows for outer checks

        def open_rows(i: int, idxs):
            """Verify paths of C_i's openings at ``idxs``; decode values.
            rows[qi][t] is a list of b values for i == 0, [value] else."""
            rows = []
            if i == 0:
                for qi, idx in enumerate(idxs):
                    per_t = [[] for _ in range(k)]
                    for gi, gsize in enumerate(proof.group_sizes):
                        path = proof.batch_openings[qi][gi]
                        assert IndexMerkleTree.verify_path(
                            proof.group_roots[gi], N[0] // k, cfg.arity,
                            idx, path,
                        ), f"batch path group {gi}"
                        flat = _row_values(ext, path.row, gsize * k)
                        for tt in range(k):
                            per_t[tt].extend(
                                flat[bj * k + tt] for bj in range(gsize)
                            )
                    rows.append(per_t)
                    result_rows.append((idx, per_t))
                return rows
            for qi, idx in enumerate(idxs):
                path = proof.round_openings[i - 1][qi]
                assert IndexMerkleTree.verify_path(
                    proof.round_roots[i - 1], N[i] // k, cfg.arity, idx, path
                ), f"round {i} path"
                flat = _row_values(ext, path.row, k)
                rows.append([[v] for v in flat])
            return rows

        for i in range(1, R + 1):
            r = tr.challenge_scalar(ext)
            tr.absorb(proof.round_roots[i - 1])
            z = tr.challenge_scalar(ext)
            assert self._ood_ok(z), "out-of-domain sample hit the prime field"
            beta = proof.betas[i - 1]
            tr.absorb(_scalar_bytes(ext, beta))
            tr.check_grind(cfg.grinding_bits, pow_nonces[i - 1])
            idxs = self._dedupe(tr.challenge_indices(t[i - 1], N[i - 1] // k))
            if i - 1 == 0:
                assert len(proof.batch_openings) == len(idxs)
            else:
                assert len(proof.round_openings[i - 2]) == len(idxs)
            r_cor = tr.challenge_scalar(ext)

            rows = open_rows(i - 1, idxs)
            G = [(z, beta)]
            for qi, idx in enumerate(idxs):
                xs = row_xs(i - 1, idx)
                fvals = [
                    f_value(i - 1, xs[tt],
                            rows[qi][tt] if i - 1 == 0 else rows[qi][tt][0])
                    for tt in range(k)
                ]
                y = ext.from_int(
                    pow(off[i - 1] * pow(int(w[i - 1]), idx, p_mod) % p_mod,
                        k, p_mod)
                )
                G.append((y, fold_from_row(i - 1, idx, fvals, r)))
            pts = [x for (x, _) in G]
            assert len(set(pts)) == len(pts), "degenerate quotient point set"
            params.append((_newton_interp(ext, G), pts, r_cor, len(G)))

        r_fin = tr.challenge_scalar(ext)
        tr.absorb(b"".join(_scalar_bytes(ext, s) for s in proof.final_coeffs))
        tr.check_grind(cfg.grinding_bits, pow_nonces[R])
        idxs_fin = self._dedupe(tr.challenge_indices(t[R], N[R] // k))
        if R == 0:
            assert len(proof.batch_openings) == len(idxs_fin)
        else:
            assert len(proof.round_openings[R - 1]) == len(idxs_fin)

        rows = open_rows(R, idxs_fin)
        for qi, idx in enumerate(idxs_fin):
            xs = row_xs(R, idx)
            fvals = [f_value(R, xs[tt], rows[qi][tt][0] if R else rows[qi][tt])
                     for tt in range(k)]
            expected = fold_from_row(R, idx, fvals, r_fin)
            y = ext.from_int(
                pow(off[R] * pow(int(w[R]), idx, p_mod) % p_mod, k, p_mod)
            )
            assert _eval_poly(ext, proof.final_coeffs, y) == expected, (
                "final polynomial mismatch"
            )
        return StirResult(rows=result_rows)
