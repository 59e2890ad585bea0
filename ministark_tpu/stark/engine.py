"""Array-native STARK prover/verifier engine for large traces.

Runs the *identical* protocol to stark/stark.py (same transcript bytes, same
Merkle commitments, same proof values — equivalence-tested in
tests/test_engine.py) but keeps every polynomial and codeword resident as
uint32 limb arrays, dispatching the bulk work to the device kernel layer:

  trace column iFFT / coset LDE          -> ops/ntt_device.py (batched NTT)
  constraint mixing / folding / division -> ops/poly_device.py (scans)
  codeword Merkle commitments            -> commit/packed_tree.py (+ native C++)
  DEEP / query evaluations               -> ops/poly_device.py eval or direct
                                            codeword reads (identical values)

Only protocol-inherent sequential state (the Fiat-Shamir sponge, challenge
scalars, proof assembly) touches host scalars — matching SURVEY §7's design:
"one jitted mega-graph per phase with host callbacks only at transcript
challenge points".

Two deliberate, value-preserving deviations from the reference's *algorithm*
(not its output):
  * query-phase y values are read from the committed codeword instead of
    re-running Horner (the codeword entry IS poly(domain.element(beta)));
  * the quotient/vanishing division whose result the verifier discards
    (src/fri.rs:227) is skipped.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.packed_tree import PackedMerkleTree
from ..fri.fri import FriProof, FriRound as HostFriRound
from ..ops.ntt_device import get_ntt_fns
from ..ops.poly_device import (
    eval_even_odd,
    eval_many,
    field_sum,
    fold_even_odd,
    mix_columns_jit,
    powers,
    synth_div_suffix,
)
from ..ops.registry import get_kernels, lift_base_array
from ..poly import DensePolynomial, Radix2EvaluationDomain
from ..transcript.merlin import Arthur, Merlin
from .stark import StarkConfig, StarkProof

# Below this codeword size the engine's FRI tail falls back to host scalars
# (avoids dozens of tiny-shape compilations); set to 1 in tests to force the
# device path everywhere. Raised 2^11 -> 2^13 in round 5: the size-2048/
# 4096 device rounds were tunnel-dispatch-bound (0.06-0.25 s each in the
# phase splits vs ~0.1 s of host bigint work for the whole tail) and the
# two dropped sizes remove ~12 prewarm tasks from the cold bill. Proof
# bytes identical either way (tests/test_engine.py gates it).
DEVICE_MIN_SIZE = 1 << 13



@dataclass
class DeviceTrace:
    """Array-native TraceTable equivalent.

    ``cols``: (width, N) u64 numpy array of column *evaluations* over the
    trace domain (rows >= steps already carry the deterministic ZK padding),
    OR ``cols_dev``: the same data as a packed (width, N, *elem) device array
    (fully on-device witness generation — never touches the host).
    ``transitions`` map the packed trace-poly coefficient array
    (width, N, *elem) to one packed (N, *elem) constraint coefficient array.
    ``transitions_inline`` (optional): the same maps written to be safe to
    call from INSIDE an enclosing jit (no closures over device-resident NTT
    tables — see stark/core.py and the CLAUDE.md nested-jit note); models
    whose ``transitions`` only use elementwise kernel ops may leave this
    None and the compile-check core falls back to ``transitions``.
    """

    stark_field: object
    steps: int
    cols: "np.ndarray | None"
    transitions: List[Callable]
    cols_dev: object = None
    transitions_inline: "List[Callable] | None" = None

    @property
    def width(self) -> int:
        return (self.cols if self.cols is not None else self.cols_dev).shape[0]

    @property
    def domain_size(self) -> int:
        return (self.cols if self.cols is not None else self.cols_dev).shape[1]

    def constrain_number(self) -> int:
        return self.width + len(self.transitions)


def _effective_len(packed: np.ndarray, elem_ndim: int) -> int:
    """Length after ark-style trailing-zero trimming (0 for the zero poly)."""
    a = np.asarray(packed)
    if a.shape[0] == 0:
        return 0
    flat = a.reshape(a.shape[0], -1) if a.ndim > 1 else a.reshape(a.shape[0], 1)
    nz = np.any(flat != 0, axis=1)
    idx = np.nonzero(nz)[0]
    return 0 if idx.size == 0 else int(idx[-1]) + 1


def _efflen_device(ke, arr):
    """Effective (trailing-zero-trimmed) length computed on device; only a
    scalar crosses the host boundary."""
    import jax as _jax
    import jax.numpy as _jnp

    @partial(_jax.jit, static_argnums=0)
    def _f(ke, arr):
        flat = arr.reshape(arr.shape[0], -1)
        nz = _jnp.any(flat != 0, axis=1)
        idx = _jnp.arange(arr.shape[0])
        return _jnp.max(_jnp.where(nz, idx + 1, 0))

    if arr.shape[0] == 0:
        return 0
    return int(_f(ke, arr))


class DeviceEngine:
    def __init__(self, config: StarkConfig, mesh=None, mesh_axis: str = "shards"):
        """``mesh``: optional jax.sharding.Mesh — when given, the heavy
        phases (trace iFFT, coset LDE, FRI round FFT/fold/divide/DEEP,
        Merkle builds) run sharded over its ``mesh_axis`` with XLA
        collectives over ICI; proof bytes are identical to the single-chip
        path (tests/test_sharded_engine.py)."""
        self.config = config
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        sf = config.stark_field
        self.kb = get_kernels(sf.base)
        self.ke = get_kernels(sf.extension)
        self._trace_on = bool(int(__import__("os").environ.get("MINISTARK_TRACE", "0")))
        self._t0 = None
        # per-phase wall seconds of the latest prove(); always collected
        # (a handful of time.time() calls), printed when MINISTARK_TRACE=1.
        # bench.py aggregates this into the driver JSON's device_s field so
        # tunnel/dispatch noise is separable from engine time.
        self.phase_seconds: dict = {}

    def _t(self, label: str):
        """Close the previous phase, open ``label``; accumulate durations."""
        import time as _time

        now = _time.time()
        if self._t0 is not None:
            dt = now - self._t0
            self.phase_seconds[self._last_label] = (
                self.phase_seconds.get(self._last_label, 0.0) + dt
            )
            if self._trace_on:
                import sys

                print(f"[engine] {self._last_label}: {dt:.2f}s",
                      file=sys.stderr, flush=True)
        self._t0 = now
        self._last_label = label

    # ------------------------------------------------------------------ utils
    def _ntt(self, n: int):
        """(fft, ifft, coset_fft, coset_ifft) for size n — sharded over the
        engine's mesh when one is set and the size splits over it."""
        from ..parallel.ntt_sharded import select_ntt_fns

        return select_ntt_fns(
            self.config.stark_field.base, n, self.mesh, self.mesh_axis
        )

    def _fri_sharded(self, n: int):
        """Sharded fold/deep/divide closures for coefficient length n, or
        None when no mesh is set / the length doesn't split."""
        if self.mesh is None:
            return None
        n_dev = self.mesh.shape[self.mesh_axis]
        m = n // n_dev if n % n_dev == 0 else 0
        if m < 2 or m % 2 or m & (m - 1):
            return None
        from ..parallel.fri_sharded import get_sharded_fri_fns

        return get_sharded_fri_fns(
            self.config.stark_field.extension, n, self.mesh, self.mesh_axis
        )

    def _trace_polys(self, trace: DeviceTrace):
        """(width, N) evaluations -> packed (width, N, *elem) coefficients."""
        n = trace.domain_size
        if trace.cols_dev is not None:
            x = trace.cols_dev
        else:
            x = jnp.asarray(self.kb.pack(trace.cols.reshape(-1)).reshape(
                (trace.width, n) + self.kb.elem_axes))
        _, ifft, _, _ = self._ntt(n)
        return ifft(x)

    def _base_to_u64(self, packed) -> np.ndarray:
        a = np.asarray(packed)
        if self.kb.elem_axes == (2,):
            return a[..., 0].astype(np.uint64) | (a[..., 1].astype(np.uint64) << 32)
        return a.astype(np.uint64)

    def _ext_to_u64(self, packed) -> np.ndarray:
        """(n, *ext_elem) -> (n, d) u64 component array (tower order)."""
        a = np.asarray(packed)
        if self.ke.elem_axes == (2, 2):  # goldilocks fp2
            return a[..., 0].astype(np.uint64) | (a[..., 1].astype(np.uint64) << 32)
        return a.astype(np.uint64)  # babybear fp4: (n, 4) u32 -> u64

    # ------------------------------------------------------------------ prove
    def prove(self, trace: DeviceTrace) -> StarkProof:
        cfg = self.config
        sf = cfg.stark_field
        base, ext = sf.base, sf.extension
        kb, ke = self.kb, self.ke
        merlin = Merlin(cfg.io)

        n = trace.domain_size

        self.phase_seconds = {}
        self._t0 = None
        if self._prewarm_pool is None and not getattr(self, "_prewarmed", False):
            self._prewarmed = True
            self._start_prewarm(trace, n)
        self._t("trace_commit")
        # 1.1 trace commitment (cols hold canonical values < p, fit in u64)
        if trace.cols_dev is not None:
            rows_dev = jnp.moveaxis(trace.cols_dev, 0, 1).reshape(
                (n * trace.width,) + kb.elem_axes
            )
            if self._device_hash_on():
                trace_tree = PackedMerkleTree(
                    base, None, cfg.merkle_config, device_vals=rows_dev,
                    mesh=self.mesh, mesh_axis=self.mesh_axis,
                )
            else:
                trace_tree = PackedMerkleTree(
                    base,
                    self._base_to_u64(rows_dev).reshape(-1, 1),
                    cfg.merkle_config,
                )
        else:
            trace_vals_u64 = np.ascontiguousarray(
                trace.cols.T.astype(np.uint64)
            ).reshape(-1, 1)
            trace_tree = PackedMerkleTree(base, trace_vals_u64, cfg.merkle_config)
        trace_commit = trace_tree.root()
        merlin.add_bytes(trace_commit)

        self._t("lde")
        # 1.2 LDE of all constraint polynomials
        lde_n = cfg.blowup_factor * n
        random_shift = merlin.challenge_scalar(base)
        trace_poly_arr = self._trace_polys(trace)                  # (w, n, *e)
        transition_arrs = [f(trace_poly_arr) for f in trace.transitions]
        all_coeffs = jnp.concatenate(
            [trace_poly_arr] + [t[None] for t in transition_arrs], axis=0
        )                                                          # (w+t, n, *e)
        total = all_coeffs.shape[0]

        pad = jnp.zeros((total, lde_n - n) + kb.elem_axes, dtype=jnp.uint32)
        padded = jnp.concatenate([all_coeffs, pad], axis=1)
        _, _, coset_fft, _ = self._ntt(lde_n)
        shift_packed = jnp.asarray(kb.pack_scalar(random_shift))
        lde_evals = coset_fft(padded, shift_packed)                # (w+t, 2n, *e)

        self._t("constrain_tree")
        lde_rows_dev = jnp.moveaxis(lde_evals, 0, 1).reshape(
            (lde_n * total,) + kb.elem_axes
        )
        if self._device_hash_on():
            lde_host = None
        else:
            lde_u64 = self._base_to_u64(lde_evals)
            lde_host = np.ascontiguousarray(lde_u64.T).reshape(-1, 1)
        constrain_tree = PackedMerkleTree(
            base, lde_host, cfg.merkle_config, device_vals=lde_rows_dev,
            mesh=self.mesh, mesh_axis=self.mesh_axis,
        )
        constrain_trace_commit = constrain_tree.root()
        merlin.add_bytes(constrain_trace_commit)

        self._t("mix")
        # 1.3 mix into the validity polynomial (remainder quirk §8.3:
        # validity == mixed since deg < domain size)
        r = merlin.challenge_scalar(base)
        weights = jnp.asarray(kb.pack([base.pow(r, i) for i in range(total)]))
        mixed = mix_columns_jit(kb, all_coeffs, weights)           # (n, *e)

        self._t("deep_ali")
        # 2. DEEP-ALI queries
        queries = merlin.challenge_scalars(ext, cfg.constrain_queries)
        ext_coeff_arr = lift_base_array(ke, all_coeffs)            # (w+t, n, *ext)
        ext_mixed = lift_base_array(ke, mixed)
        constrain_queries, validity_queries = [], []
        for q in queries:
            qp = jnp.asarray(ke.pack_scalar(q))
            ev_arr = np.asarray(_eval_many_jit(ke, ext_coeff_arr, qp))
            evals = [ke.unpack(ev_arr[i : i + 1])[0] for i in range(total)]
            constrain_queries.append(evals)
            # validity == mixed (§8.3) => its query value is the r-weighted
            # sum of the constraint query values (identical field value)
            acc = ext.zero()
            for i, ev in enumerate(evals):
                acc = ext.add(acc, ext.mul(ext.from_base_prime_field(base.pow(r, i)), ev))
            validity_queries.append(acc)

        self._t("fri")
        # 3. FRI on the extension-lifted validity polynomial
        fri_proof = self._fri_prove(merlin, ext_mixed)

        self._t("done")
        self._finish_prewarm()
        return StarkProof(
            arthur=merlin.transcript(),
            trace_commit=trace_commit,
            constrain_trace_commit=constrain_trace_commit,
            constrain_queries=constrain_queries,
            validity_queries=validity_queries,
            fri_proof=fri_proof,
        )

    # ------------------------------------------------------------------- FRI
    def _ext_fft(self, coeffs, domain_size: int):
        """Extension codeword via component-batched base NTT.

        coeffs: (m, *ext_elem) packed, m <= domain_size."""
        base = self.config.stark_field.base
        a = coeffs
        m = a.shape[0]
        if m < domain_size:
            pad = jnp.zeros((domain_size - m,) + tuple(a.shape[1:]), dtype=jnp.uint32)
            a = jnp.concatenate([a, pad], axis=0)
        if self.ke.elem_axes == (2, 2):   # (N, 2, 2) -> (2, N, 2)
            comp = jnp.moveaxis(a, 1, 0)
        else:                              # (N, 4) -> (4, N)
            comp = jnp.moveaxis(a, 1, 0)
        fft, _, _, _ = self._ntt(domain_size)
        ev = fft(comp)
        return jnp.moveaxis(ev, 0, 1)     # (N, *ext_elem)

    @staticmethod
    def _device_hash_on() -> bool:
        import os

        return os.environ.get("MINISTARK_DEVICE_HASH") == "1"

    def _fri_round_tree(self, codeword) -> PackedMerkleTree:
        ext = self.config.stark_field.extension
        if self._device_hash_on():
            # hash in HBM; query reads/proof bytes are pulled individually
            # later (codeword never bulk-transferred). All device rounds
            # hash on device: the fused level builder (ops/sha256.py
            # _inner_levels_fused) costs ONE dispatch per tree.
            return PackedMerkleTree(
                ext, None, self.config.fri_config.merkle_config,
                device_vals=codeword,
                mesh=self.mesh, mesh_axis=self.mesh_axis,
            )
        return PackedMerkleTree(
            ext, self._ext_to_u64(codeword), self.config.fri_config.merkle_config
        )

    _prewarm_pool = None

    def _start_prewarm(self, trace, n: int):
        """Compile the prove's shape-keyed executables CONCURRENTLY, in the
        background, while the main thread runs the (serial) protocol.

        A cold prove pays ~20 min of SERIAL remote compiles through this
        environment's compile tunnel (measured 1239-1402 s at 2^20:
        ~11 geometric FRI sizes x {deep-evals, fold+divide, codeword NTT,
        tree build, gathers, quotients} at ~20-80 s each, plus the
        trace/LDE/mix/eval executables). The protocol is sequential —
        transcript challenges chain — but the executables are value-
        independent, so a thread pool can compile all of them while the
        main thread needs only the first few; jax's per-executable compile
        lock hands the main thread a finished (or in-flight) compile
        instead of a cold one. Dummy zero-value calls match the real
        shapes exactly: a FRI round of size s carries s/2 coefficients
        (the poly degree halves each fold), so the codeword NTT always
        takes the pad branch. Measured at 2^17 fully cold: the 8-size FRI
        set compiles in 271 s on 6 workers (~56 executables, ~4.8 s each
        amortized) vs ~20 s each serially. Gated by MINISTARK_PREWARM
        (default on; near-free when warm — dispatches are async, results
        never pulled)."""
        import os as _os

        if (self.mesh is not None
                or _os.environ.get("MINISTARK_PREWARM", "1") != "1"
                or jax.default_backend() not in ("tpu", "axon")):
            return
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.config
        base = cfg.stark_field.base
        ext = cfg.stark_field.extension
        kb, ke = self.kb, self.ke
        sc = jnp.asarray(ke.pack_scalar(ext.from_int(3)))
        size0 = cfg.blowup_factor * n
        sizes = []
        s = size0
        while s >= DEVICE_MIN_SIZE:
            sizes.append(s)
            s //= 2
        nq = cfg.fri_config.queries
        w = trace.width
        total = w + len(trace.transitions)
        lde_n = cfg.blowup_factor * n

        def warm_round(s, part):
            # split per-executable (part 0..3) so the pool stays saturated:
            # one coarse task serialized ~4 remote compiles behind a single
            # worker while other workers idled at the tail (VERDICT r4
            # item 5 — the cold bill is compile-service-parallelism-bound)
            half = jnp.zeros((s // 2,) + tuple(ke.elem_axes), dtype=jnp.uint32)
            if part == 0:
                _deep_evals_jit(ke, half, sc)
            elif part == 1:
                _fold_div_jit(ke, half, sc, sc, sc, sc)
            elif part == 2:
                self._ext_fft(half, s)
            else:
                cw = jnp.zeros((s,) + tuple(ke.elem_axes), dtype=jnp.uint32)
                self._fri_round_tree(cw)

        def warm_query(s, part):
            # query-phase executables for this size (cold they cost as much
            # as the round loop's: ~60-80 s per round pair, measured);
            # submitted as a second wave so every round executable is
            # in flight before the first query one. part 0 = gather +
            # quotients; part 1 = tree search/proof paths (reuses the round
            # tree executable — a cache hit once warm_round part 3 lands).
            half = jnp.zeros((s // 2,) + tuple(ke.elem_axes), dtype=jnp.uint32)
            cw = jnp.zeros((s,) + tuple(ke.elem_axes), dtype=jnp.uint32)
            cwn = jnp.zeros((s // 2,) + tuple(ke.elem_axes), dtype=jnp.uint32)
            # int32 explicitly: codeword indices are < 2^31 and requesting
            # int64 under disabled x64 emits a UserWarning into every
            # driver-captured tail (VERDICT r4 weak #5)
            i1 = jnp.zeros((2 * nq,), jnp.int32)
            i2 = jnp.zeros((nq,), jnp.int32)
            reads = _gather_two_jit(cw, cwn, i1, i2)
            if part == 0:
                scal = jnp.zeros((nq,) + tuple(ke.elem_axes),
                                 dtype=jnp.uint32)
                _query_quotients_from_reads_jit(
                    ke, half, reads, scal, scal, scal, scal, scal
                )
                return
            tree = self._fri_round_tree(cw)
            if tree.device_resident:
                rows = _proof_rows_jit(ext, reads, nq)
                tree.search_rows_async(rows)
                tree.proofs_gather_async([0] * (2 * nq))

        def warm_lde():
            x = jnp.zeros((w, n) + tuple(kb.elem_axes), dtype=jnp.uint32)
            self._ntt(n)[1](x)                                # trace ifft
            padded = jnp.zeros((total, lde_n) + tuple(kb.elem_axes),
                               dtype=jnp.uint32)
            shift = jnp.asarray(kb.pack_scalar(base.from_int(3)))
            self._ntt(lde_n)[2](padded, shift)                # coset LDE

        def warm_mix_eval():
            cols = jnp.zeros((total, n) + tuple(kb.elem_axes),
                             dtype=jnp.uint32)
            wts = jnp.zeros((total,) + tuple(kb.elem_axes), dtype=jnp.uint32)
            mixed = mix_columns_jit(kb, cols, wts)
            ext_arr = lift_base_array(ke, cols)
            lift_base_array(ke, mixed)
            _eval_many_jit(ke, ext_arr, sc)

        def warm_trees():
            if not self._device_hash_on():
                return
            for leaves in (n * w, lde_n * total):
                PackedMerkleTree(
                    base, None, cfg.merkle_config,
                    device_vals=jnp.zeros(
                        (leaves,) + tuple(kb.elem_axes), dtype=jnp.uint32
                    ),
                )

        workers = int(_os.environ.get("MINISTARK_PREWARM_WORKERS", "12"))
        pool = ThreadPoolExecutor(workers)
        self._prewarm_pool = pool
        for task in ([warm_lde, warm_mix_eval, warm_trees]
                     + [(lambda s=s, p=p: warm_round(s, p))
                        for s in sizes for p in range(4)]
                     + [(lambda s=s, p=p: warm_query(s, p))
                        for s in sizes for p in range(2)]):
            pool.submit(task)

    def _finish_prewarm(self):
        if self._prewarm_pool is not None:
            self._prewarm_pool.shutdown(wait=False)
            self._prewarm_pool = None

    def _fri_prove(self, merlin: Merlin, poly_coeffs) -> "DeviceFriProof":
        """Hybrid FRI: device arrays for large rounds, host scalars for the
        geometric tail (< DEVICE_MIN_SIZE) — identical bytes either way."""
        cfg = self.config.fri_config
        sf = self.config.stark_field
        ext = sf.extension
        ke = self.ke

        eff = _efflen_device(ke, poly_coeffs)
        degree = max(eff - 1, 0)
        size = (degree + 1) * cfg.blowup_factor

        # device rounds size geometrically: round r's coefficient array is
        # half of round r-1's, so the fold/divide/eval chain costs ~2 rounds'
        # work total (one executable per size; the persistent compile cache
        # amortizes the per-shape compiles, and _start_prewarm compiles the
        # sizes concurrently during the first prove's earlier phases)
        rounds: List[_FriRoundRepr] = [self._make_round(poly_coeffs, size)]
        cur = rounds[0]

        for _ri in range(1, cfg.rounds):
            self._t(f"fri_round_{_ri}_size{cur.size}")
            z = merlin.challenge_scalar(ext)
            fe_z, fo_z = self._deep_evals(cur, z)
            merlin.add_scalars(ext, [fe_z, fo_z])

            alpha = merlin.challenge_scalar(ext)
            deep_value = ext.add(fe_z, ext.mul(alpha, fo_z))
            round_coeffs = self._fold_div(cur, z, alpha, deep_value)
            cur = self._make_round(round_coeffs, cur.size // 2)
            merlin.add_bytes(cur.tree.root())
            rounds.append(cur)

        # ---- query phase
        raw = merlin.fill_challenge_bytes(8 * cfg.queries)
        betas = [int.from_bytes(raw[i * 8 : (i + 1) * 8], "little")
                 for i in range(cfg.queries)]

        # pass 1: issue every device round's codeword gather, quotient
        # computation AND Merkle value search without blocking — the
        # interpolating lines a*x + b are derived on device from the
        # gathered reads, and the proof search consumes the gathered rows
        # directly (identical values to the host path, §8.6 first-occurrence
        # semantics preserved); nothing here waits for a device->host pull,
        # so all the copies stream concurrently (each blocking pull costs a
        # full tunnel round trip).
        metas = []
        for i in range(len(rounds) - 1):
            self._t(f"fri_query_round_{i}")
            prev, nxt = rounds[i], rounds[i + 1]
            assert prev.size // 2 == nxt.size
            prev_gen = ext.get_root_of_unity(prev.size)
            next_gen = ext.get_root_of_unity(nxt.size)
            red_betas = [b % prev.size if b > prev.size else b for b in betas]
            idxs_prev = ([b % prev.size for b in red_betas]
                         + [(nxt.size + b) % prev.size for b in red_betas])
            idxs_next = [b % nxt.size for b in red_betas]
            xs = []
            for beta in red_betas:
                xs.append((ext.pow(prev_gen, beta),
                           ext.pow(prev_gen, nxt.size + beta),
                           ext.pow(next_gen, beta)))

            if (prev.device and nxt.device
                    and isinstance(prev.codeword, jax.Array)
                    and isinstance(nxt.codeword, jax.Array)):
                i1 = jnp.asarray(np.asarray(idxs_prev, dtype=np.int32))
                i2 = jnp.asarray(np.asarray(idxs_next, dtype=np.int32))
                reads = _gather_two_jit(prev.codeword, nxt.codeword, i1, i2)
                qs, effs = self._quotients_from_reads(prev, reads, xs)
                sidx = None
                if prev.tree.device_resident:
                    nq = len(red_betas)
                    rows = _proof_rows_jit(ext, reads, nq)
                    sidx = prev.tree.search_rows_async(rows)
                # copy only the SMALL latency-critical results here; the
                # bulk quotient payloads start in pass 2b so they never
                # queue ahead of the index/read pulls on the (FIFO) link
                for h in (reads, effs):
                    try:
                        h.copy_to_host_async()
                    except AttributeError:
                        pass
                metas.append((i, red_betas, xs, None, None, reads, qs, effs,
                              sidx))
            else:
                metas.append((i, red_betas, xs, idxs_prev, idxs_next,
                              None, None, None, None))

        # pass 2a: the (already streaming) search indices arrive; dispatch
        # every round's digest + leaf-group gathers so THEIR copies stream
        # together while the quotient payloads are still in flight
        self._t("fri_query_materialize")
        handles = {}
        for (i, red_betas, xs, idxs_prev, idxs_next, reads, qs,
             effs, sidx) in metas:
            if sidx is not None:
                tree = rounds[i].tree
                sidxs = [int(v) for v in np.asarray(sidx)]
                if any(ix >= tree.n_leafs for ix in sidxs):
                    # a missed search returns index == n_leafs; JAX gathers
                    # would silently clamp it into a well-formed-but-wrong
                    # proof, so fail loudly (matches the host path's
                    # PackedMerkleTree._leaf_indices semantics)
                    from ..utils import LeafNotFound

                    raise LeafNotFound()
                handles[i] = tree.proofs_gather_async(sidxs)

        # pass 2b: the small transfers are all queued — NOW trim every
        # round's quotient batch to its effective length and start the bulk
        # payload copies; they stream while the proofs assemble
        trim_fns = {}
        for (i, red_betas, xs, idxs_prev, idxs_next, reads, qs,
             effs, sidx) in metas:
            if qs is not None:
                trim_fns[i] = self._trim_quotients(qs, effs, len(red_betas))
        # materialize reads, build the points and Merkle proofs, slice each
        # round's (already streaming) quotients
        points, queries, quotients = [], [], []
        for (i, red_betas, xs, idxs_prev, idxs_next, reads, qs,
             effs, sidx) in metas:
            prev, nxt = rounds[i], rounds[i + 1]
            nq = len(red_betas)
            if reads is not None:
                vals = ke.unpack(np.asarray(reads))
                prev_reads, next_reads = vals[: 2 * nq], vals[2 * nq:]
            else:
                prev_reads, next_reads = _read_two_codewords(
                    self.ke, prev, nxt, idxs_prev, idxs_next
                )

            round_points = []
            proof_values = []
            for qi in range(nq):
                x1, x2, x3 = xs[qi]
                # codeword entries ARE the reference's direct evaluations
                y1 = prev_reads[qi]
                y2 = prev_reads[nq + qi]
                y3 = next_reads[qi]
                round_points.append([(x1, y1), (x2, y2), (x3, y3)])
                proof_values.extend([y1, y2])

            if qs is not None:
                round_quotients = trim_fns[i]
            else:
                round_quotients = []
                for qi in range(nq):
                    x1, x2, _ = xs[qi]
                    y1, y2 = prev_reads[qi], prev_reads[nq + qi]
                    a = ext.mul(ext.sub(y2, y1), ext.inv(ext.sub(x2, x1)))
                    b = ext.sub(y1, ext.mul(a, x1))
                    round_quotients.append(self._query_quotient(prev, a, b, x1, x2))

            if i in handles:
                proofs = prev.tree.proofs_finish(handles[i])
            else:
                # one batched search + node/neighbour fetch for the round
                proofs = prev.tree.generate_proofs(proof_values)
            round_queries = [
                [proofs[2 * qi], proofs[2 * qi + 1]] for qi in range(nq)
            ]

            points.append(round_points)
            queries.append(round_queries)
            quotients.append(round_quotients)

        # materialize the deferred quotient pulls (their copies were started
        # asynchronously and have been streaming during the loop)
        quotients = [q() if callable(q) else q for q in quotients]

        return DeviceFriProof(
            ext=ext, ke=ke, points=points, queries=queries, quotients=quotients
        )

    # ------------------------------------------------- hybrid round helpers
    def _make_round(self, coeffs, size: int) -> "_FriRoundRepr":
        """coeffs: device array zero-padded to a power-of-two length (halving
        each round), OR a trimmed host scalar list (tail rounds)."""
        ext = self.config.stark_field.extension
        use_device = size >= DEVICE_MIN_SIZE and not isinstance(coeffs, list)
        if isinstance(coeffs, list) or not use_device:
            if not isinstance(coeffs, list):
                eff = _efflen_device(self.ke, coeffs)
                coeffs = self.ke.unpack(np.asarray(coeffs[:eff]))
            domain = Radix2EvaluationDomain(ext, size)
            codeword = domain.fft(coeffs)
            tree = PackedMerkleTree.from_scalars(
                ext, codeword, self.config.fri_config.merkle_config
            )
            return _FriRoundRepr(
                device=False, ext=ext, ke=self.ke, coeffs=coeffs,
                codeword=codeword, tree=tree, size=size,
            )
        codeword = self._ext_fft(coeffs[: min(size, coeffs.shape[0])], size)
        tree = self._fri_round_tree(codeword)
        cw = codeword if self._device_hash_on() else np.asarray(codeword)
        return _FriRoundRepr(
            device=True, ext=ext, ke=self.ke, coeffs=coeffs,
            codeword=cw, tree=tree, size=size,
        )

    def _deep_evals(self, rnd: "_FriRoundRepr", z):
        ext = self.config.stark_field.extension
        ke = self.ke
        if rnd.device:
            if rnd.coeffs.shape[0] == 0:
                return ext.zero(), ext.zero()
            zp = jnp.asarray(ke.pack_scalar(z))
            fns = self._fri_sharded(rnd.coeffs.shape[0])
            if fns is not None:
                with self.mesh:
                    fe, fo = fns["deep"](rnd.coeffs, zp)
            else:
                fe, fo = _deep_evals_jit(ke, rnd.coeffs, zp)
            if fo is None:
                return ke.unpack(np.asarray(fe)[None])[0], ext.zero()
            both = ke.unpack(np.asarray(_stack2_jit(fe, fo)))  # ONE pull
            return both[0], both[1]
        poly = DensePolynomial(ext, rnd.coeffs)
        parts = HostFriRound.split_poly(ext, poly, 2)
        return parts[0].evaluate(z), parts[1].evaluate(z)

    def _fold_div(self, rnd: "_FriRoundRepr", z, alpha, deep_value):
        ext = self.config.stark_field.extension
        ke = self.ke
        if rnd.device and not ext.is_zero(z):
            n0 = rnd.coeffs.shape[0]
            zp = jnp.asarray(ke.pack_scalar(z))
            ap = jnp.asarray(ke.pack_scalar(alpha))
            dv = jnp.asarray(ke.pack_scalar(deep_value))
            fns = self._fri_sharded(n0)
            fns_half = self._fri_sharded(n0 // 2) if fns is not None else None
            if fns is not None and fns_half is not None:
                # distributed round: sharded fold (no comms), subtract the
                # DEEP value at x^0, sharded suffix-sum division (one
                # collective) — coefficients stay at their natural halved
                # length (contiguously sharded) instead of fixed padding
                zinv1 = jnp.asarray(ke.pack_scalar(ext.inv(z)))
                with self.mesh:
                    folded = fns["fold"](rnd.coeffs, ap)       # (n0/2, *e)
                    folded = _sub_head1_jit(ke, folded, dv)
                    rp = fns_half["divide"](folded, zp, zinv1)  # (n0/2, *e)
                if rnd.size // 2 < DEVICE_MIN_SIZE:
                    eff = _efflen_device(ke, rp)
                    return ke.unpack(np.asarray(rp[:eff]))
                return rp
            zinv = jnp.asarray(ke.pack_scalar(ext.inv(z)))
            rp = _fold_div_jit(ke, rnd.coeffs, zp, ap, dv, zinv)
            # hand off to host representation when the next round is small
            if rnd.size // 2 < DEVICE_MIN_SIZE:
                eff = _efflen_device(ke, rp)
                return ke.unpack(np.asarray(rp[:eff]))
            return rp
        if rnd.device:
            eff = _efflen_device(ke, rnd.coeffs)
            poly = DensePolynomial(ext, ke.unpack(np.asarray(rnd.coeffs[:eff])))
        else:
            poly = DensePolynomial(ext, rnd.coeffs)
        parts = HostFriRound.split_poly(ext, poly, 2)
        folded = parts[0] + parts[1].scale(alpha)
        dv_poly = DensePolynomial(ext, [deep_value])
        denominator = DensePolynomial(ext, [ext.neg(z), ext.one()])
        return ((folded - dv_poly) / denominator).to_vec()

    def _quotients_from_reads(self, prev: "_FriRoundRepr", reads, xs):
        """Dispatch all of one round's query quotients in ONE executable,
        with the interpolating lines derived on device from ``reads`` (the
        batched codeword gather) — no host round trip anywhere."""
        ext = self.config.stark_field.extension
        ke = self.ke
        pc = prev.coeffs
        if pc.shape[0] < 2:
            padz = jnp.zeros((2 - pc.shape[0],) + tuple(pc.shape[1:]),
                             dtype=jnp.uint32)
            pc = jnp.concatenate([pc, padz], axis=0)
        n0 = pc.shape[0]

        def stack(vals):
            return jnp.asarray(np.stack([np.asarray(ke.pack_scalar(v)) for v in vals]))

        x1_s = stack([x1 for (x1, _, _) in xs])
        x2_s = stack([x2 for (_, x2, _) in xs])
        dxinv_s = stack([ext.inv(ext.sub(x2, x1)) for (x1, x2, _) in xs])
        s1_s = stack([ext.inv(x1) for (x1, _, _) in xs])
        s2_s = stack([ext.inv(x2) for (_, x2, _) in xs])
        return _query_quotients_from_reads_jit(
            ke, pc, reads, dxinv_s, x1_s, x2_s, s1_s, s2_s
        )

    def _trim_quotients(self, qs, effs, nq: int):
        """Trim the padded quotient batch to its longest effective length,
        start the device->host copy, and return a DEFERRED (zero-arg
        callable). The quotient batch is padded to the round's coefficient
        length (each query's quotient is 2 shorter than its effective
        numerator), so trimming still saves the slack plus any geometric
        over-allocation from the initial padding."""
        effs = [int(e) for e in np.asarray(effs)]   # already streamed async
        m = max(effs + [0])
        trimmed = qs[:, :m]
        try:
            trimmed.copy_to_host_async()
        except AttributeError:  # older jax.Array without the method
            pass

        def materialize():
            arr = np.asarray(trimmed)               # copy already streaming
            return [arr[qi, : effs[qi]] for qi in range(nq)]

        return materialize

    def _query_quotient(self, prev: "_FriRoundRepr", a, b, x1, x2):
        ext = self.config.stark_field.extension
        ke = self.ke
        if prev.device:
            ap_ = jnp.asarray(ke.pack_scalar(a))
            bp_ = jnp.asarray(ke.pack_scalar(b))
            x1p = jnp.asarray(ke.pack_scalar(x1))
            x2p = jnp.asarray(ke.pack_scalar(x2))
            pc = prev.coeffs
            if pc.shape[0] < 2:
                padz = jnp.zeros((2 - pc.shape[0],) + tuple(pc.shape[1:]),
                                 dtype=jnp.uint32)
                pc = jnp.concatenate([pc, padz], axis=0)
            x1inv = jnp.asarray(ke.pack_scalar(ext.inv(x1)))
            x2inv = jnp.asarray(ke.pack_scalar(ext.inv(x2)))
            q2 = _query_quotient_jit(ke, pc, ap_, bp_, x1p, x2p, x1inv, x2inv)
            eff = _efflen_device(ke, q2)
            return np.asarray(q2[:eff])
        poly = DensePolynomial(ext, prev.coeffs)
        g = DensePolynomial(ext, [b, a])
        vanishing = (
            DensePolynomial(ext, [ext.neg(x1), ext.one()])
            * DensePolynomial(ext, [ext.neg(x2), ext.one()])
        )
        return (poly - g) / vanishing

    # ----------------------------------------------------------- verifier
    def verify(self, constrain_coeffs, proof: StarkProof) -> bool:
        """Array-native verifier mirroring stark/stark.py::Stark.verify.

        ``constrain_coeffs``: (w+t, n, *base_elem) packed coefficient array
        (the out-of-band Constrains, as produced by derive_constrains)."""
        cfg = self.config
        sf = cfg.stark_field
        base, ext = sf.base, sf.extension
        kb, ke = self.kb, self.ke

        arthur = Arthur(cfg.io, proof.arthur)
        assert arthur.next_digest() == proof.trace_commit
        _shift = arthur.challenge_scalar(base)
        assert arthur.next_digest() == proof.constrain_trace_commit
        r = arthur.challenge_scalar(base)

        queries = arthur.challenge_scalars(ext, cfg.constrain_queries)
        ext_coeffs = lift_base_array(ke, jnp.asarray(constrain_coeffs))
        total = ext_coeffs.shape[0]
        # The host/reference verifier divides by the vanishing poly of
        # Radix2(degree+1); when the trace domain exceeds that (steps an exact
        # power of two), divide_by_vanishing_poly leaves a nonzero remainder
        # and the reference rejects. Our weighted-sum shortcut is only valid
        # when the domains coincide — raise like the host otherwise (ADVICE r1).
        verifier_domain = Radix2EvaluationDomain(ext, cfg.degree + 1)
        assert constrain_coeffs.shape[1] <= verifier_domain.size(), (
            f"trace domain {constrain_coeffs.shape[1]} exceeds the verifier "
            f"domain {verifier_domain.size()}: the reference verifier would "
            f"reject (§8.3 divergence outside non-pow2 step counts)"
        )
        for query, constrain_query, validity_query in zip(
            queries, proof.constrain_queries, proof.validity_queries
        ):
            qp = jnp.asarray(ke.pack_scalar(query))
            evals = _eval_many_jit(ke, ext_coeffs, qp)
            evals = [ke.unpack(np.asarray(evals[i : i + 1]))[0] for i in range(total)]
            acc = ext.zero()
            for i, (ev, claimed) in enumerate(zip(evals, constrain_query)):
                assert ev == claimed
                acc = ext.add(
                    acc, ext.mul(ext.from_base_prime_field(base.pow(r, i)), ev)
                )
            # §8.3: c_x has degree < domain size, so the protocol's "quotient"
            # is c_x itself and its evaluation is the weighted sum above
            assert acc == validity_query

        fri_proof = proof.fri_proof
        if isinstance(fri_proof, DeviceFriProof):
            return self._fri_verify(fri_proof, arthur)
        from ..fri import Fri

        return Fri(ext, cfg.fri_config).verify(fri_proof, arthur)

    def _fri_verify(self, proof: "DeviceFriProof", arthur: Arthur) -> bool:
        """Mirror of fri/fri.py::Fri.verify over packed quotient arrays."""
        cfg = self.config.fri_config
        ext = self.config.stark_field.extension
        ke = self.ke
        from ..fri import Fri

        fri = Fri(ext, cfg)
        commits, alphas, betas, deep_queries, deep_polys = fri.read_proof_transcript(arthur)
        assert len(commits) == cfg.rounds - 1
        assert len(commits) == len(proof.points)

        domain = Radix2EvaluationDomain(ext, 1 << cfg.rounds)
        prev_x3s = [domain.element(b) for b in betas]
        for i, (round_points, round_queries) in enumerate(zip(proof.points, proof.queries)):
            for j, (pts, paths) in enumerate(zip(round_points, round_queries)):
                (x1, y1), (x2, y2), (x3, y3) = pts
                path1, path2 = paths
                assert x1 == prev_x3s[j]
                assert ext.neg(x1) == x2
                assert ext.pow(x1, 2) == x3

                q = proof.quotients[i][j]
                q_len = q.shape[0] if isinstance(q, np.ndarray) else len(q.coeffs)
                q_deg = max(q_len - 1, 0)
                total_degree = q_deg + 3
                assert total_degree >= 2
                assert total_degree <= 1 << (cfg.rounds - i)
                # quotient/vanishing division result is discarded by the
                # reference (§8.5) — skipped entirely here

                a = ext.mul(ext.sub(y2, y1), ext.inv(ext.sub(x2, x1)))
                b = ext.sub(y1, ext.mul(a, x1))
                deep_adjusted_y = ext.add(
                    ext.mul(y3, ext.sub(x3, deep_queries[i])),
                    deep_polys[i].evaluate(alphas[i]),
                )
                g = DensePolynomial(ext, [b, a])
                assert g.evaluate(alphas[i]) == deep_adjusted_y

                assert y1 in path1.leaf_neighbours
                commits[i].check_proof(ext, path1)  # ignored (§8.5)
                assert y2 in path2.leaf_neighbours
                commits[i].check_proof(ext, path2)  # ignored (§8.5)
                prev_x3s[j] = x3
        return True


def _read_two_codewords(ke, prev, nxt, idxs_prev, idxs_next):
    """Fetch entries from two rounds' codewords; merges into ONE transfer
    when both are device-resident."""
    if (
        prev.device and nxt.device
        and isinstance(prev.codeword, jax.Array)
        and isinstance(nxt.codeword, jax.Array)
    ):
        i1 = jnp.asarray(np.asarray(idxs_prev, dtype=np.int32))
        i2 = jnp.asarray(np.asarray(idxs_next, dtype=np.int32))
        rows = np.asarray(_gather_two_jit(prev.codeword, nxt.codeword, i1, i2))
        vals = ke.unpack(rows)
        return vals[: len(idxs_prev)], vals[len(idxs_prev):]
    return prev.cw_read_many(idxs_prev), nxt.cw_read_many(idxs_next)


@jax.jit
def _gather_two_jit(a, b, i1, i2):
    return jnp.concatenate([a[i1], b[i2]], axis=0)


@partial(jax.jit, static_argnums=(0, 2))
def _proof_rows_jit(ext, reads, nq: int):
    """Interleave the gathered y1/y2 codeword rows into the proof-search
    order [y1_0, y2_0, y1_1, y2_1, ...] and the tree's leaf component
    format — the same values the host path would search by (§8.6)."""
    from ..commit.packed_tree import to_leaf_comps

    y = jnp.stack([reads[:nq], reads[nq:2 * nq]], axis=1)
    rows = y.reshape((2 * nq,) + tuple(reads.shape[1:]))
    return to_leaf_comps(ext, rows)


@dataclass
class _FriRoundRepr:
    device: bool
    ext: object
    ke: object
    coeffs: object        # device: packed jnp (trimmed); host: scalar list
    codeword: object      # device: packed np; host: scalar list
    tree: PackedMerkleTree
    size: int

    def cw_read(self, idx: int):
        return self.cw_read_many([idx])[0]

    def cw_read_many(self, idxs):
        if self.device:
            rows = np.asarray(self.codeword[np.asarray(idxs, dtype=np.int64)])
            return self.ke.unpack(rows)
        return [self.codeword[i] for i in idxs]


# --------------------------------------------------------------- jitted ops
#
# NOTE each piece is jitted SEPARATELY: XLA's CPU pipeline hits a pathological
# optimization blowup (minutes) when fold + powers-loop + suffix-loop fuse
# into one module, while the pieces each compile in ~1-2s. The host-side
# composition costs a few dispatches per FRI round — negligible.

_fold_jit = jax.jit(fold_even_odd, static_argnums=0)
_synth_div_jit = jax.jit(synth_div_suffix, static_argnums=0)


@partial(jax.jit, static_argnums=0)
def _deep_evals_jit(ke, coeffs, zp):
    fe, fo = eval_even_odd(ke, coeffs, zp)
    return fe, fo


_stack2_jit = jax.jit(lambda a, b: jnp.stack([a, b]))


@partial(jax.jit, static_argnums=0)
def _sub_head1_jit(ke, arr, v0):
    """arr - v0 on the constant coefficient only."""
    return jnp.concatenate([ke.sub(arr[0:1], v0[None]), arr[1:]], axis=0)


@partial(jax.jit, static_argnums=0)
def _sub_head2_jit(ke, arr, v0, v1):
    """arr - (v0 + v1*x) on the first two coefficients."""
    return jnp.concatenate(
        [ke.sub(arr[0:1], v0[None]), ke.sub(arr[1:2], v1[None]), arr[2:]], axis=0
    )


@partial(jax.jit, static_argnums=(0, 2))
def _pad_to_jit(ke, arr, n):
    pad = jnp.zeros((n - arr.shape[0],) + tuple(arr.shape[1:]), dtype=jnp.uint32)
    return jnp.concatenate([arr, pad], axis=0)


@partial(jax.jit, static_argnums=0)
def _fold_div_fused(ke, coeffs, zp, ap, dv, zinvp):
    """The whole fold round in ONE executable (TPU: each dispatch costs a
    ~40 ms tunnel round trip; the graph-size compile blowup that forces the
    split below is XLA:CPU-specific). Returns the quotient at its NATURAL
    halved length n/2 (geometric sizing: round r's executable runs at
    length n/2^r, so the whole FRI chain costs ~2 rounds' work instead of
    ~rounds x the first round's padded length)."""
    from ..ops.planar import fold_div_planes, get_planar
    from ..ops.poly_device import PLANAR_MIN

    n = coeffs.shape[0]
    pc = get_planar(ke)
    if pc is not None and n >= 2 * PLANAR_MIN:
        # planar end-to-end: ONE packed->planar->packed round trip for the
        # whole round (fold + DEEP subtract + divide); see ops/planar.py
        q = fold_div_planes(
            pc, pc.to_planes(coeffs), pc.scalar_planes(zp),
            pc.scalar_planes(ap), pc.scalar_planes(dv),
            pc.scalar_planes(zinvp),
        )
        return pc.from_planes(q)
    folded = fold_even_odd(ke, coeffs, ap)
    folded = jax.lax.optimization_barrier(folded)
    folded = jnp.concatenate([ke.sub(folded[0:1], dv[None]), folded[1:]],
                             axis=0)
    q = synth_div_suffix(ke, folded, zp, zinvp)
    pad = jnp.zeros((n // 2 - q.shape[0],) + tuple(q.shape[1:]),
                    dtype=jnp.uint32)
    return jnp.concatenate([q, pad], axis=0)


def _fold_div_jit(ke, coeffs, zp, ap, dv, zinvp):
    """One FRI fold round: fold even/odd, subtract the DEEP value at x^0,
    divide by (x - z); the result keeps its natural halved length (each
    round compiles one executable per geometric size — the persistent
    compile cache amortizes the extra shapes)."""
    if jax.default_backend() != "cpu":
        return _fold_div_fused(ke, coeffs, zp, ap, dv, zinvp)
    n = coeffs.shape[0]
    folded = _fold_jit(ke, coeffs, ap)
    zero = jnp.zeros_like(dv)
    folded = _sub_head2_jit(ke, folded, dv, zero)
    q = _synth_div_jit(ke, folded, zp, zinvp)
    return _pad_to_jit(ke, q, n // 2)


def _query_quotient_jit(ke, pc, ap_, bp_, x1p, x2p, x1inv_scale, x2inv_scale):
    num = _sub_head2_jit(ke, pc, bp_, ap_)
    q1 = _synth_div_jit(ke, num, x1p, x1inv_scale)
    q1 = _pad_to_jit(ke, q1, pc.shape[0])
    return _synth_div_jit(ke, q1, x2p, x2inv_scale)


@partial(jax.jit, static_argnums=0)
def _query_quotients_batch_jit(ke, pc, a_s, b_s, x1_s, x2_s, s1_s, s2_s):
    """Per-query quotients stacked (Q, n0-2, *elem) plus their effective
    lengths (Q,). vmapped over the query axis: ONE copy of the pipeline in
    the compiled module regardless of Q (the Q-unrolled form cost ~35s of
    XLA:CPU compile per round at n0=2^10)."""

    def one(a, b, x1, x2, s1, s2):
        num = jnp.concatenate(
            [ke.sub(pc[0:1], b[None]), ke.sub(pc[1:2], a[None]), pc[2:]],
            axis=0,
        )
        q1 = synth_div_suffix(ke, num, x1, s1)
        zpad = jnp.zeros((1,) + tuple(q1.shape[1:]), dtype=jnp.uint32)
        q1 = jnp.concatenate([q1, zpad], axis=0)
        q2 = synth_div_suffix(ke, q1, x2, s2)
        flat = q2.reshape(q2.shape[0], -1)
        nz = jnp.any(flat != 0, axis=1)
        idx = jnp.arange(q2.shape[0])
        return q2, jnp.max(jnp.where(nz, idx + 1, 0))

    return jax.vmap(one)(a_s, b_s, x1_s, x2_s, s1_s, s2_s)


@partial(jax.jit, static_argnums=0)
def _query_quotients_from_reads_jit(ke, pc, reads, dxinv_s,
                                    x1_s, x2_s, s1_s, s2_s):
    """Same as _query_quotients_batch_jit, but derives the interpolating
    line a*x + b from the codeword reads ON DEVICE (a = (y2-y1)/(x2-x1),
    b = y1 - a*x1), so the quotient dispatch never waits for the reads to
    cross to the host — every query round can be issued back-to-back and
    the device->host copies all stream concurrently.

    reads: the (3Q, *elem) _gather_two_jit output — y1 = reads[:Q],
    y2 = reads[Q:2Q] (the trailing Q rows are the next round's reads)."""
    Q = x1_s.shape[0]
    y1_s, y2_s = reads[:Q], reads[Q:2 * Q]
    a_s = ke.mul(ke.sub(y2_s, y1_s), dxinv_s)
    b_s = ke.sub(y1_s, ke.mul(a_s, x1_s))
    return _query_quotients_batch_jit(ke, pc, a_s, b_s, x1_s, x2_s, s1_s, s2_s)


_powers_jit = jax.jit(powers, static_argnums=(0, 2))
_eval_many_fused = jax.jit(eval_many, static_argnums=0)


@partial(jax.jit, static_argnums=0)
def _weighted_sum_jit(ke, coeffs_batch, pw):
    return field_sum(ke, ke.mul(coeffs_batch, pw[None]), axis=1)


def _eval_many_jit(ke, coeffs_batch, xp):
    if jax.default_backend() != "cpu":
        # one executable (planar inside); the split below works around the
        # XLA:CPU compile-time blowup on fused wide-integer mul chains
        return _eval_many_fused(ke, coeffs_batch, xp)
    pw = _powers_jit(ke, xp, coeffs_batch.shape[1])
    return _weighted_sum_jit(ke, coeffs_batch, pw)


@dataclass
class DeviceFriProof:
    """FRI proof with quotient coefficient vectors kept as packed arrays
    (host-tail rounds carry DensePolynomial quotients)."""

    ext: object
    ke: object
    points: List
    queries: List
    quotients: List  # [round][query] -> packed np array | DensePolynomial

    def to_host(self) -> FriProof:
        q = []
        for round_q in self.quotients:
            row = []
            for item in round_q:
                if isinstance(item, np.ndarray):
                    row.append(self.ke.unpack(item))
                else:
                    row.append(item.to_vec())
            q.append(row)
        return FriProof(points=self.points, queries=self.queries, quotients=q)
