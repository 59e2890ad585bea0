"""Headline benchmark: end-to-end STARK prove for a 2^20-row Fibonacci AIR
over Goldilocks(+Fp2) on one TPU chip (BASELINE.json config 4's trace scale).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline methodology (the reference publishes no numbers — BASELINE.md):
the baseline is this framework's own host-exact oracle (the same protocol in
pure Python, the reference's single-core execution model) measured at
BENCH_BASE_STEPS rows and extrapolated by N log N to the benchmark size.
vs_baseline > 1 means the TPU engine is faster than the single-core oracle.

Env overrides: BENCH_STEPS (default 2^20 - 1), BENCH_BASE_STEPS (default
2^13 - 1), BENCH_SKIP_VERIFY=1.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache(os.path.dirname(os.path.abspath(__file__)))


# Calibration for vs_baseline (BASELINE.md "Calibration"): the host oracle
# is pure-Python bigint arithmetic; the reference is single-core Rust over
# ark-ff Montgomery fields. Measured: 258 ns per oracle Goldilocks mul on
# this class of host vs ~6.5 ns for an ark-ff Fp64 Montgomery mul — both
# provers execute the same N log N op sequence, so the oracle is ~40x the
# reference. vs_baseline = vs_host_oracle / 40 estimates the honest
# speedup over the reference itself; the raw ratio ships alongside.
PY_VS_RUST_FACTOR = 40.0


def _field():
    from ministark_tpu.fields import BabyBear, Goldilocks

    return {"goldilocks": Goldilocks, "babybear": BabyBear}[
        os.environ.get("BENCH_FIELD", "goldilocks")
    ]


def _device_trace(sf, steps):
    """The BENCH_MODEL trace for the device provers (one selection point)."""
    on_dev = os.environ.get("BENCH_TRACE_DEVICE", "1") == "1"
    model = os.environ.get("BENCH_MODEL", "fibonacci")
    if model == "counter":
        from ministark_tpu.models.counter import counter_device_trace

        return counter_device_trace(sf, steps, on_device=on_dev)
    if model == "lfsr":
        from ministark_tpu.models.lfsr import lfsr_device_trace

        return lfsr_device_trace(sf, steps)
    if model == "mimc":
        from ministark_tpu.models.mimc import mimc_device_trace

        return mimc_device_trace(sf, steps)
    from ministark_tpu.models.fibonacci_device import fibonacci_device_trace

    return fibonacci_device_trace(sf, steps, on_device=on_dev)


def _host_claim(base, steps):
    """The matching host-oracle claim/witness for BENCH_MODEL."""
    model = os.environ.get("BENCH_MODEL", "fibonacci")
    if model == "counter":
        from ministark_tpu.models.counter import CounterClaim

        return CounterClaim(field=base, steps=steps), None
    if model == "lfsr":
        from ministark_tpu.models.lfsr import LfsrClaim

        return LfsrClaim(field=base, steps=steps), None
    if model == "mimc":
        from ministark_tpu.models.mimc import (
            MimcClaim,
            MimcWitness,
            mimc_chain_output,
        )

        out = mimc_chain_output(base.p, steps, 3)
        return (MimcClaim(field=base, steps=steps, output=out),
                MimcWitness(s0=3))
    from ministark_tpu.models import FibonacciClaim, Witness

    return (FibonacciClaim(field=base, step=steps, output=base.from_int(13)),
            Witness(secret_b=base.from_int(2)))


def device_prove(steps):
    import jax.numpy as jnp

    from ministark_tpu.stark import StarkConfig
    from ministark_tpu.stark.engine import DeviceEngine

    sf = _field()
    dtrace = _device_trace(sf, steps)
    cfg = StarkConfig(sf, 20, 2, steps, dtrace.constrain_number())
    engine = DeviceEngine(cfg)

    t0 = time.time()
    proof = engine.prove(dtrace)
    t_prove = time.time() - t0

    # engine-internal per-phase wall seconds: device_s separates engine time
    # from the tunnel's dispatch/transfer noise in the driver JSON
    phases = dict(engine.phase_seconds)
    extras = {
        "device_s": round(sum(phases.values()), 2),
        "phases": {k: round(v, 2) for k, v in sorted(
            phases.items(), key=lambda kv: -kv[1])[:8]},
    }

    t_verify = None
    if os.environ.get("BENCH_SKIP_VERIFY") != "1":
        tp = engine._trace_polys(dtrace)
        trans = [f(tp) for f in dtrace.transitions]
        all_coeffs = jnp.concatenate([tp] + [t[None] for t in trans], axis=0)
        t0 = time.time()
        assert engine.verify(all_coeffs, proof)
        t_verify = time.time() - t0
    return t_prove, t_verify, extras


def fast_prove(steps):
    """BENCH_MODE=fast: the non-parity FastStark (batched FRI, 4-ary
    trees, binary row hashing — BASELINE config 4). BENCH_MODE=stir /
    BENCH_MODE=whir swap the LDE backend (fri/stir.py, fri/whir.py:
    geometrically decaying query counts, smallest proofs)."""
    from ministark_tpu.stark.fast import FastStark, FastStarkConfig

    sf = _field()
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # prove_many(B traces)
    traces = [_device_trace(sf, steps) for _ in range(batch)]
    stark = FastStark(FastStarkConfig(
        sf, steps, queries=32, arity=int(os.environ.get("BENCH_ARITY", "4")),
        lde_backend=(os.environ.get("BENCH_MODE")
                     if os.environ.get("BENCH_MODE") in ("stir", "whir")
                     else "fri"),
    ))

    t0 = time.time()
    proof = stark.prove_many(traces)
    t_prove = (time.time() - t0) / batch   # per-trace: rows/s counts B*steps

    t_verify = None
    if os.environ.get("BENCH_SKIP_VERIFY") != "1":
        cons = [stark._constraint_polys(t) for t in traces]
        t0 = time.time()
        assert stark.verify_many(cons, proof)
        t_verify = time.time() - t0
    print(f"# fast proof size {proof.size_bytes() / 1e6:.2f} MB"
          f" (batch {batch})", file=sys.stderr)
    phases = dict(stark.phase_seconds)
    return t_prove, t_verify, {
        "proof_bytes": proof.size_bytes(),
        "device_s": round(sum(phases.values()), 2),
        "phases": {k: round(v, 2) for k, v in sorted(
            phases.items(), key=lambda kv: -kv[1])[:8]},
    }


def host_prove(steps):
    from ministark_tpu.ops import set_device_enabled
    from ministark_tpu.stark import Stark, StarkConfig

    sf = _field()
    set_device_enabled(False)
    try:
        claim, witness = _host_claim(sf.base, steps)
        trace = claim.trace(witness)
        cfg = StarkConfig(sf, 20, 2, steps, trace.constrain_number())
        stark = Stark(cfg)
        # best of two: host wall time swings ~2x with machine load, and the
        # oracle seconds feed the vs_baseline estimate directly
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            stark.prove(claim, witness)
            best = min(best, time.time() - t0)
        return best
    finally:
        set_device_enabled(True)


def main():
    os.environ.setdefault("MINISTARK_DEVICE_HASH", "1")
    steps = int(os.environ.get("BENCH_STEPS", (1 << 20) - 1))
    base_steps = int(os.environ.get("BENCH_BASE_STEPS", (1 << 13) - 1))

    # First device dispatch through this environment's TPU tunnel costs
    # minutes (session establishment), and each executable compiles once per
    # process; run prove once cold to absorb both, then measure steady state
    # (the production regime: a prover service proves many traces).
    import jax.numpy as jnp

    jnp.zeros((8, 128), jnp.uint32).sum().block_until_ready()  # tunnel warmup
    prove_fn = (fast_prove
                if os.environ.get("BENCH_MODE") in ("fast", "stir", "whir")
                else device_prove)
    t_cold, _ = (prove_fn(steps)[0], None) if os.environ.get("BENCH_COLD_ONLY") != "1" else (None, None)
    # the tunnel's transfer/dispatch latency swings 2-3x between runs;
    # steady-state = best of two measured proves (standard for noisy hosts)
    t_prove, t_verify, extras = prove_fn(steps)
    t_prove2, t_verify2, extras2 = prove_fn(steps)
    if t_prove2 < t_prove:
        t_prove, extras = t_prove2, extras2
    if t_verify is not None and t_verify2 is not None:
        t_verify = min(t_verify, t_verify2)
    rows_per_s = steps / t_prove
    print(f"# cold prove {t_cold if t_cold is None else round(t_cold, 2)}s", file=sys.stderr)

    t_host = host_prove(base_steps)
    # N log N extrapolation of the single-core oracle to the benchmark size
    scale = (steps * math.log2(steps)) / (base_steps * math.log2(base_steps))
    t_host_extrapolated = t_host * scale
    vs_host_oracle = t_host_extrapolated / t_prove
    # The reference publishes no numbers and no Rust toolchain exists here;
    # the honest baseline estimate divides the raw host-oracle ratio by the
    # documented pure-Python-vs-single-core-Rust factor for this protocol
    # (BASELINE.md "Calibration": CPython bigint Fp mul ~40x an ark-ff
    # Montgomery mul; both provers are N log N in the same ops).
    vs_baseline = vs_host_oracle / PY_VS_RUST_FACTOR

    # per-kernel roofline fractions (VERDICT r1 item 6: the BASELINE metric,
    # driver-visible alongside e2e rows/s). Skippable for tight budgets.
    kernels = {}
    if os.environ.get("BENCH_SKIP_KERNELS") != "1":
        try:
            from bench_kernels import kernel_rooflines

            # deadline-aware: on a cold host the kernel compiles can eat the
            # whole attempt budget; better to ship the headline with partial
            # kernels than to die to the orchestrator's timeout
            deadline = None
            if os.environ.get("BENCH_INNER_DEADLINE"):
                deadline = float(os.environ["BENCH_INNER_DEADLINE"])
            for r in kernel_rooflines(deadline=deadline):
                entry = {"value": r["value"], "unit": r["unit"]}
                if "roofline_frac" in r:
                    entry["roofline_frac"] = r["roofline_frac"]
                kernels[r["metric"]] = entry
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# kernel roofline measurement failed: {e}", file=sys.stderr)

    model = os.environ.get("BENCH_MODEL", "fibonacci")
    tag = "fib" if model == "fibonacci" else model
    if os.environ.get("BENCH_MODE") in ("fast", "stir", "whir"):
        tag = os.environ["BENCH_MODE"] + "_" + tag
    out = {
        "metric": f"e2e_prove_rows_per_s_{tag}{steps}_" + os.environ.get("BENCH_FIELD", "goldilocks"),
        "value": round(rows_per_s, 1),
        "unit": "rows/s",
        "vs_baseline": round(vs_baseline, 2),
        "vs_host_oracle": round(vs_host_oracle, 2),
        "host_oracle_s": round(t_host, 2),
        "kernels": kernels,
    }
    out.update(extras)
    print(json.dumps(out))
    print(
        f"# prove {t_prove:.2f}s | verify {t_verify if t_verify is None else round(t_verify, 2)}s | "
        f"host-oracle {t_host:.2f}s @ {base_steps} rows -> {t_host_extrapolated:.1f}s extrapolated",
        file=sys.stderr,
    )


def _tunnel_alive(timeout_s: int = 90) -> bool:
    """Probe the TPU backend in a short-lived subprocess: when the tunnel
    service is wedged, jax.devices() hangs indefinitely (even CPU requests
    via the preloaded plugin), so never probe in-process."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return proc.returncode == 0 and "ok" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def _sub_entry(here: str, steps: str, budget: int = 900, label: str = "",
               **extra_env):
    """One bounded-subprocess e2e prove with env overrides; returns a
    kernels-dict entry (rows/s + proof bytes) or None (the parity headline
    never depends on these side measurements)."""
    import subprocess

    env = dict(os.environ, BENCH_INNER="1", BENCH_STEPS=steps,
               BENCH_SKIP_KERNELS="1", **extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, here], env=env, timeout=budget,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"# {label} e2e timed out after {budget}s; skipped",
              file=sys.stderr)
        return None
    sys.stderr.write(proc.stderr)
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not json_lines:
        print(f"# {label} e2e failed rc={proc.returncode}", file=sys.stderr)
        return None
    d = json.loads(json_lines[-1])
    entry = {"value": d["value"], "unit": d["unit"]}
    for k in ("proof_bytes", "device_s", "phases"):
        if k in d:
            entry[k] = d[k]
    return entry


def _emit(data):
    """Print the CURRENT best snapshot as one complete JSON line and flush.

    The driver parses the LAST parseable line on stdout, so re-emitting a
    progressively richer snapshot after every completed measurement means a
    kill at ANY point loses only the in-flight entry — round 4 died with
    rc=124 before the single end-of-run print and shipped nothing."""
    sys.stdout.write(json.dumps(data) + "\n")
    sys.stdout.flush()


def orchestrate():
    """Run the measurement in subprocesses with retries: the environment's
    remote-compile service intermittently wedges for many minutes; a killed
    attempt loses little because compiled executables persist in .jax_cache.
    Falls back to a smaller trace if the full size keeps failing.

    JSON-unloseable discipline (VERDICT r4 item 1): the headline prints the
    moment attempt 1 succeeds; every side entry re-prints the enriched
    snapshot; all budgets are clamped to the global deadline with a final
    reserve; SIGTERM re-emits the last snapshot before dying."""
    import signal
    import subprocess

    here = os.path.abspath(__file__)
    # global deadline: the side entries (fast/stir/babybear) are optional —
    # never let them push a JSON print past the driver's patience. Round 4's
    # rc=124 proves the driver window is below the old 3300 s plan + probe —
    # but with INCREMENTAL emission an overrun only loses the in-flight
    # entry (the last printed line stands), so the budget can sit close to
    # the window instead of safely under it.
    reserve = 45
    deadline = time.time() + int(os.environ.get("BENCH_TOTAL_BUDGET", "3450"))
    snapshot = {}

    def _on_term(signum, frame):  # driver timeout sends SIGTERM first
        if snapshot:
            _emit(snapshot)
        sys.exit(1)

    signal.signal(signal.SIGTERM, _on_term)

    # if the tunnel is down, wait it out (up to ~20 min) before burning
    # measurement budgets on hung subprocesses
    for _ in range(10):
        if _tunnel_alive():
            break
        print("# TPU tunnel unresponsive; waiting 120s", file=sys.stderr)
        time.sleep(120)
    # first attempt gets the lion's share: a fully cold host pays many
    # minutes of remote compiles for the geometric FRI executables alone
    # (444.75 s cold prove in the r04 tail) and every compile persists in
    # .jax_cache, so even a timed-out first attempt leaves attempt 2 warm
    tries = [
        (os.environ.get("BENCH_STEPS", str((1 << 20) - 1)), 1800),
        (os.environ.get("BENCH_STEPS", str((1 << 20) - 1)), 900),
        (str((1 << 17) - 1), 600),
    ]
    data = None
    cold_host = False
    for steps, budget in tries:
        budget = min(budget, int(deadline - time.time() - reserve))
        if budget < 180:
            break
        env = dict(os.environ, BENCH_INNER="1", BENCH_STEPS=steps,
                   BENCH_INNER_DEADLINE=str(time.time() + budget - 90))
        try:
            proc = subprocess.run(
                [sys.executable, here], env=env, timeout=budget,
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"# bench attempt (steps={steps}) timed out after {budget}s; retrying",
                  file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        # cold-host detection: the host-scoped cache means the driver's
        # machine is usually fully cold; a long cold prove caps the side list
        for line in proc.stderr.splitlines():
            if line.startswith("# cold prove"):
                try:
                    cold_host = float(line.split()[3].rstrip("s")) > 300
                except (IndexError, ValueError):
                    pass
        json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and json_lines:
            data = json.loads(json_lines[-1])
            break
        print(f"# bench attempt failed rc={proc.returncode}", file=sys.stderr)
    if data is None:
        _emit({"metric": "e2e_prove_rows_per_s", "value": 0.0,
               "unit": "rows/s", "vs_baseline": 0.0})
        return 1
    snapshot.update(data)
    _emit(snapshot)  # headline is now unloseable
    if os.environ.get("BENCH_MODE") not in ("fast", "stir", "whir"):
        # side entries in priority order (VERDICT r4 items 3 and 7 put
        # babybear/2^22/batch4 ahead of stir/whir/mimc); compiled
        # executables persist in .jax_cache, so pre-warmed configs cost
        # ~1-2 min each, cold ones ~4-5 min
        side = [
            # (kernels key, steps, extra env)
            ("fast_e2e_prove", steps, {"BENCH_MODE": "fast"}),
            ("babybear_e2e_prove_2^20", str((1 << 20) - 1),
             {"BENCH_FIELD": "babybear"}),
            ("fast_e2e_prove_2^22", str((1 << 22) - 1),
             {"BENCH_MODE": "fast"}),
            ("fast_prove_many_batch4", steps,
             {"BENCH_MODE": "fast", "BENCH_BATCH": "4"}),
            ("stir_e2e_prove", steps, {"BENCH_MODE": "stir"}),
            ("whir_e2e_prove", steps, {"BENCH_MODE": "whir"}),
            ("mimc_e2e_prove", steps, {"BENCH_MODEL": "mimc"}),
        ]
        if os.environ.get("BENCH_FIELD", "goldilocks") != "goldilocks":
            side = [s for s in side if "babybear" not in s[0]]
        if cold_host:
            # every entry is a cold multi-minute compile on this host;
            # keep only the highest-value ones (the headline is already out)
            side = side[:4]
            print("# cold host detected; side list capped to 4",
                  file=sys.stderr)
        for key, ssteps, extra in side:
            left = int(deadline - time.time() - reserve)
            if left < 240:
                print(f"# skipping {key} entry: {left}s budget left",
                      file=sys.stderr)
                continue
            e = _sub_entry(here, ssteps, budget=min(1200, left),
                           label=key, **extra)
            if e is not None:
                snapshot.setdefault("kernels", {})[key] = e
                _emit(snapshot)  # each completed entry is unloseable too
    return 0


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        main()
    else:
        sys.exit(orchestrate())
