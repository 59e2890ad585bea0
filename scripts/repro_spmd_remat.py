"""Reproduce the SPMD 'Involuntary full rematerialization' warnings from the
sharded fast path (VERDICT r2 weak #6 / item 4) on the virtual CPU mesh.

Run:  python scripts/repro_spmd_remat.py  (re-execs itself with a clean env)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

if os.environ.get("REPRO_SUB") != "1":
    env = dict(os.environ)
    env["REPRO_SUB"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_backend_optimization_level=1"
    ).strip()
    env["TF_CPP_MIN_LOG_LEVEL"] = "0"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, timeout=1200, capture_output=True, text=True)
    lines = proc.stderr.splitlines()
    warn = [l for l in lines if "Involuntary full rematerialization" in l]
    print(f"rc={proc.returncode}, remat warnings: {len(warn)}")
    for w in warn[:12]:
        print(w)
    if proc.returncode != 0:
        print("STDERR tail:")
        print("\n".join(lines[-30:]))
    sys.exit(0)

import jax  # noqa: E402

from ministark_tpu.utils.cache import setup_jax_cache  # noqa: E402

setup_jax_cache(HERE)

from ministark_tpu.fields import Goldilocks  # noqa: E402
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace  # noqa: E402
from ministark_tpu.parallel import make_mesh  # noqa: E402
from ministark_tpu.stark.fast import FastStark, FastStarkConfig  # noqa: E402

sf = Goldilocks
mesh = make_mesh(8)
fsteps = int(os.environ.get("REPRO_STEPS", "255"))
fdtrace = fibonacci_device_trace(sf, fsteps)
fcfg = FastStarkConfig(sf, fsteps, queries=4, final_len=16)
proof = FastStark(fcfg, mesh=mesh).prove(fdtrace)
print("prove done", proof.fri_proof.n)
