"""Correlate SPMD remat warnings with jit names (parity sharded prove)."""

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
    env.pop("PYTHONPATH", None)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, timeout=1800, capture_output=True, text=True)
    interesting = [l for l in proc.stderr.splitlines()
                   if "Involuntary" in l or "Finished jaxpr to MLIR" in l
                   or "Compiling " in l]
    for l in interesting:
        print(l[:200])
    print(f"rc={proc.returncode}")
    sys.exit(0)

import jax  # noqa: E402

jax.config.update("jax_log_compiles", True)

from ministark_tpu.utils.cache import setup_jax_cache  # noqa: E402

setup_jax_cache(HERE)

import ministark_tpu.stark.engine as eng  # noqa: E402
from ministark_tpu.fields import Goldilocks  # noqa: E402
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace  # noqa: E402
from ministark_tpu.parallel import make_mesh  # noqa: E402
from ministark_tpu.stark import StarkConfig  # noqa: E402
from ministark_tpu.stark.engine import DeviceEngine  # noqa: E402

eng.DEVICE_MIN_SIZE = 256
sf = Goldilocks
steps = int(os.environ.get("REPRO_STEPS", "2047"))
mesh = make_mesh(8)
dtrace = fibonacci_device_trace(sf, steps)
cfg = StarkConfig(sf, 20, 2, steps, dtrace.constrain_number())
os.environ["MINISTARK_DEVICE_HASH"] = "1"
proof = DeviceEngine(cfg, mesh=mesh).prove(dtrace)
print("prove done", len(proof.arthur))
