"""Step-by-step timing for the sharded DeviceEngine prove (CPU mesh).

Run: python scripts/debug_sharded.py [log2_steps]
Dumps a stack trace every 120s so slow/hung phases are visible.
"""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(120, repeat=True)

# NOTE: XLA_FLAGS may exist as an EMPTY string in this environment —
# setdefault would no-op and leave the pathological opt level 3 (minutes per
# compile). Always append.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from ministark_tpu.utils.cache import setup_jax_cache

setup_jax_cache()
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

t0 = time.time()


def mark(label):
    print(f"[{time.time() - t0:7.1f}s] {label}", flush=True)


mark("jax ready")

from ministark_tpu.fields import Goldilocks
from ministark_tpu.models.fibonacci_device import fibonacci_device_trace
from ministark_tpu.parallel import make_mesh
from ministark_tpu.stark import StarkConfig
from ministark_tpu.stark.engine import DeviceEngine

mark("imports done")

log2_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
import ministark_tpu.stark.engine as eng

eng.DEVICE_MIN_SIZE = 256

sf = Goldilocks
steps = (1 << log2_steps) - 1
dtrace = fibonacci_device_trace(sf, steps)
mark("trace built")
cfg = StarkConfig(sf, 20, 2, steps, dtrace.constrain_number())
mark("config built")

os.environ["MINISTARK_TRACE"] = "1"
single = DeviceEngine(cfg).prove(fibonacci_device_trace(sf, steps))
mark("single prove done")

os.environ["MINISTARK_DEVICE_HASH"] = "1"
mesh = make_mesh(8)
sharded = DeviceEngine(cfg, mesh=mesh).prove(fibonacci_device_trace(sf, steps))
mark("sharded prove done")

assert sharded.arthur == single.arthur, "transcript differs"
fa, fb = sharded.fri_proof.to_host(), single.fri_proof.to_host()
assert fa.points == fb.points and fa.quotients == fb.quotients
mark("byte-equality verified OK")
