import os
import sys

# jax is pre-imported by the environment's sitecustomize with the TPU (axon)
# backend selected; tests force an 8-device virtual CPU mesh instead so
# multi-chip sharding paths run without TPU hardware (the driver dry-runs the
# real TPU path separately).
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU's default backend optimization level (3) hits pathological LLVM
# compile times (minutes for a handful of chained wide-integer field muls);
# level 1 compiles the same graphs in ~1s with negligible runtime impact.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# field-kernel graphs are wide; cache compiled executables across test runs
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
