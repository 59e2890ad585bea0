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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# field-kernel graphs are wide; cache compiled executables across test runs.
# The cache dir is HOST-scoped (utils/cache.py): loading CPU executables
# compiled on a different machine's feature set segfaults the process.
from ministark_tpu.utils.cache import setup_jax_cache  # noqa: E402

setup_jax_cache()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Release compiled executables after every test module.

    A long-lived process accumulating the full suite's executables
    eventually SEGFAULTS XLA:CPU — three round-3 full-suite crashes, all
    ~200 tests in (always around tests/test_stir.py), each at a different
    spot of the executable machinery (serialize, deserialize, plain
    backend_compile), while every crashing test passes in a fresh process.
    Clearing between modules bounds the live set; the persistent compile
    cache makes the cross-module recompiles cheap loads."""
    yield
    import jax

    jax.clear_caches()
