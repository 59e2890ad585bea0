import os
import sys

# jax is pre-imported by the environment's sitecustomize with the TPU (axon)
# backend selected; tests force an 8-device virtual CPU mesh instead so
# multi-chip sharding paths run without TPU hardware (the driver dry-runs the
# real TPU path separately).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
