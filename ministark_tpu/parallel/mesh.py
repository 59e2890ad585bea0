"""Device mesh construction for multi-chip proving.

The reference has zero parallelism (SURVEY §2.3); scaling out is new design:
one 1-D mesh axis ("shards") over which trace rows / polynomial coefficients
are partitioned, with XLA collectives (all_to_all for NTT butterfly-stage
transposes, all_gather/psum for Merkle/fold reductions) riding ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "shards"


def default_axis() -> str:
    return AXIS


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"requested {n_devices} of {len(devs)} devices"
    return Mesh(np.array(devs[:n_devices]), (AXIS,))
