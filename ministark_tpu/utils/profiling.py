"""Profiling hooks (reference has none — SURVEY §5 lists this as a required
new subsystem for the roofline targets).

Set MINISTARK_PROFILE=<dir> to capture a jax.profiler trace of the hot
sections (viewable in TensorBoard / xprof), and MINISTARK_TRACE=1 for
host-side phase timings (stark/engine.py).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_profile(section: str):
    out = os.environ.get("MINISTARK_PROFILE")
    if not out:
        yield
        return
    import jax

    path = os.path.join(out, section)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """TraceAnnotation for kernels inside a profiled region."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
