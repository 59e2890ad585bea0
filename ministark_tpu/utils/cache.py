"""Host-scoped JAX compilation cache directory.

The persistent compile cache serializes AOT executables. CPU executables are
compiled FOR THE BUILD HOST's CPU features (this environment's driver moves
the repo between machines with different avx512 feature sets), and loading
one on a host missing those features SIGILLs/segfaults inside
``compilation_cache.get_executable_and_time`` (observed: a full-suite
segfault after the repo migrated hosts). Scope the cache directory by a
fingerprint of the host CPU so every machine keeps its own entries; TPU
executables are remote-compiled and land in the same per-host dir (cheap —
they re-fetch once per host).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
                if line.startswith("model name"):
                    bits.append(line.strip())
    except OSError:
        bits.append(platform.processor())
    # NOTE the cpu_aot_loader "+prefer-no-scatter/+prefer-no-gather is not
    # supported on the host machine" errors are BENIGN NOISE on every AOT
    # load on this host class (reproduced with a same-process-flavor write
    # and reload): the compiler records tuning *preferences* in the target
    # feature list while the runtime host-feature list never contains them.
    # They are not the cross-host mismatch this fingerprint guards against.
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def jax_cache_dir(repo_root: str = None) -> str:
    """`.jax_cache/<cpu-fingerprint>` under the repo root (created).

    MINISTARK_CACHE_DIR overrides the location — used by cold-start
    experiments (point at an empty dir to reproduce the driver's
    fully-cold first run without discarding the real cache)."""
    override = os.environ.get("MINISTARK_CACHE_DIR")
    if override:
        os.makedirs(override, exist_ok=True)
        return override
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    d = os.path.join(repo_root, ".jax_cache", _cpu_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def setup_jax_cache(repo_root: str = None, min_compile_secs: float = 0.3):
    """Point jax at the host-scoped cache (safe to call repeatedly)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", jax_cache_dir(repo_root))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
