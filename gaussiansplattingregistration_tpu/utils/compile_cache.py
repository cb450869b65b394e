"""Persistent XLA compilation cache for cold-start latency.

TPU first-compiles dominate cold-start wall (the 3-level HEM pipeline alone
is a ~40 s compile through a remote-compile tunnel; the bench rasterizer
another ~60 s). JAX's persistent compilation cache keys executables by a
fingerprint of (program, jax/XLA version, backend topology, flags), so
enabling it is safe across version changes — mismatches fall back to a
plain compile. Measured through the axon tunnel: a 1.5 s compile replays
from cache in 0.15 s in a fresh process.

The reference has no counterpart (PyTorch/Open3D pay their JIT/startup cost
per process); this is part of the TPU-native cold-start story.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache. Returns the directory used,
    or None when disabled via GSR_NO_COMPILE_CACHE=1 or setup failure.

    Call before the first jit compilation for full effect (late calls still
    cache subsequent compiles). Default location: $GSR_COMPILE_CACHE, else
    ~/.cache/gsr_tpu/jax.
    """
    if os.environ.get("GSR_NO_COMPILE_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("GSR_COMPILE_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "gsr_tpu", "jax"
        )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache anything that takes >= 1 s to compile (default 60 s would
        # skip most of the mid-size executables that dominate CLI latency).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
