"""Synthetic-scene helpers shared by tests AND benchmarks.

Import side-effect-free: `tests/conftest.py` forces the CPU backend at import
time (correct for the test suite), which silently moved any BENCHMARK that
imported `make_random_cloud` from there onto the CPU when it was the first
jax-touching import (measured: 3-level HEM at 200k = 360 s on CPU vs 34 s on
TPU — a 10x phantom regression). Scene builders live here instead.
"""

import numpy as np


def make_random_cloud(rng, n=64, sh_degree=2, scale_range=(0.01, 0.1)):
    """Synthetic GaussianCloud for tests/benchmarks."""
    import jax.numpy as jnp  # noqa: F401  (touches jax only at call time)

    from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud

    k_rest = (sh_degree + 1) ** 2 - 1
    quats = rng.normal(size=(n, 4))
    return GaussianCloud.create(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.5,
        features_rest=rng.normal(size=(n, k_rest, 3)).astype(np.float32) * 0.1,
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=np.log(rng.uniform(*scale_range, size=(n, 3))).astype(np.float32),
        rotation=quats.astype(np.float32),
        sh_degree=sh_degree,
    )
