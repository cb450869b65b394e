"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by faking host devices
(the distributed-test strategy from SURVEY.md §4). Env vars must be set before
jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel and
# a sitecustomize pre-imports jax, so the env var alone is too late — use
# jax.config.update, which works as long as no backend is initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_random_cloud(rng, n=64, sh_degree=2, scale_range=(0.01, 0.1)):
    """Synthetic GaussianCloud for tests."""
    import jax.numpy as jnp

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


@pytest.fixture
def random_cloud(rng):
    return make_random_cloud(rng)
