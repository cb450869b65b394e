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


# Re-exported from the side-effect-free module (benchmarks import it from
# tests.scene_utils directly — importing THIS module flips jax to CPU).
from tests.scene_utils import make_random_cloud  # noqa: E402,F401


@pytest.fixture
def random_cloud(rng):
    return make_random_cloud(rng)
