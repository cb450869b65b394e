"""TPU-executed test tier (VERDICT r1 item #2).

The main suite (`tests/`) pins JAX to a virtual 8-device CPU mesh, where
Pallas runs in interpret mode — it cannot catch Mosaic lowering failures,
VMEM blowups, or TPU-only numeric drift (that is how the round-1 SMEM bug
shipped). This tier runs on the REAL chip and is skipped entirely when no
TPU is attached.

Gate:  python -m pytest tests_tpu -q   (run before committing kernel changes;
`scripts/tpu_gate.sh` runs both suites).
"""

import jax
import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU attached; tier requires the real chip")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(7)
