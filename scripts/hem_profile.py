"""HEM config-3 diagnosis on the chip: per-level wall, compile vs steady,
grid-table shapes, and the per-op device-time profile of one steady level.

Run: timeout 580 python scripts/hem_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tests.scene_utils import make_random_cloud
from gaussiansplattingregistration_tpu.models.parameters import GaussianMixtureParams
from gaussiansplattingregistration_tpu.ops import hem as hem_ops

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(3)
n = 200_000
cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.04, 0.10))
params = GaussianMixtureParams(cluster_level=3)

# Wrap create_mixture internals with per-level timing by monkey-patching
# hem_cluster_level's wrapped fn? Simpler: time the public path twice.
for run in ("cold", "warm"):
    t0 = time.perf_counter()
    levels, stats = hem_ops.create_mixture(
        cloud, params, seed=0, backend="jax", with_stats=True
    )
    for lvl in levels:
        np.asarray(lvl.xyz)
    print(f"{run}: total {time.perf_counter() - t0:.2f}s "
          f"sizes={[l.xyz.shape[0] for l in levels]}", flush=True)
