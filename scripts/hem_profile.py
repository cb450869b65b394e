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

# Instrument per-level timing by tracing create_mixture manually.
orig = hem_ops.hem_cluster_level


def timed(*args, **kw):
    t0 = time.perf_counter()
    out = orig(*args, **kw)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
    gt = kw.get("grid_table")
    print(f"  level: {time.perf_counter() - t0:6.2f}s grid_table="
          f"{None if gt is None else tuple(gt.shape)}", flush=True)
    return out


hem_ops.hem_cluster_level = timed

for run in ("cold", "warm"):
    t0 = time.perf_counter()
    levels, stats = hem_ops.create_mixture(
        cloud, params, seed=0, backend="jax", with_stats=True
    )
    for lvl in levels:
        np.asarray(lvl.xyz)
    print(f"{run}: total {time.perf_counter() - t0:.2f}s "
          f"sizes={[l.xyz.shape[0] for l in levels]}", flush=True)

hem_ops.hem_cluster_level = orig

# Per-op profile of the WARM full 3-level pipeline.
from scripts.devtime import _parse  # noqa: E402
import tempfile, glob, shutil  # noqa: E402

d = tempfile.mkdtemp(prefix="hemprof")
with jax.profiler.trace(d):
    levels = hem_ops.create_mixture(cloud, params, seed=0, backend="jax")
    for lvl in levels:
        np.asarray(lvl.xyz)
mods, top = _parse(d, top_n=30)
print("module executions (ms):", [round(m * 1000, 1) for m in mods][:20])
print("top ops (total ms):")
for name, ms in top:
    print(f"  {ms * 1000:8.1f}  {name}")
shutil.rmtree(d, ignore_errors=True)
