"""A/B the round-5 raster changes on chip: bf16 ct transport x pose batching.

Run: timeout 580 python scripts/raster_ab.py [variants...]
Variants: base, bf16, batch, both (default: all four).
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig, rasterize_arrays,
)

W, H, N = 1280, 720, 1_000_000
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
xyz = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
scales = rng.uniform(0.002, 0.006, size=(N, 3)).astype(np.float32)
quats = rng.normal(size=(N, 4)).astype(np.float32)
cov = np.asarray(math3d.covariance_from_scaling_rotation(
    jnp.asarray(scales), jnp.asarray(quats)))
op = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 1.0, size=N)))).astype(np.float32)
feat = (rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32)
f = W / (2 * math.tan(math.radians(70) / 2))
cams = []
for yaw in (0.0, 0.35, -0.35):
    R = np.asarray(math3d.axis_angle_to_rotmat(
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(yaw)))
    cams.append(Camera.create(R, [0.0, 0.0, 3.0], f, f, W, H))
vms = jnp.stack([c.viewmat for c in cams])
intr = cams[0].intrinsics
bg = jnp.zeros(3, jnp.float32)
args = (jnp.asarray(xyz), jnp.asarray(cov), jnp.asarray(op), jnp.asarray(feat))


def make(bf16, batch, live_cap=None):
    config = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=384, tile_chunk=32,
        backend="pallas", max_bwd_splats_per_tile=None, bwd_sort_bf16=bf16,
        max_live_tiles=live_cap,
    )

    def loss(means, cov3d, o, ft):
        if batch:
            def one(vm):
                rgb, _, _ = rasterize_arrays(
                    means, cov3d, o, ft, vm, intr, W, H, 0, bg, config)
                return jnp.sum(rgb)

            return jnp.sum(jax.lax.map(one, vms))
        rgb, _, _ = rasterize_arrays(
            means, cov3d, o, ft, vms[0], intr, W, H, 0, bg, config)
        return jnp.sum(rgb)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))), (3 if batch else 1)


VARIANTS = {"base": (False, False, None), "bf16": (True, False, None),
            "batch": (False, True, None), "both": (True, True, None),
            "bf16cap": (True, False, 2872)}
want = sys.argv[1:] or list(VARIANTS)
for name in want:
    bf16, batch, cap = VARIANTS[name]
    fn, nframes = make(bf16, batch, cap)
    g = fn(*args)
    jax.block_until_ready(g)
    iters = max(1, 16 // nframes)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = fn(*args)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / (iters * nframes)
    print(f"{name}: {dt * 1000:.2f} ms/frame -> "
          f"{W * H / dt / 1e6:.2f} Mpx/s", flush=True)
