"""End-to-end ablation timing of rasterize_arrays at bench shapes.

Micro-timings are unreliable under the axon tunnel, so each variant is a
full jitted pipeline prefix; stage costs are differences between variants.
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    _build_tile_table,
    compute_view_colors,
    gather_entries,
    project_gaussians,
    rasterize_arrays,
)

WIDTH, HEIGHT = 1280, 720
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "xla"


def timed(name, fn, *args, iters=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.006, size=(N, 3)).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    cov = np.asarray(
        math3d.covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    opacity = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 1.0, size=N)))).astype(np.float32)
    features = (rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32)

    f = WIDTH / (2 * math.tan(math.radians(70) / 2))
    cam = Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, WIDTH, HEIGHT)

    config = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=512, tile_chunk=32,
        backend=BACKEND,
    )
    ts = config.tile_size
    tiles_x = -(-WIDTH // ts)
    tiles_y = -(-HEIGHT // ts)

    means_d = jnp.asarray(xyz)
    cov_d = jnp.asarray(cov)
    op_d = jnp.asarray(opacity)
    feat_d = jnp.asarray(features)
    viewmat = cam.viewmat
    intr = cam.intrinsics
    bg = jnp.zeros(3, jnp.float32)

    def upto_proj(means, cov3d, op, feats):
        proj = project_gaussians(means, cov3d, viewmat, intr, WIDTH, HEIGHT, config)
        cc = -(viewmat[:3, :3].T @ viewmat[:3, 3])
        colors = compute_view_colors(feats, means, cc, 0)
        return sum(jnp.sum(v) for v in proj.values()) + jnp.sum(colors)

    def upto_table(means, cov3d, op, feats):
        proj = project_gaussians(means, cov3d, viewmat, intr, WIDTH, HEIGHT, config)
        table, se, de = _build_tile_table(
            proj["means2d"], proj["radius"], proj["depth"], proj["valid"],
            tiles_x, tiles_y, config)
        return jnp.sum(table)

    def upto_gather(means, cov3d, op, feats):
        proj = project_gaussians(means, cov3d, viewmat, intr, WIDTH, HEIGHT, config)
        cc = -(viewmat[:3, :3].T @ viewmat[:3, 3])
        colors = compute_view_colors(feats, means, cc, 0)
        table, se, de = _build_tile_table(
            proj["means2d"], proj["radius"], proj["depth"], proj["valid"],
            tiles_x, tiles_y, config)
        opv = op * proj["valid"].astype(op.dtype)
        packed = jnp.concatenate(
            [proj["means2d"], proj["conic"], opv[:, None], colors,
             proj["depth"][:, None]], axis=-1)
        g = gather_entries(packed, table, se, de, config.max_tiles_per_splat)
        return jnp.sum(g)

    def full(means, cov3d, op, feats):
        rgb, a, d = rasterize_arrays(
            means, cov3d, op, feats, viewmat, intr, WIDTH, HEIGHT, 0, bg, config)
        return jnp.sum(rgb)

    args = (means_d, cov_d, op_d, feat_d)
    timed("fwd: proj+colors", upto_proj, *args)
    timed("fwd: proj+table", upto_table, *args)
    timed("fwd: proj+table+gather", upto_gather, *args)
    timed(f"fwd: full ({BACKEND})", full, *args)
    timed("fwd+bwd: proj+colors", jax.grad(upto_proj, argnums=(0, 1, 2, 3)), *args, iters=3)
    timed("fwd+bwd: proj+table+gather", jax.grad(upto_gather, argnums=(0, 1, 2, 3)), *args, iters=3)
    timed(f"fwd+bwd: full ({BACKEND})", jax.grad(full, argnums=(0, 1, 2, 3)), *args, iters=3)


if __name__ == "__main__":
    main()
