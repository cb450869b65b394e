"""Stage-isolated TPU timings for the rasterizer at bench shapes.

Each stage is timed as a standalone jit with device-resident inputs, so the
numbers are additive approximations of the full pipeline.
    PYTHONPATH="$PYTHONPATH:/root/repo" python scripts/profile_stages.py
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d, raster_pallas
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    _build_tile_table,
    gather_entries,
    project_gaussians,
    rasterize_arrays,
)

WIDTH, HEIGHT = 1280, 720
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timed(name, fn, *args, iters=5, grad=False):
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
        backend="pallas",
    )
    ts = config.tile_size
    tiles_x = -(-WIDTH // ts)
    tiles_y = -(-HEIGHT // ts)
    num_tiles = tiles_x * tiles_y
    viewmat, intr = cam.viewmat, cam.intrinsics
    means_d, cov_d = jnp.asarray(xyz), jnp.asarray(cov)
    op_d, feat_d = jnp.asarray(opacity), jnp.asarray(features)
    bg = jnp.zeros(3, jnp.float32)

    # -- stage inputs (device-resident, built once) --------------------------
    proj = jax.jit(
        lambda m, c: project_gaussians(m, c, viewmat, intr, WIDTH, HEIGHT, config)
    )(means_d, cov_d)
    jax.block_until_ready(proj)

    def build_table(p):
        return _build_tile_table(
            p["means2d"], p["radius"], p["depth"], p["valid"],
            tiles_x, tiles_y, config,
        )

    table, sorted_entry, dest, *_ = jax.jit(build_table)(proj)
    jax.block_until_ready(table)

    packed = jnp.concatenate(
        [proj["means2d"], proj["conic"], op_d[:, None],
         jnp.zeros((N, 3), jnp.float32), proj["depth"][:, None]], axis=-1)
    g = jax.jit(
        lambda pk: gather_entries(pk, table, sorted_entry, dest,
                                  config.max_tiles_per_splat)
    )(packed)
    jax.block_until_ready(g)
    valid_f = (table >= 0).astype(jnp.float32)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_origin = jnp.stack(
        [(tile_ids % tiles_x) * ts, (tile_ids // tiles_x) * ts], axis=-1
    ).astype(jnp.float32)

    # -- timings -------------------------------------------------------------
    timed("projection fwd", lambda m, c: project_gaussians(
        m, c, viewmat, intr, WIDTH, HEIGHT, config), means_d, cov_d)
    timed("table build (keys+sort+rank+scatter)", build_table, proj)
    timed("gather_entries fwd", lambda pk: gather_entries(
        pk, table, sorted_entry, dest, config.max_tiles_per_splat), packed)

    def gather_loss(pk):
        return jnp.sum(gather_entries(
            pk, table, sorted_entry, dest, config.max_tiles_per_splat))
    timed("gather_entries fwd+bwd", jax.grad(gather_loss), packed)

    timed("composite pallas fwd", lambda gg, vv: raster_pallas.composite_tiles_pallas(
        gg, vv, tile_origin, ts, config), g, valid_f)

    def comp_loss(gg):
        rgb, alpha, depth = raster_pallas.composite_tiles_pallas(
            gg, valid_f, tile_origin, ts, config)
        return jnp.sum(rgb) + jnp.sum(alpha) + jnp.sum(depth)
    timed("composite pallas fwd+bwd", jax.grad(comp_loss), g)

    def full_fwd(m, c, o, ft):
        rgb, _, _ = rasterize_arrays(
            m, c, o, ft, viewmat, intr, WIDTH, HEIGHT, 0, bg, config)
        return jnp.sum(rgb)
    timed("FULL fwd", full_fwd, means_d, cov_d, op_d, feat_d)
    timed("FULL fwd+bwd", jax.grad(full_fwd, argnums=(0, 1, 2, 3)),
          means_d, cov_d, op_d, feat_d)


if __name__ == "__main__":
    main()
