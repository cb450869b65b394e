"""Stage-by-stage TPU profiling of the rasterizer at bench shapes.

Times: projection / binning+sort variants / gather / composite (xla vs
pallas) / full fwd / full fwd+bwd. Run on the real chip:
    python scripts/profile_raster.py [N_SPLATS]
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
    project_gaussians,
    rasterize_arrays,
)

WIDTH, HEIGHT = 1280, 720
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timed(name, fn, *args, iters=5, **kwargs):
    jitted = jax.jit(fn, **kwargs)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:9.2f} ms")
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

    config = RasterizeConfig(max_tiles_per_splat=4, max_splats_per_tile=512, tile_chunk=32)
    ts = config.tile_size
    tiles_x = -(-WIDTH // ts)
    tiles_y = -(-HEIGHT // ts)
    num_tiles = tiles_x * tiles_y

    means_d = jnp.asarray(xyz)
    cov_d = jnp.asarray(cov)
    op_d = jnp.asarray(opacity)
    feat_d = jnp.asarray(features)
    viewmat = cam.viewmat
    intr = cam.intrinsics
    bg = jnp.zeros(3, jnp.float32)

    proj = timed(
        "projection",
        lambda m, c: project_gaussians(m, c, viewmat, intr, WIDTH, HEIGHT, config),
        means_d, cov_d,
    )

    m2d, radius, depth, valid = proj["means2d"], proj["radius"], proj["depth"], proj["valid"]

    from gaussiansplattingregistration_tpu.ops.rasterize import (
        _build_tile_table, gather_entries,
    )

    def build_table(m2d, radius, depth, valid):
        return _build_tile_table(m2d, radius, depth, valid, tiles_x, tiles_y, config)

    table = timed("build_tile_table (sort+rank-scatter)", build_table,
                  m2d, radius, depth, valid)

    def gath(m2d, conic, op, depth, table):
        packed = jnp.concatenate(
            [m2d, conic, op[:, None], jnp.zeros((m2d.shape[0], 3), jnp.float32),
             depth[:, None]], axis=-1)
        return gather_entries(packed, table, config.max_tiles_per_splat)

    g = timed("gather_entries fwd", gath, m2d, proj["conic"], op_d, depth, table)

    def gath_vjp(m2d, conic, op, depth, table, ct):
        _, vjp = jax.vjp(lambda a, b, c, d: gath(a, b, c, d, table), m2d, conic, op, depth)
        return vjp(ct)

    timed("gather_entries bwd (unique scatter)", gath_vjp, m2d, proj["conic"],
          op_d, depth, table, g)

    def fwd(means, cov3d, op, feats):
        rgb, a, d = rasterize_arrays(
            means, cov3d, op, feats, viewmat, intr, WIDTH, HEIGHT, 0, bg, config
        )
        return rgb

    timed("full fwd (xla)", fwd, means_d, cov_d, op_d, feat_d)

    def loss(means, cov3d, op, feats):
        return jnp.sum(fwd(means, cov3d, op, feats))

    timed("full fwd+bwd (xla)", jax.grad(loss, argnums=(0, 1, 2, 3)),
          means_d, cov_d, op_d, feat_d, iters=3)

    config_p = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=512, tile_chunk=32,
        backend="pallas",
    )

    def fwd_p(means, cov3d, op, feats):
        rgb, a, d = rasterize_arrays(
            means, cov3d, op, feats, viewmat, intr, WIDTH, HEIGHT, 0, bg, config_p
        )
        return rgb

    try:
        timed("full fwd (pallas)", fwd_p, means_d, cov_d, op_d, feat_d)

        def loss_p(means, cov3d, op, feats):
            return jnp.sum(fwd_p(means, cov3d, op, feats))

        timed("full fwd+bwd (pallas)", jax.grad(loss_p, argnums=(0, 1, 2, 3)),
              means_d, cov_d, op_d, feat_d, iters=3)
    except Exception as e:  # noqa: BLE001
        print("pallas path failed:", repr(e)[:500])


if __name__ == "__main__":
    main()
