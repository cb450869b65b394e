"""Headline benchmark: rasterize forward+backward throughput at 1M splats.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} as the driver
contract requires. Runs on whatever JAX platform the environment provides
(the real TPU chip under the driver; CPU if forced).

Metric (BASELINE.json): pixels/s/chip for rasterize fwd+bwd at 1M splats.
`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
denominator is the north-star proxy — an estimated H100 gsplat fwd+bwd
throughput of 2.5e8 px/s at 1M splats (>=2.0 would mean "2x H100 per chip";
the pod-level 2x target then comes from scaling).
"""

import json
import math
import os
import sys
import time

import numpy as np

H100_FWD_BWD_PIXELS_PER_S = 2.5e8  # estimated gsplat fwd+bwd at 1M splats

WIDTH, HEIGHT = 1280, 720
N_SPLATS = 1_000_000
WARMUP = 2
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from gaussiansplattingregistration_tpu.models.camera import Camera
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        RasterizeConfig,
        rasterize_arrays,
    )

    rng = np.random.default_rng(0)
    n = N_SPLATS
    # Scene sized so splats are a few pixels across at 720p (realistic 3DGS
    # splat density), bounded tile coverage.
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.006, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)

    from gaussiansplattingregistration_tpu.ops import math3d

    cov = np.asarray(
        math3d.covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    opacity = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 1.0, size=n)))).astype(np.float32)
    features = (rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32)

    f = WIDTH / (2 * math.tan(math.radians(70) / 2))
    cam = Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, WIDTH, HEIGHT)

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    config = RasterizeConfig(
        max_tiles_per_splat=4,       # tiny splats: 2x2 tile window is exact
        max_splats_per_tile=512,
        tile_chunk=32,
        backend=backend,
    )

    means_d = jnp.asarray(xyz)
    cov_d = jnp.asarray(cov)
    op_d = jnp.asarray(opacity)
    feat_d = jnp.asarray(features)
    viewmat = cam.viewmat
    intr = cam.intrinsics
    bg = jnp.zeros(3, jnp.float32)

    def loss_fn(means, cov3d, op, feats):
        rgb, _, _ = rasterize_arrays(
            means, cov3d, op, feats, viewmat, intr,
            WIDTH, HEIGHT, 0, bg, config,
        )
        return jnp.sum(rgb)

    fwd_bwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))

    # Warmup / compile.
    for _ in range(WARMUP):
        grads = fwd_bwd(means_d, cov_d, op_d, feat_d)
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        grads = fwd_bwd(means_d, cov_d, op_d, feat_d)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / ITERS

    pixels_per_s = WIDTH * HEIGHT / dt
    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_pixels_per_s_per_chip_1M_splats",
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s/chip",
                "vs_baseline": round(pixels_per_s / H100_FWD_BWD_PIXELS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
