"""On-chip frame profile + optional K sweep for the headline bench config.

    python scripts/profile_frame.py [--ksweep]

Prints the K-sweep lines first (truncation PSNR vs a K=2048 oracle + frame
time per K), then the devtime op timeline for the current bench config.
"""

import math
import sys
import time
import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.devtime import device_time  # noqa: E402
from gaussiansplattingregistration_tpu.models.camera import Camera  # noqa: E402
from gaussiansplattingregistration_tpu.ops import math3d  # noqa: E402
from gaussiansplattingregistration_tpu.ops.rasterize import (  # noqa: E402
    RasterizeConfig, rasterize_arrays,
)

WIDTH, HEIGHT, N = 1280, 720, 1_000_000


def make_scene():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.006, (N, 3)).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    cov = math3d.covariance_from_scaling_rotation(
        jnp.asarray(scales), jnp.asarray(quats))
    op = jnp.asarray(
        (1 / (1 + np.exp(-rng.normal(0, 1, N)))).astype(np.float32))
    feat = jnp.asarray((rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32))
    f = WIDTH / (2 * math.tan(math.radians(70) / 2))
    cam = Camera.create(np.eye(3), [0, 0, 3.0], f, f, WIDTH, HEIGHT)
    return (jnp.asarray(xyz), jnp.asarray(cov), op, feat,
            cam.viewmat, cam.intrinsics, jnp.zeros(3, jnp.float32))


def main():
    means, cov, op, feat, vm, K, bg = make_scene()

    def frame_fn(cfg):
        def loss(m, c, o, ft):
            rgb, _, _ = rasterize_arrays(m, c, o, ft, vm, K, WIDTH, HEIGHT,
                                         0, bg, cfg)
            return jnp.sum(rgb)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    if "--ksweep" in sys.argv:
        for ksz in (512, 448, 384):
            cfg = RasterizeConfig(max_tiles_per_splat=4,
                                  max_splats_per_tile=ksz,
                                  tile_chunk=32, backend="pallas")
            oracle = dc.replace(cfg, backend="xla", max_splats_per_tile=2048,
                                tile_chunk=4)
            rgb_t, _, _ = rasterize_arrays(means, cov, op, feat, vm, K,
                                           WIDTH, HEIGHT, 0, bg, cfg)
            rgb_e, _, _ = rasterize_arrays(means, cov, op, feat, vm, K,
                                           WIDTH, HEIGHT, 0, bg, oracle)
            mse = float(jnp.mean((rgb_t - rgb_e) ** 2))
            psnr = 10 * math.log10(1 / max(mse, 1e-12))
            fb = frame_fn(cfg)
            g = fb(means, cov, op, feat)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(6):
                g = fb(means, cov, op, feat)
            jax.block_until_ready(g)
            dt = (time.perf_counter() - t0) / 6 * 1e3
            print(f"K={ksz}: trunc_psnr={psnr:.2f} dB  frame={dt:.1f} ms  "
                  f"px/s={WIDTH * HEIGHT / dt * 1000 / 1e6:.2f}M", flush=True)

    # The bench headline config (bench.py): K=384, bf16 ct transport (r5).
    cfg = RasterizeConfig(max_tiles_per_splat=4, max_splats_per_tile=384,
                          tile_chunk=32, backend="pallas",
                          bwd_sort_bf16="--f32" not in sys.argv)
    dt, top = device_time(frame_fn(cfg), (means, cov, op, feat), iters=4,
                          top_n=16, verbose=False)
    print(f"TOTAL {dt:.2f} ms/exec")
    for name, ms in top:
        print(f"{ms / 4:8.2f}  {name[:130]}")


if __name__ == "__main__":
    main()
