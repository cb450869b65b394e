"""Camera-sharded (data-parallel) photometric evaluation.

SURVEY.md §2.9: "shard cameras/images across chips for evaluation". Each
device renders its slice of the camera batch and computes per-image MSE/PSNR;
means reduce with one psum. SSIM's depthwise convs run per-device too.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import metrics as metrics_ops
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    rasterize_arrays,
)


def evaluate_images_sharded(
    cloud,
    cameras: Sequence[Camera],
    gt_images: Sequence[np.ndarray],
    mesh: Mesh,
    background=(0.0, 0.0, 0.0),
    config: RasterizeConfig = RasterizeConfig(),
):
    """Render + score a camera batch, sharded over the mesh's `data` axis.

    All cameras must share one resolution. Returns dict of mean metrics
    (mse, rmse, psnr, ssim). The camera count is padded to a multiple of the
    data-axis size; padded entries are masked out of the means.
    """
    n_data = mesh.shape["data"]
    width, height = cameras[0].width, cameras[0].height
    n = len(cameras)
    pad = (-n) % n_data

    viewmats = jnp.stack(
        [c.viewmat for c in cameras] + [cameras[0].viewmat] * pad
    )
    intrinsics = jnp.stack(
        [c.intrinsics for c in cameras] + [cameras[0].intrinsics] * pad
    )
    targets = jnp.stack(
        [jnp.asarray(t, jnp.float32) for t in gt_images]
        + [jnp.zeros((height, width, 3), jnp.float32)] * pad
    )
    mask = jnp.asarray([1.0] * n + [0.0] * pad)

    shard = NamedSharding(mesh, P("data"))
    viewmats = jax.device_put(viewmats, shard)
    intrinsics = jax.device_put(intrinsics, shard)
    targets = jax.device_put(targets, shard)
    mask = jax.device_put(mask, shard)

    bg = jnp.asarray(background, jnp.float32)

    def body(viewmats_l, intrinsics_l, targets_l, mask_l,
             means, cov, op, feats):
        def per_cam(args):
            vm, K, tgt = args
            rgb, _, _ = rasterize_arrays(
                means, cov, op, feats, vm, K, width, height,
                cloud.sh_degree, bg, config,
            )
            rgb = jnp.clip(rgb, 0.0, 1.0)
            m = jnp.mean((rgb - tgt) ** 2)
            s = metrics_ops.ssim(rgb, tgt)
            return m, s

        mses, ssims = jax.lax.map(per_cam, (viewmats_l, intrinsics_l, targets_l))
        # PSNR/RMSE are per-image, THEN averaged (the reference accumulates
        # per-image metrics, qt_evaluator.py:89-103) — not derived from the
        # mean MSE.
        rmses = jnp.sqrt(mses)
        psnrs = -20.0 * jnp.log10(jnp.maximum(rmses, 1e-9))
        count = jax.lax.psum(jnp.sum(mask_l), "data")
        sums = [
            jax.lax.psum(jnp.sum(v * mask_l), "data") / count
            for v in (mses, rmses, psnrs, ssims)
        ]
        return tuple(sums)

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data"), P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )
    mse, rmse, psnr, ssim = fn(
        viewmats, intrinsics, targets, mask,
        cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
        cloud.get_features,
    )
    return {
        "mse": float(mse),
        "rmse": float(rmse),
        "psnr": float(psnr),
        "ssim": float(ssim),
    }
