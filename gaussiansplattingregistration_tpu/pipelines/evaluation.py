"""Registration evaluation: photometric metrics against ground-truth images.

Counterpart of `RegistrationEvaluator`
(`/root/reference/src/gui/workers/graphics/qt_evaluator.py:47-156`): merge the
two clouds under the current transform, render from each camera, compare to
`<images_path>/<img_name>.png`, aggregate MSE/RMSE/SSIM/PSNR (+LPIPS when the
torch `lpips` package is available), and write a JSON log with the same
schema as `EvaluationObject` (`qt_evaluator.py:133-156`).

Per-camera work is embarrassingly parallel — `parallel/sharded_eval.py`
shards the camera axis over the device mesh.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.ops import metrics as metrics_ops
from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig, rasterize


@dataclasses.dataclass
class EvaluationResult:
    """Aggregated metrics + per-camera details + error list."""

    mse: float
    rmse: float
    ssim: float
    psnr: float
    lpips: Optional[float]
    per_camera: List[dict]
    error_list: List[str]
    # which LPIPS weights were live ("torch", "npz:<name>", or "random" —
    # the documented random-feature fallback; see ops/lpips.py)
    lpips_weights: Optional[str] = None

    def as_log_dict(self, registration_data: Optional[dict] = None) -> dict:
        """JSON log matching `EvaluationObject.__dict__` (`qt_evaluator.py:133-156`)."""
        return {
            "registration_data": registration_data or {},
            "mse": self.mse,
            "rmse": self.rmse,
            "ssim": self.ssim,
            "psnr": self.psnr,
            "lpips": self.lpips,
            "lpips_weights": self.lpips_weights,
            "error_list": self.error_list,
        }


def load_image(path: str) -> np.ndarray:
    """PNG -> float32 [H, W, 3] in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def load_cameras_json(path: str) -> List[Camera]:
    """Parse a 3DGS-format cameras.json (counterpart of
    `load_cameras_clicked`, `/root/reference/src/gui/tabs/evaluation_tab.py:92-122`)."""
    with open(path) as f:
        entries = json.load(f)
    return [Camera.from_json_entry(e) for e in entries]


def evaluate_registration(
    cloud_first: GaussianCloud,
    cloud_second: GaussianCloud,
    transformation,
    cameras: Sequence[Camera],
    images_path: str,
    background=(0.0, 0.0, 0.0),
    log_path: Optional[str] = None,
    registration_data: Optional[dict] = None,
    use_lpips: bool = True,
    config: RasterizeConfig = RasterizeConfig(),
    progress_callback: Optional[Callable[[int], None]] = None,
) -> EvaluationResult:
    """Render the merged cloud from every camera and score against GT images."""
    merged = cloud_first.merge(cloud_second, jnp.asarray(transformation, jnp.float32))
    lpips_callable = metrics_ops.lpips_fn() if use_lpips else None
    if getattr(lpips_callable, "source", None) == "random":
        print(
            "WARNING: LPIPS is using the untrained random-feature fallback "
            "(no trained AlexNet weights found — set GSR_LPIPS_WEIGHTS or "
            "install the `lpips` package). Values are NOT comparable to "
            "published trained-LPIPS numbers.",
            file=sys.stderr,
        )

    per_camera: List[dict] = []
    errors: List[str] = []
    for i, camera in enumerate(cameras):
        if progress_callback is not None:
            progress_callback(int((i + 1) / len(cameras) * 100))
        image_path = os.path.join(images_path, camera.image_name + ".png")
        try:
            gt = load_image(image_path)
        except (OSError, IOError) as e:
            errors.append(str(e))
            continue
        if gt.shape[:2] != (camera.height, camera.width):
            errors.append(
                f"{camera.image_name}: image {gt.shape[:2]} != camera "
                f"({camera.height}, {camera.width})"
            )
            continue
        rgb, _, _ = rasterize(merged, camera, background=background, config=config)
        rgb = jnp.clip(rgb, 0.0, 1.0)
        m = metrics_ops.all_metrics(rgb, jnp.asarray(gt), lpips_callable)
        m["image"] = camera.image_name
        per_camera.append(m)

    if per_camera:
        agg = {
            k: float(np.mean([m[k] for m in per_camera]))
            for k in ("mse", "rmse", "ssim", "psnr")
        }
        lp = (
            float(np.mean([m["lpips"] for m in per_camera]))
            if lpips_callable is not None
            else None
        )
    else:
        agg = {"mse": float("nan"), "rmse": float("nan"), "ssim": float("nan"), "psnr": float("nan")}
        lp = None

    result = EvaluationResult(
        mse=agg["mse"], rmse=agg["rmse"], ssim=agg["ssim"], psnr=agg["psnr"],
        lpips=lp, per_camera=per_camera, error_list=errors,
        lpips_weights=getattr(lpips_callable, "source", None),
    )
    if log_path:
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        with open(log_path, "w") as f:
            json.dump(result.as_log_dict(registration_data), f, indent=2)
    return result


def evaluate_registration_sharded(
    cloud_first: GaussianCloud,
    cloud_second: GaussianCloud,
    transformation,
    cameras: Sequence[Camera],
    images_path: str,
    background=(0.0, 0.0, 0.0),
    log_path: Optional[str] = None,
    registration_data: Optional[dict] = None,
    config: RasterizeConfig = RasterizeConfig(),
    mesh=None,
) -> EvaluationResult:
    """Camera-sharded (data-parallel) evaluation over the device mesh.

    The TPU-native form of the reference's per-camera loop
    (`qt_evaluator.py:59-97`): every device renders + scores its slice of
    the camera batch (parallel/sharded_eval.py), aggregate means reduce with
    one psum. Cameras whose GT image is missing or whose resolution differs
    from the (single, shared) batch resolution land in `error_list` exactly
    like the loop path. LPIPS and the per-camera breakdown are not computed
    here — use `evaluate_registration` when those are needed.
    """
    from gaussiansplattingregistration_tpu.parallel import mesh as mesh_mod
    from gaussiansplattingregistration_tpu.parallel.sharded_eval import (
        evaluate_images_sharded,
    )

    merged = cloud_first.merge(
        cloud_second, jnp.asarray(transformation, jnp.float32)
    )
    if mesh is None:
        import jax

        mesh = mesh_mod.make_mesh(data=len(jax.devices()), splat=1)

    usable: List[Camera] = []
    gts: List[np.ndarray] = []
    errors: List[str] = []
    width = height = None
    for camera in cameras:
        image_path = os.path.join(images_path, camera.image_name + ".png")
        try:
            gt = load_image(image_path)
        except (OSError, IOError) as e:
            errors.append(str(e))
            continue
        if gt.shape[:2] != (camera.height, camera.width):
            errors.append(
                f"{camera.image_name}: image {gt.shape[:2]} != camera "
                f"({camera.height}, {camera.width})"
            )
            continue
        if width is None:
            width, height = camera.width, camera.height
        elif (camera.width, camera.height) != (width, height):
            errors.append(
                f"{camera.image_name}: resolution ({camera.height}, "
                f"{camera.width}) != batch ({height}, {width}) — sharded "
                "evaluation needs one shared resolution"
            )
            continue
        usable.append(camera)
        gts.append(gt)

    if usable:
        agg = evaluate_images_sharded(
            merged, usable, gts, mesh, background=background, config=config
        )
    else:
        agg = {k: float("nan") for k in ("mse", "rmse", "ssim", "psnr")}

    result = EvaluationResult(
        mse=agg["mse"], rmse=agg["rmse"], ssim=agg["ssim"], psnr=agg["psnr"],
        lpips=None, per_camera=[], error_list=errors, lpips_weights=None,
    )
    if log_path:
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        with open(log_path, "w") as f:
            json.dump(result.as_log_dict(registration_data), f, indent=2)
    return result
