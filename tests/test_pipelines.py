"""Pipeline tests: multiscale registration, photometric pose opt, evaluation,
plane fitting."""

import dataclasses
import json
import math

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.models.parameters import (
    MultiScaleRegistrationParams,
    PlaneFittingParams,
)
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.ops import math3d, se3
from gaussiansplattingregistration_tpu.ops.plane_fitting import fit_planes, plane_grid_points
from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig
from gaussiansplattingregistration_tpu.pipelines import multiscale, photometric
from gaussiansplattingregistration_tpu.pipelines.evaluation import (
    evaluate_registration,
    load_cameras_json,
)
from tests.conftest import make_random_cloud
from tests.test_icp import make_surface_cloud, pose_error


CFG = RasterizeConfig(max_splats_per_tile=64, tile_chunk=4)


@pytest.mark.parametrize("corr", ["auto", "grid"])
def test_multiscale_voxel(rng, corr):
    pts, colors = make_surface_cloud(rng, n=800)
    xi = np.array([0.08, -0.05, 0.06, 0.1, -0.08, 0.12], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = (pts - T_gt[:3, 3]) @ T_gt[:3, :3]
    source = PointCloud(points=jnp.asarray(src.astype(np.float32)))
    target = PointCloud(points=jnp.asarray(pts))

    params = MultiScaleRegistrationParams(
        voxel_values=[0.3, 0.15, 0.05], iter_values=[30, 20, 15]
    )
    result = multiscale.multiscale_voxel_registration(
        source, target, params, correspondence=corr
    )
    # Accuracy floor ~ finest voxel size: source/target are voxelized in
    # different frames so centroids don't correspond exactly (reference
    # behavior too).
    assert pose_error(result.transformation, T_gt) < 0.08


def test_multiscale_mixture(rng):
    pts, _ = make_surface_cloud(rng, n=600)
    xi = np.array([0.05, -0.04, 0.03, 0.05, -0.04, 0.06], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = (pts - T_gt[:3, 3]) @ T_gt[:3, :3]

    # Fake "HEM levels": random subsets, finest (level 0) first.
    def levels(points):
        full = PointCloud(points=jnp.asarray(points.astype(np.float32)))
        mid = full.select(jnp.asarray(np.arange(0, len(points), 2)))
        coarse = full.select(jnp.asarray(np.arange(0, len(points), 4)))
        return [full, mid, coarse]

    params = MultiScaleRegistrationParams(
        voxel_values=[0.3, 0.15, 0.08], iter_values=[30, 20, 15]
    )
    result = multiscale.multiscale_mixture_registration(
        levels(src), levels(pts), params
    )
    assert pose_error(result.transformation, T_gt) < 0.03


def test_multiscale_validation():
    params = MultiScaleRegistrationParams(voxel_values=[0.1], iter_values=[10, 20])
    pc = PointCloud(points=jnp.zeros((10, 3)))
    with pytest.raises(ValueError):
        multiscale.multiscale_voxel_registration(pc, pc, params)


def make_render_scene(rng, n=120):
    cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.08, 0.2))
    xyz = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    cloud = dataclasses.replace(cloud, xyz=jnp.asarray(xyz),
                                opacity=jnp.full((n, 1), 1.0))
    return dataclasses.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(
            cloud.get_scaling, cloud.get_rotation
        ),
    )


def make_cams(width=48, height=48):
    f = width / (2 * math.tan(math.radians(60) / 2))
    cams = []
    for i, (angle) in enumerate([0.0, 0.5, -0.5]):
        R = np.asarray(
            math3d.axis_angle_to_rotmat(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(angle))
        )
        cams.append(Camera.create(R, [0.0, 0.0, 4.0], f, f, width, height,
                                  image_name=f"cam{i}"))
    return cams


def test_photometric_pose_opt_recovers_small_offset(rng):
    cloud = make_render_scene(rng)
    cams = make_cams()
    targets = photometric.render_targets(cloud, cams, config=CFG)

    xi = np.array([0.03, -0.02, 0.02, 0.03, -0.02, 0.03], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    moved = cloud.transform(jnp.asarray(np.linalg.inv(T_gt), jnp.float32))

    result = photometric.photometric_pose_opt(
        moved, cams, targets, steps=60, learning_rate=8e-3,
        ssim_weight=0.0, config=CFG,
    )
    err = pose_error(result.transformation, T_gt)
    assert err < 0.01, (err, result.final_loss)
    assert result.loss_history[-1] < result.loss_history[0] * 0.2


def test_evaluation_pipeline(tmp_path, rng):
    cloud = make_render_scene(rng, n=60)
    cams = make_cams(width=32, height=32)
    # Ground-truth images rendered from the merged (identity) scene.
    merged = cloud.merge(cloud)
    from gaussiansplattingregistration_tpu.ops.rasterize import rasterize
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for cam in cams:
        rgb, _, _ = rasterize(merged, cam, config=CFG)
        arr = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{cam.image_name}.png")

    log_path = str(tmp_path / "eval.json")
    result = evaluate_registration(
        cloud, cloud, np.eye(4), cams, str(img_dir),
        log_path=log_path, use_lpips=False, config=CFG,
        registration_data={"registration_type": "unit-test"},
    )
    assert result.psnr > 40  # only 8-bit quantization error
    assert result.ssim > 0.98
    assert not result.error_list
    log = json.loads(open(log_path).read())
    assert set(log) == {"registration_data", "mse", "rmse", "ssim", "psnr",
                        "lpips", "lpips_weights", "error_list"}
    assert log["registration_data"]["registration_type"] == "unit-test"


def test_evaluation_sharded_matches_loop(tmp_path, rng):
    """Camera-sharded evaluation (8-device CPU mesh) == per-camera loop, and
    mismatched-resolution / missing-image cameras land in error_list."""
    from gaussiansplattingregistration_tpu.pipelines.evaluation import (
        evaluate_registration_sharded,
    )

    cloud = make_render_scene(rng, n=60)
    cams = make_cams(width=32, height=32)
    merged = cloud.merge(cloud)
    from gaussiansplattingregistration_tpu.ops.rasterize import rasterize
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for cam in cams:
        rgb, _, _ = rasterize(merged, cam, config=CFG)
        arr = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{cam.image_name}.png")

    loop = evaluate_registration(
        cloud, cloud, np.eye(4), cams, str(img_dir),
        use_lpips=False, config=CFG,
    )
    log_path = str(tmp_path / "eval_sharded.json")
    sharded = evaluate_registration_sharded(
        cloud, cloud, np.eye(4), cams, str(img_dir),
        config=CFG, log_path=log_path,
    )
    assert sharded.error_list == []
    for k in ("mse", "ssim", "psnr"):
        assert abs(getattr(sharded, k) - getattr(loop, k)) < 1e-3, (
            k, getattr(sharded, k), getattr(loop, k))
    log = json.loads(open(log_path).read())
    assert abs(log["psnr"] - sharded.psnr) < 1e-9

    # A camera at a different resolution and one with no image are skipped
    # with errors, without breaking the shared-resolution batch.
    odd = Camera.create(np.eye(3), [0.0, 0.0, 4.0], 30.0, 30.0, 48, 48,
                        image_name="odd")
    rgb, _, _ = rasterize(merged, odd, config=CFG)
    Image.fromarray(
        (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    ).save(img_dir / "odd.png")
    missing = Camera.create(np.eye(3), [0.0, 0.0, 4.0], 30.0, 30.0, 32, 32,
                            image_name="missing")
    mixed = evaluate_registration_sharded(
        cloud, cloud, np.eye(4), cams + [odd, missing], str(img_dir),
        config=CFG,
    )
    assert len(mixed.error_list) == 2
    assert abs(mixed.psnr - sharded.psnr) < 1e-3


def test_evaluation_missing_image(tmp_path, rng):
    cloud = make_render_scene(rng, n=20)
    cams = make_cams(width=32, height=32)
    result = evaluate_registration(
        cloud, cloud, np.eye(4), cams, str(tmp_path), use_lpips=False, config=CFG
    )
    assert len(result.error_list) == len(cams)
    assert np.isnan(result.mse)


def test_plane_fitting(rng):
    # Two perpendicular planes + noise.
    n = 400
    a = np.column_stack([rng.uniform(-1, 1, (n, 2)), np.zeros(n)])  # z=0
    b = np.column_stack([rng.uniform(-1, 1, n), np.full(n, 1.0), rng.uniform(-1, 1, n)])  # y=1
    noise = rng.uniform(-1, 1, (60, 3))
    pts = np.vstack([a, b, noise]).astype(np.float32)
    pc = PointCloud(points=jnp.asarray(pts))
    params = PlaneFittingParams(
        plane_count=2, iterations=200, distance_threshold=0.02,
        normal_threshold=0.8, min_distance=0.2,
    )
    planes, inliers = fit_planes(pc, params, seed=0)
    assert len(planes) == 2
    normals = [p[:3] / np.linalg.norm(p[:3]) for p in planes]
    # One plane should be ~z-normal, the other ~y-normal.
    aligned_z = max(abs(nv[2]) for nv in normals)
    aligned_y = max(abs(nv[1]) for nv in normals)
    assert aligned_z > 0.99 and aligned_y > 0.99
    assert all(len(i) > n * 0.7 for i in inliers)
    # Mesh helper produces a usable grid.
    verts, tris = plane_grid_points(planes[0], pts[inliers[0]], resolution=5)
    assert verts.shape == (25, 3)
    assert tris.shape[0] == 2 * 2 * (5 - 1) ** 2
