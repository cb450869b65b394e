"""Workspace (repository-state analogue) and sharded-eval tests."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.workspace import Workspace
from gaussiansplattingregistration_tpu.models.parameters import GaussianMixtureParams
from tests.conftest import make_random_cloud
from tests.test_hem import make_dense_cloud


def test_workspace_transform_notification(rng):
    ws = Workspace()
    seen = []
    ws.on_transformation_changed(lambda T: seen.append(T.copy()))
    T = np.eye(4)
    ws.transformation = T          # identity -> identity: no change
    assert seen == []
    T2 = np.eye(4)
    T2[0, 3] = 1.0
    ws.transformation = T2
    assert len(seen) == 1
    ws.transformation = T2         # same value: no re-notify
    assert len(seen) == 1


def test_workspace_load_pair_and_levels(rng):
    first = make_dense_cloud(rng, n=150)
    second = make_dense_cloud(rng, n=150)
    ws = Workspace()
    ws.load_pair(first, second)
    assert len(ws.gaussian_list_first) == 1
    assert ws.point_list_first[0].num_points == 150

    from gaussiansplattingregistration_tpu.ops import hem

    params = GaussianMixtureParams(cluster_level=2)
    lf = hem.create_mixture(first, params, seed=0)
    ls = hem.create_mixture(second, params, seed=1)
    ws.append_mixture_levels(lf, ls, first.sh_degree)
    assert len(ws.gaussian_list_first) == 3
    ws.current_index = 2
    a, b = ws.current_pair
    assert a.num_points == lf[1].xyz.shape[0]


def test_workspace_degree_mismatch(rng):
    first = make_random_cloud(rng, n=10, sh_degree=1)
    second = make_random_cloud(rng, n=10, sh_degree=2)
    with pytest.raises(ValueError):
        Workspace().load_pair(first, second)


def test_sharded_eval_matches_metrics(rng):
    from gaussiansplattingregistration_tpu.models.camera import Camera
    from gaussiansplattingregistration_tpu.ops import math3d
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        RasterizeConfig, rasterize,
    )
    from gaussiansplattingregistration_tpu.parallel.mesh import make_mesh
    from gaussiansplattingregistration_tpu.parallel.sharded_eval import (
        evaluate_images_sharded,
    )

    n = 80
    cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.08, 0.2))
    cloud = dataclasses.replace(
        cloud, xyz=jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
    )
    cloud = dataclasses.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(
            cloud.get_scaling, cloud.get_rotation
        ),
    )
    f = 32 / (2 * math.tan(math.radians(60) / 2))
    cams = [
        Camera.create(
            np.asarray(math3d.axis_angle_to_rotmat(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(a))),
            [0, 0, 4.0], f, f, 32, 32, image_name=f"c{i}",
        )
        for i, a in enumerate([0.0, 0.4, -0.4])
    ]
    cfg = RasterizeConfig(max_splats_per_tile=64, tile_chunk=4)
    gts = [np.asarray(jnp.clip(rasterize(cloud, c, config=cfg)[0], 0, 1)) for c in cams]
    # Perturb GT slightly so metrics are non-trivial.
    gts = [np.clip(g + 0.01, 0, 1) for g in gts]

    mesh = make_mesh(data=4, splat=1, devices=jax.devices()[:4])
    out = evaluate_images_sharded(cloud, cams, gts, mesh, config=cfg)

    # Single-device oracle.
    from gaussiansplattingregistration_tpu.ops import metrics as m

    mses, ssims = [], []
    for cam, gt in zip(cams, gts):
        rgb = jnp.clip(rasterize(cloud, cam, config=cfg)[0], 0, 1)
        mses.append(float(m.mse(rgb, jnp.asarray(gt))))
        ssims.append(float(m.ssim(rgb, jnp.asarray(gt))))
    np.testing.assert_allclose(out["mse"], np.mean(mses), rtol=1e-4)
    np.testing.assert_allclose(out["ssim"], np.mean(ssims), rtol=1e-4)
