"""ICP tests: each variant must recover a known SE(3) perturbation.

Oracle (SURVEY.md §4): synthetic clouds with known ground-truth transforms;
fitness/inlier-RMSE semantics match Open3D's definitions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.parameters import (
    KernelLossFunctionType,
    LocalRegistrationParams,
    LocalRegistrationType,
)
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.ops import icp as icp_ops
from gaussiansplattingregistration_tpu.ops import se3


def make_surface_cloud(rng, n=400):
    """Wavy surface: well-constrained for all ICP variants."""
    xy = rng.uniform(-1, 1, size=(n, 2))
    z = 0.3 * np.sin(2.5 * xy[:, 0]) * np.cos(1.5 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    colors = np.abs(np.sin(np.stack([
        3 * xy[:, 0], 2 * xy[:, 1], xy[:, 0] + 2 * xy[:, 1]
    ], axis=1))).astype(np.float32)
    return pts, colors


def gt_transform(scale=0.08):
    xi = np.array([0.05, -0.03, 0.04, 0.06, -0.05, 0.08]) * (scale / 0.08)
    return np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))


def pose_error(T_est, T_gt):
    delta = np.asarray(se3.se3_log(jnp.asarray(T_est @ np.linalg.inv(T_gt), jnp.float32)))
    return np.linalg.norm(delta)


@pytest.mark.parametrize(
    "reg_type",
    [
        LocalRegistrationType.ICP_POINT_TO_POINT,
        LocalRegistrationType.ICP_POINT_TO_PLANE,
        LocalRegistrationType.ICP_COLOR,
        LocalRegistrationType.ICP_GENERAL,
    ],
)
def test_icp_recovers_transform(rng, reg_type):
    pts, colors = make_surface_cloud(rng)
    T_gt = gt_transform()
    # source = target displaced by inv(T_gt); ICP should find T_gt.
    src_pts = (pts - np.asarray(T_gt)[:3, 3]) @ np.asarray(T_gt)[:3, :3]
    source = PointCloud(points=jnp.asarray(src_pts), colors=jnp.asarray(colors))
    target = PointCloud(points=jnp.asarray(pts), colors=jnp.asarray(colors))

    params = LocalRegistrationParams(
        registration_type=reg_type, max_correspondence=0.5, max_iteration=50
    )
    result = icp_ops.icp(source, target, params)
    err = pose_error(result.transformation, T_gt)
    assert err < 0.01, f"{reg_type}: pose error {err}"
    assert result.fitness > 0.95
    assert result.inlier_rmse < 0.02


def test_icp_identity_converges_immediately(rng):
    pts, colors = make_surface_cloud(rng, n=200)
    cloud = PointCloud(points=jnp.asarray(pts))
    params = LocalRegistrationParams(max_correspondence=0.5, max_iteration=30)
    result = icp_ops.icp(cloud, cloud, params)
    np.testing.assert_allclose(result.transformation, np.eye(4), atol=1e-4)
    assert result.fitness == 1.0
    assert result.inlier_rmse < 1e-3  # f32 SVD noise floor
    assert result.converged
    assert result.num_iterations <= 10  # f32 rmse jitter delays the 1e-6 criteria


def test_icp_with_robust_kernel_ignores_outliers(rng):
    pts, colors = make_surface_cloud(rng, n=300)
    T_gt = gt_transform(scale=0.05)
    src_pts = (pts - np.asarray(T_gt)[:3, 3]) @ np.asarray(T_gt)[:3, :3]
    # Corrupt 10% of the source with gross outliers.
    n_out = 30
    src_pts = src_pts.copy()
    src_pts[:n_out] += rng.normal(scale=0.5, size=(n_out, 3)).astype(np.float32)

    source = PointCloud(points=jnp.asarray(src_pts))
    target = PointCloud(points=jnp.asarray(pts))
    params = LocalRegistrationParams(
        registration_type=LocalRegistrationType.ICP_POINT_TO_PLANE,
        max_correspondence=1.0,
        max_iteration=50,
        rejection_type=KernelLossFunctionType.TUKEY,
        k_value=0.05,
    )
    result = icp_ops.icp(source, target, params)
    err = pose_error(result.transformation, T_gt)
    assert err < 0.02, err


def test_icp_init_transform_is_used(rng):
    """With a large offset and small correspondence radius, ICP only works if
    seeded near the solution."""
    pts, _ = make_surface_cloud(rng, n=300)
    offset = np.eye(4, dtype=np.float32)
    offset[:3, 3] = [3.0, 0.0, 0.0]
    src = pts @ offset[:3, :3] - offset[:3, 3] @ np.linalg.inv(offset[:3, :3])
    src = (pts - offset[:3, 3]) @ offset[:3, :3]
    source = PointCloud(points=jnp.asarray(src.astype(np.float32)))
    target = PointCloud(points=jnp.asarray(pts))
    params = LocalRegistrationParams(max_correspondence=0.2, max_iteration=30)

    blind = icp_ops.icp(source, target, params)
    seeded = icp_ops.icp(source, target, params, init_transform=jnp.asarray(offset))
    assert pose_error(seeded.transformation, offset) < 1e-3
    assert blind.fitness < seeded.fitness


def test_robust_weights():
    r = jnp.asarray([0.0, 0.5, 2.0])
    w = icp_ops.robust_weight(KernelLossFunctionType.TUKEY, r, 1.0)
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.5625, 0.0], atol=1e-6)
    w = icp_ops.robust_weight(KernelLossFunctionType.HUBER, r, 1.0)
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 0.5], atol=1e-6)
    w = icp_ops.robust_weight(KernelLossFunctionType.CAUCHY, r, 1.0)
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.8, 0.2], atol=1e-6)
    w = icp_ops.robust_weight(KernelLossFunctionType.NONE, r, 0.0)
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_voxel_downsample(rng):
    from gaussiansplattingregistration_tpu.ops.voxel import voxel_downsample

    pts = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    pc = PointCloud(points=jnp.asarray(pts), colors=jnp.asarray(pts))
    down = voxel_downsample(pc, 0.25)
    assert down.num_points < 200
    assert down.num_points >= 4 ** 3  # most of the 4x4x4 grid is occupied
    # Every output point must be the mean of its voxel: check centroid bounds.
    p = np.asarray(down.points)
    assert p.min() >= 0 and p.max() <= 1.0


def test_icp_grid_matches_brute(rng):
    """The grid-pruned correspondence path (27-cell candidate table) must
    reproduce the brute-force sweep EXACTLY: identical pose, fitness, RMSE
    (gated NN is exact under the gate — ops/knn.py grid_nn_plan)."""
    n = 3000
    tgt_pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    xi = jnp.asarray([0.01, -0.02, 0.01, 0.03, -0.02, 0.01])
    T_off = se3.se3_exp(xi)
    src = PointCloud(points=jnp.asarray(tgt_pts) @ T_off[:3, :3].T + T_off[:3, 3])
    tgt = PointCloud(points=jnp.asarray(tgt_pts))
    params = LocalRegistrationParams(max_correspondence=0.2, max_iteration=15,
                                     relative_fitness=0.0, relative_rmse=0.0)
    r_b = icp_ops.icp(src, tgt, params, correspondence="brute")
    r_g = icp_ops.icp(src, tgt, params, correspondence="grid")
    np.testing.assert_allclose(r_g.transformation, r_b.transformation,
                               atol=1e-6)
    assert r_g.fitness == r_b.fitness
    np.testing.assert_allclose(r_g.inlier_rmse, r_b.inlier_rmse, rtol=1e-6)


def test_grid_nn_boundary_cases(rng):
    """Queries outside the grid, empty neighborhoods, duplicate points."""
    from gaussiansplattingregistration_tpu.ops import knn

    tgt = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    tgt[10] = tgt[11]                      # duplicates
    gate = 0.08
    plan = knn.grid_nn_plan(tgt, gate)
    assert plan is not None
    origin, inv_cell, (nx, ny, nz), max_occ = plan
    w = 27 * max_occ
    table = knn.build_grid_table(
        jnp.asarray(tgt), jnp.ones(len(tgt), bool),
        jnp.asarray(origin), jnp.asarray(inv_cell), nx, ny, nz, max_occ,
    )
    q = np.concatenate([
        tgt[:100] + rng.normal(0, 0.01, (100, 3)).astype(np.float32),
        np.array([[5.0, 5.0, 5.0], [-3.0, 0.5, 0.5]], np.float32),  # far out
    ])
    d2g, idxg = knn.grid_nearest_neighbor(
        jnp.asarray(q), jnp.asarray(table), jnp.asarray(origin),
        jnp.asarray(inv_cell), nx, ny, nz, w,
    )
    d2b, idxb = knn.nearest_neighbor(jnp.asarray(q), jnp.asarray(tgt))
    d2g, d2b = np.asarray(d2g), np.asarray(d2b)
    gated = d2b <= gate * gate
    np.testing.assert_allclose(d2g[gated], d2b[gated], rtol=1e-5, atol=1e-12)
    assert np.all(d2g[~gated] > gate * gate)   # far queries stay out of gate


def test_grid_topk_matches_brute_within_radius(rng):
    """grid_topk == brute kNN on the in-radius neighbor set (the only set
    HEM's eligibility gates admit), incl. queries with sparse windows."""
    from gaussiansplattingregistration_tpu.ops import knn

    n = 2000
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    r = 0.12
    plan = knn.grid_nn_plan(pts, r)
    assert plan is not None
    origin, inv_cell, (nx, ny, nz), max_occ = plan
    table = knn.build_grid_table(
        jnp.asarray(pts), jnp.ones(n, bool), jnp.asarray(origin),
        jnp.asarray(inv_cell), nx, ny, nz, max_occ,
    )
    k = 8
    d2g, idxg = knn.grid_topk(
        jnp.asarray(pts), table, jnp.asarray(origin), jnp.asarray(inv_cell),
        jnp.asarray([nx, ny, nz], jnp.int32), k,
    )
    d2b, idxb = knn.knn(jnp.asarray(pts), jnp.asarray(pts), k=k)
    d2g, idxg = np.asarray(d2g), np.asarray(idxg)
    d2b, idxb = np.asarray(d2b), np.asarray(idxb)
    for i in range(n):
        want = {int(j) for j, d in zip(idxb[i], d2b[i]) if d <= r * r}
        got = {int(j) for j, d in zip(idxg[i], d2g[i]) if d <= r * r}
        assert want == got, (i, want, got)
    # distances agree where gated
    mb = d2b <= r * r
    np.testing.assert_allclose(
        np.sort(np.where(mb, d2b, np.inf), axis=1)[:, :3],
        np.sort(np.where(d2g <= r * r, d2g, np.inf), axis=1)[:, :3],
        rtol=1e-5, atol=1e-12,
    )
