"""Global registration tests: FPFH quality, RANSAC and FGR recover large poses.

Oracle (SURVEY.md §4): a known large SE(3) displacement (beyond ICP's basin)
must be recovered to within coarse tolerance, then refinable by ICP.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.parameters import (
    CorrespondenceChecker,
    FGRRegistrationParams,
    LocalRegistrationParams,
    RANSACRegistrationParams,
)
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.ops import global_registration as gr
from gaussiansplattingregistration_tpu.ops import icp as icp_ops
from gaussiansplattingregistration_tpu.ops import se3
from gaussiansplattingregistration_tpu.ops.features import compute_fpfh
from gaussiansplattingregistration_tpu.ops import normals as normals_ops


def make_structured_cloud(rng, n=800):
    """Scene with distinctive geometry (two walls + wavy floor) so FPFH has
    something to latch onto."""
    n1, n2, n3 = n // 3, n // 3, n - 2 * (n // 3)
    floor_xy = rng.uniform(-1, 1, size=(n1, 2))
    floor = np.column_stack([
        floor_xy[:, 0], floor_xy[:, 1],
        0.15 * np.sin(3 * floor_xy[:, 0]) + 0.1 * np.cos(4 * floor_xy[:, 1]),
    ])
    wall1_yz = rng.uniform(0, 1, size=(n2, 2))
    wall1 = np.column_stack([
        -1.0 + 0.05 * np.sin(5 * wall1_yz[:, 0]), wall1_yz[:, 0], wall1_yz[:, 1]
    ])
    wall2_xz = rng.uniform(0, 1, size=(n3, 2))
    wall2 = np.column_stack([
        wall2_xz[:, 0], 1.0 + 0.05 * np.cos(5 * wall2_xz[:, 1]), wall2_xz[:, 1]
    ])
    return np.vstack([floor, wall1, wall2]).astype(np.float32)


def big_transform():
    xi = np.array([0.4, -0.3, 0.25, 0.5, 0.4, -0.6], np.float32)
    return np.asarray(se3.se3_exp(jnp.asarray(xi)))


def pose_error(T_est, T_gt):
    delta = np.asarray(
        se3.se3_log(jnp.asarray(T_est @ np.linalg.inv(T_gt), jnp.float32))
    )
    return np.linalg.norm(delta)


def displaced_pair(rng):
    pts = make_structured_cloud(rng)
    T_gt = big_transform()
    src = (pts - T_gt[:3, 3]) @ T_gt[:3, :3]
    return (
        PointCloud(points=jnp.asarray(src.astype(np.float32))),
        PointCloud(points=jnp.asarray(pts)),
        T_gt,
    )


def test_fpfh_rotation_invariance(rng):
    """FPFH of a rotated cloud must match the original's (permuted)."""
    pts = make_structured_cloud(rng, n=300)
    nrm = normals_ops.estimate_normals(jnp.asarray(pts), k=20)
    f1 = compute_fpfh(jnp.asarray(pts), nrm, radius=0.5, max_nn=30)

    T = big_transform()
    pts2 = pts @ T[:3, :3].T + T[:3, 3]
    nrm2 = np.asarray(nrm) @ T[:3, :3].T
    f2 = compute_fpfh(
        jnp.asarray(pts2.astype(np.float32)), jnp.asarray(nrm2.astype(np.float32)),
        radius=0.5, max_nn=30,
    )
    # Same point order, so features should match pointwise.
    rel = np.abs(np.asarray(f1) - np.asarray(f2)).mean() / (np.abs(np.asarray(f1)).mean() + 1e-9)
    assert rel < 0.05, rel


def test_ransac_recovers_large_transform(rng):
    source, target, T_gt = displaced_pair(rng)
    params = RANSACRegistrationParams(
        voxel_size=0.1,
        mutual_filter=True,
        max_correspondence=0.15,
        max_iteration=20000,
        checkers=(
            CorrespondenceChecker("edge_length", 0.9),
            CorrespondenceChecker("distance", 0.15),
        ),
    )
    result = gr.ransac_registration(source, target, params, seed=3)
    assert result.fitness > 0.3, result.fitness
    # Coarse alignment: refine with ICP and check the final pose.
    refined = icp_ops.icp(
        source, target,
        LocalRegistrationParams(max_correspondence=0.2, max_iteration=50),
        init_transform=jnp.asarray(result.transformation, jnp.float32),
    )
    err = pose_error(refined.transformation, T_gt)
    assert err < 0.05, (err, result.fitness)


def test_fgr_recovers_large_transform(rng):
    source, target, T_gt = displaced_pair(rng)
    params = FGRRegistrationParams(voxel_size=0.1, maximum_correspondence=0.05)
    result = gr.fgr_registration(source, target, params, seed=1)
    refined = icp_ops.icp(
        source, target,
        LocalRegistrationParams(max_correspondence=0.2, max_iteration=50),
        init_transform=jnp.asarray(result.transformation, jnp.float32),
    )
    err = pose_error(refined.transformation, T_gt)
    assert err < 0.05, (err, result.fitness)


def test_preprocess_shapes(rng):
    pts = make_structured_cloud(rng, n=500)
    pc = PointCloud(points=jnp.asarray(pts))
    down, fpfh = gr.preprocess_point_cloud(pc, voxel_size=0.2)
    assert down.num_points < 500
    assert fpfh.shape == (down.num_points, 33)
    assert down.normals is not None
    assert np.all(np.isfinite(np.asarray(fpfh)))
