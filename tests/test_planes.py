"""Plane-inlier flows: registration on plane subsets + per-plane HEM merging.

Reference semantics:
`execute_*_registration_inlier` (registration_controller.py:30-91) registers
on `select_by_index(concat(plane_indices))` subsets of the LEVEL-0 clouds;
`PlaneInlierMergingWorker` (qt_plane_merging.py:44-182) HEM-downsamples each
plane's inliers independently while off-plane points pass through every
level unchanged.
"""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.parameters import (
    GaussianMixtureParams,
    PlaneFittingParams,
)
from gaussiansplattingregistration_tpu.models.workspace import Workspace
from gaussiansplattingregistration_tpu.ops import se3
from gaussiansplattingregistration_tpu.ops.plane_fitting import fit_planes
from gaussiansplattingregistration_tpu.pipelines.planes import (
    load_plane_indices,
    merge_plane_inliers,
    select_plane_inliers,
)
from gaussiansplattingregistration_tpu.utils import io as gio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_planar_cloud(rng, n_plane=500, n_noise=120):
    """Gaussian cloud: two perpendicular planar patches + off-plane noise.

    Returns (cloud, idx_plane_a, idx_plane_b, idx_noise) with indices in
    cloud row order.
    """
    a = np.column_stack([
        rng.uniform(-1, 1, (n_plane, 2)),
        np.zeros(n_plane) + 0.003 * rng.normal(size=n_plane),
    ])                                                     # z ~ 0
    b = np.column_stack([
        rng.uniform(-1, 1, n_plane),
        np.full(n_plane, 1.0) + 0.003 * rng.normal(size=n_plane),
        rng.uniform(-1, 1, n_plane),
    ])                                                     # y ~ 1
    noise = rng.uniform(-1, 1, (n_noise, 3)) + np.array([0, 3.0, 0])
    xyz = np.vstack([a, b, noise]).astype(np.float32)
    n = xyz.shape[0]
    rgb = 0.5 + 0.3 * np.sin(3.0 * xyz)
    C0 = 0.28209479177387814
    cloud = GaussianCloud.create(
        xyz=xyz,
        features_dc=((rgb - 0.5) / C0)[:, None, :].astype(np.float32),
        features_rest=np.zeros((n, 0, 3), np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=np.log(rng.uniform(0.02, 0.05, size=(n, 3))).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        sh_degree=0,
    )
    return (
        cloud,
        np.arange(n_plane),
        np.arange(n_plane, 2 * n_plane),
        np.arange(2 * n_plane, n),
    )


def test_merge_plane_inliers_semantics(rng):
    cloud, idx_a, idx_b, idx_noise = make_planar_cloud(rng)
    params = GaussianMixtureParams(cluster_level=2, hem_reduction=3.0)
    levels = merge_plane_inliers(cloud, [idx_a, idx_b], params, seed=0)
    assert len(levels) == params.cluster_level

    n_unsel = len(idx_noise)
    unsel = cloud.select(jnp.asarray(idx_noise))
    for d, lvl in enumerate(levels):
        # Off-plane points pass through EVERY level unchanged, leading rows
        # (qt_plane_merging.py:160-175 extends the unselected SoA first).
        np.testing.assert_array_equal(
            np.asarray(lvl.xyz)[:n_unsel], np.asarray(unsel.xyz)
        )
        np.testing.assert_array_equal(
            np.asarray(lvl.opacity)[:n_unsel], np.asarray(unsel.opacity)
        )
        # The plane parts shrink by roughly the reduction factor per level.
        n_plane_d = lvl.num_points - n_unsel
        assert n_plane_d < (len(idx_a) + len(idx_b)) / (1.6 ** (d + 1))
        assert n_plane_d > 0

    # Levels shrink monotonically.
    assert levels[1].num_points < levels[0].num_points


def test_merge_plane_inliers_requires_planes(rng):
    cloud, *_ = make_planar_cloud(rng, n_plane=40, n_noise=10)
    with pytest.raises(ValueError):
        merge_plane_inliers(cloud, [], GaussianMixtureParams(cluster_level=1))


def test_workspace_inlier_pair(rng):
    cloud, idx_a, idx_b, _ = make_planar_cloud(rng, n_plane=60, n_noise=20)
    ws = Workspace()
    ws.load_pair(cloud, cloud)
    with pytest.raises(ValueError):
        ws.inlier_pair
    ws.plane_indices_first = [idx_a, idx_b]
    ws.plane_indices_second = [idx_a]
    first, second = ws.inlier_pair
    assert first.num_points == len(idx_a) + len(idx_b)
    assert second.num_points == len(idx_a)
    np.testing.assert_allclose(
        np.asarray(first.points),
        np.asarray(ws.point_list_first[0].points)[
            np.concatenate([idx_a, idx_b])
        ],
    )


def run_cli(*args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "gaussiansplattingregistration_tpu.cli",
         *map(str, args)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540,
    )
    assert out.returncode == 0, f"cli {args[0]} failed:\n{out.stderr[-4000:]}"
    return out.stdout


def test_cli_plane_flow(tmp_path, rng):
    """fit-planes -> register --plane-inliers -> merge-planes via the CLI."""
    cloud, idx_a, idx_b, idx_noise = make_planar_cloud(rng)
    tgt_path = tmp_path / "tgt.ply"
    src_path = tmp_path / "src.ply"
    gio.save_gaussian_cloud(cloud, str(tgt_path))
    xi = np.array([0.02, -0.015, 0.01, 0.03, -0.02, 0.015], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = cloud.transform(jnp.asarray(np.linalg.inv(T_gt), jnp.float32))
    gio.save_gaussian_cloud(src, str(src_path))

    # 1. fit planes on both clouds
    planes_t = tmp_path / "planes_tgt.json"
    planes_s = tmp_path / "planes_src.json"
    for path, out_json in ((tgt_path, planes_t), (src_path, planes_s)):
        out = json.loads(run_cli(
            "fit-planes", path, "--plane-count", 2, "--iterations", 300,
            "--distance-threshold", 0.02, "--normal-threshold", 0.8,
            "--min-distance", 0.2, "--output", out_json,
        ).strip().splitlines()[-1])
        assert len(out["planes"]) == 2
        assert all(c > 350 for c in out["inlier_counts"]), out

    # 2. register on the plane-inlier subsets only
    t_out = tmp_path / "t.json"
    run_cli("register", src_path, tgt_path, "--method", "point_to_plane",
            "--max-correspondence", "0.3", "--max-iteration", "40",
            "--plane-inliers-first", planes_s,
            "--plane-inliers-second", planes_t,
            "--output", t_out)
    T_est = np.asarray(json.load(open(t_out))["transformation"])
    residual = jnp.asarray(T_est @ np.linalg.inv(T_gt), jnp.float32)
    err = float(jnp.linalg.norm(se3.se3_log(residual)))
    assert err < 2e-2, err

    # mismatched flags must fail
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    bad = subprocess.run(
        [sys.executable, "-m", "gaussiansplattingregistration_tpu.cli",
         "register", str(src_path), str(tgt_path),
         "--plane-inliers-first", str(planes_s)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=240,
    )
    assert bad.returncode != 0

    # 3. per-plane HEM merge of the target cloud
    out = json.loads(run_cli(
        "merge-planes", tgt_path, planes_t, tmp_path / "merged",
        "--cluster-level", 2,
    ).strip().splitlines()[-1])
    assert len(out["levels"]) == 2
    n_unsel = out["unselected_points"]
    for d, lvl in enumerate(out["levels"], start=1):
        assert os.path.exists(lvl["path"])
        n_plane_d = lvl["points"] - n_unsel
        assert 0 < n_plane_d < out["plane_points"] / (1.6 ** d)
        reread = gio.load_gaussian_cloud(lvl["path"])
        assert reread.num_points == lvl["points"]


def test_workspace_apply_plane_merge(rng):
    """Workspace plane-merge result handling: levels replace existing HEM
    levels, plane state clears (downsampler_controller.py:90-97)."""
    cloud, idx_a, idx_b, idx_noise = make_planar_cloud(
        rng, n_plane=150, n_noise=40
    )
    ws = Workspace()
    ws.load_pair(cloud, cloud)
    # Pre-existing HEM levels must be trimmed away by the merge.
    ws.gaussian_list_first.append(cloud)
    ws.point_list_first.append(ws.point_list_first[0])
    ws.plane_indices_first = [idx_a, idx_b]
    ws.plane_indices_second = [idx_a, idx_b]
    params = GaussianMixtureParams(cluster_level=2, hem_reduction=3.0)
    ws.apply_plane_merge(params, seed=0)
    assert len(ws.gaussian_list_first) == 3   # level 0 + 2 merged levels
    assert len(ws.gaussian_list_second) == 3
    assert len(ws.point_list_first) == 3
    assert ws.plane_indices_first == [] and ws.plane_indices_second == []
    n_unsel = len(idx_noise)
    for lvl in ws.gaussian_list_first[1:]:
        assert n_unsel < lvl.num_points < cloud.num_points
    with pytest.raises(ValueError):
        ws.apply_plane_merge(params)  # planes were cleared
