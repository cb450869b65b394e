"""Global registration: FPFH + RANSAC feature matching, and FGR.

Counterpart of `/root/reference/src/utils/global_registration_util.py:48-94`:

* `preprocess_point_cloud`: voxel downsample -> normals (2x voxel radius,
  nn=30) -> FPFH (5x voxel radius, nn=100), same hyper-parameters;
* `ransac_registration`: feature correspondences (nearest neighbor in
  33-dim FPFH space — a Gram matmul on the MXU), optional mutual filter,
  batched hypothesis generation/evaluation (vmapped Kabsch on ransac_n
  samples) with Open3D's correspondence checkers (edge-length / distance /
  normal), confidence-based early termination;
* `fgr_registration`: Fast Global Registration (Zhou et al. 2016) —
  mutual-nearest feature correspondences + tuple test, then graduated
  non-convexity over the scaled Geman-McClure penalty with mu halved every
  4 iterations.

The reference's estimation-method enum bug (GICP and ColoredICP constructors
swapped, `global_registration_util.py:42-45`) is intentionally not
reproduced.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.parameters import (
    CorrespondenceChecker,
    FGRRegistrationParams,
    RANSACRegistrationParams,
)
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.models.registration_data import RegistrationResult
from gaussiansplattingregistration_tpu.ops import features as feat_ops
from gaussiansplattingregistration_tpu.ops import knn as knn_ops
from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops import normals as normals_ops
from gaussiansplattingregistration_tpu.ops.voxel import voxel_downsample


def preprocess_point_cloud(
    pc: PointCloud, voxel_size: float
) -> Tuple[PointCloud, jax.Array]:
    """Downsample + estimate normals + FPFH (`global_registration_util.py:83-94`)."""
    down = voxel_downsample(pc, voxel_size)
    down = dataclasses.replace(
        down,
        normals=normals_ops.estimate_normals(
            down.points, k=30, radius=voxel_size * 2.0
        ),
    )
    fpfh = feat_ops.compute_fpfh(
        down.points, down.normals, radius=voxel_size * 5.0, max_nn=100
    )
    return down, fpfh


def _feature_correspondences(
    src_feat: jax.Array, tgt_feat: jax.Array, mutual_filter: bool
):
    """Nearest neighbor in feature space; returns (tgt index per src point,
    keep mask)."""
    _, idx_st = knn_ops.nearest_neighbor(src_feat, tgt_feat)
    if not mutual_filter:
        return idx_st, jnp.ones(src_feat.shape[0], dtype=bool)
    _, idx_ts = knn_ops.nearest_neighbor(tgt_feat, src_feat)
    keep = idx_ts[idx_st] == jnp.arange(src_feat.shape[0])
    return idx_st, keep


def _kabsch(p: jax.Array, q: jax.Array) -> jax.Array:
    """Rigid transform from n>=3 paired points, [n,3]x[n,3] -> (4,4)."""
    p_bar = jnp.mean(p, axis=0)
    q_bar = jnp.mean(q, axis=0)
    H = (p - p_bar).T @ (q - q_bar)
    R = math3d.kabsch_rotation(H)
    t = q_bar - R @ p_bar
    return math3d.make_se3(R, t)


def _eval_hypotheses(
    key,
    src_pts, tgt_pts, src_normals, tgt_normals,
    corr_idx, corr_mask,
    max_correspondence,
    ransac_n: int,
    batch: int,
    checker_kinds: tuple,
    checker_values: jax.Array,
):
    """Evaluate `batch` RANSAC hypotheses; returns (fitness, rmse, T) stacks."""
    n_src = src_pts.shape[0]
    # Sample correspondence indices proportional to the keep mask.
    probs = corr_mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    samples = jax.random.choice(
        key, n_src, shape=(batch, ransac_n), replace=True, p=probs
    )

    def one(sample):
        p = src_pts[sample]                       # [n, 3]
        q = tgt_pts[corr_idx[sample]]             # [n, 3]
        T = _kabsch(p, q)

        ok = jnp.asarray(True)
        for kind, val in zip(checker_kinds, checker_values):
            if kind == "edge_length":
                # ||pi-pj|| vs ||qi-qj|| within factor `val` both ways.
                dp = jnp.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
                dq = jnp.linalg.norm(q[:, None, :] - q[None, :, :], axis=-1)
                iu = jnp.triu_indices(ransac_n, k=1)
                e1, e2 = dp[iu], dq[iu]
                ok &= jnp.all((e1 >= val * e2) & (e2 >= val * e1))
            elif kind == "distance":
                pt = p @ T[:3, :3].T + T[:3, 3]
                ok &= jnp.all(jnp.linalg.norm(pt - q, axis=-1) <= val)
            elif kind == "normal":
                ns = (src_normals[sample]) @ T[:3, :3].T
                nt = tgt_normals[corr_idx[sample]]
                ok &= jnp.all(jnp.sum(ns * nt, axis=-1) >= jnp.cos(val))

        # Evaluate over the full correspondence set.
        pt_all = src_pts @ T[:3, :3].T + T[:3, 3]
        d = jnp.linalg.norm(pt_all - tgt_pts[corr_idx], axis=-1)
        inlier = (d <= max_correspondence) & corr_mask
        count = jnp.sum(inlier)
        fitness = jnp.where(ok, count / jnp.maximum(jnp.sum(corr_mask), 1), -1.0)
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(inlier, d * d, 0.0)) / jnp.maximum(count, 1)
        )
        return fitness, rmse, T

    return jax.vmap(one)(samples)


@functools.partial(
    jax.jit,
    static_argnames=("ransac_n", "batch", "max_batches", "checker_kinds"),
)
def _ransac_search(
    key,
    src_pts, tgt_pts, src_normals, tgt_normals,
    corr_idx, corr_mask,
    max_correspondence,
    confidence,
    ransac_n: int,
    batch: int,
    max_batches: int,
    checker_kinds: tuple,
    checker_values: jax.Array,
):
    """The whole RANSAC iteration as ONE device program: a `lax.while_loop`
    over vmapped hypothesis batches with the Open3D confidence exit
    evaluated on-device — the host never syncs per batch (round-2 weak #7:
    the previous Python loop pulled an argmax to the host every 512
    hypotheses, serializing dispatch on the tunnel round-trip)."""

    def cond(carry):
        _, best_f, _, _, total = carry
        p_success = 1.0 - (
            1.0 - jnp.clip(best_f, 0.0, 1.0) ** ransac_n
        ) ** total
        done = (best_f > 0) & (p_success >= confidence)
        return (total < max_batches * batch) & ~done

    def body(carry):
        key, best_f, best_r, best_T, total = carry
        key, sub = jax.random.split(key)
        fitness, rmse, Ts = _eval_hypotheses(
            sub, src_pts, tgt_pts, src_normals, tgt_normals,
            corr_idx, corr_mask, max_correspondence,
            ransac_n, batch, checker_kinds, checker_values,
        )
        i = jnp.argmax(fitness)
        f_i, r_i, T_i = fitness[i], rmse[i], Ts[i]
        better = (f_i > best_f) | ((f_i == best_f) & (r_i < best_r))
        best_f = jnp.where(better, f_i, best_f)
        best_r = jnp.where(better, r_i, best_r)
        best_T = jnp.where(better, T_i, best_T)
        return (key, best_f, best_r, best_T, total + batch)

    init = (
        key, jnp.asarray(-1.0), jnp.asarray(jnp.inf), jnp.eye(4),
        jnp.asarray(0, jnp.int32),
    )
    _, best_f, best_r, best_T, total = jax.lax.while_loop(cond, body, init)
    return best_f, best_r, best_T, total


def ransac_registration(
    source: PointCloud,
    target: PointCloud,
    params: RANSACRegistrationParams,
    seed: int = 0,
    batch: int = 512,
) -> RegistrationResult:
    """FPFH + RANSAC global registration (counterpart of
    `do_ransac_registration`, `global_registration_util.py:48-60`).

    Hypotheses are generated and evaluated in vmapped batches inside one
    on-device while_loop; iteration stops at `max_iteration` total hypotheses
    or once the Open3D confidence bound 1-(1-fitness^n)^iters >= confidence
    is reached.
    """
    src_down, src_fpfh = preprocess_point_cloud(source, params.voxel_size)
    tgt_down, tgt_fpfh = preprocess_point_cloud(target, params.voxel_size)

    corr_idx, corr_mask = _feature_correspondences(
        src_fpfh, tgt_fpfh, params.mutual_filter
    )

    checker_kinds = tuple(c.kind for c in params.checkers)
    checker_values = jnp.asarray(
        [c.value for c in params.checkers], jnp.float32
    ) if params.checkers else jnp.zeros((0,), jnp.float32)

    best_f, best_r, best_T, total = _ransac_search(
        jax.random.PRNGKey(seed),
        src_down.points, tgt_down.points,
        src_down.normals, tgt_down.normals,
        corr_idx, corr_mask,
        jnp.asarray(params.max_correspondence, jnp.float32),
        jnp.asarray(params.confidence, jnp.float32),
        int(params.ransac_n),
        int(batch),
        max(1, -(-int(params.max_iteration) // int(batch))),
        checker_kinds,
        checker_values,
    )
    best_f = float(best_f)
    best_r = float(best_r)
    return RegistrationResult(
        transformation=np.asarray(best_T, np.float64),
        fitness=max(best_f, 0.0),
        inlier_rmse=best_r if np.isfinite(best_r) else 0.0,
        num_iterations=int(total),
        converged=best_f > 0,
    )


# --------------------------------------------------------------------------
# Fast Global Registration (Zhou, Park, Koltun 2016)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_tuple_count",))
def _tuple_test(key, src_c, tgt_c, tuple_scale, max_tuple_count: int):
    """FGR tuple test: random correspondence triples must have consistent
    edge-length ratios; returns a keep mask over correspondences."""
    m = src_c.shape[0]
    idx = jax.random.randint(key, (max_tuple_count, 3), 0, m)
    p = src_c[idx]  # [T, 3, 3]
    q = tgt_c[idx]

    def edges(x):
        return jnp.stack(
            [
                jnp.linalg.norm(x[:, 0] - x[:, 1], axis=-1),
                jnp.linalg.norm(x[:, 1] - x[:, 2], axis=-1),
                jnp.linalg.norm(x[:, 2] - x[:, 0], axis=-1),
            ],
            axis=-1,
        )

    ep, eq = edges(p), edges(q)
    ratio_ok = (ep > tuple_scale * eq) & (eq > tuple_scale * ep)
    tuple_ok = jnp.all(ratio_ok, axis=-1)  # [T]

    keep = jnp.zeros(m, dtype=bool)
    flat = idx.reshape(-1)
    ok_flat = jnp.repeat(tuple_ok, 3)
    keep = keep.at[flat].max(ok_flat)
    return keep


@functools.partial(jax.jit, static_argnames=("max_iterations", "decrease_mu"))
def _fgr_optimize(
    src_c, tgt_c, mask,
    max_corr, division_factor,
    max_iterations: int, decrease_mu: bool,
):
    """Graduated non-convexity over scaled Geman-McClure line processes."""
    mu0 = jnp.maximum(max_corr * max_corr * 64.0, 1e-6)

    def body(it, carry):
        T, mu = carry
        p = src_c @ T[:3, :3].T + T[:3, 3]
        r2 = jnp.sum((p - tgt_c) ** 2, axis=-1)
        w = (mu / (mu + r2)) ** 2 * mask
        # Weighted Kabsch update toward the current line-process weights.
        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        p_bar = jnp.sum(p * w[:, None], axis=0) / wsum
        q_bar = jnp.sum(tgt_c * w[:, None], axis=0) / wsum
        H = ((p - p_bar) * w[:, None]).T @ (tgt_c - q_bar)
        R = math3d.kabsch_rotation(H)
        t = q_bar - R @ p_bar
        delta = math3d.make_se3(R, t)
        mu_next = jnp.where(
            decrease_mu & ((it % 4) == 3),
            jnp.maximum(mu / division_factor, max_corr * max_corr),
            mu,
        )
        return (delta @ T, mu_next)

    T, _ = jax.lax.fori_loop(0, max_iterations, body, (jnp.eye(4), mu0))
    p = src_c @ T[:3, :3].T + T[:3, 3]
    d = jnp.linalg.norm(p - tgt_c, axis=-1)
    inlier = (d <= max_corr) & (mask > 0)
    count = jnp.maximum(jnp.sum(inlier), 1)
    fitness = jnp.sum(inlier) / jnp.maximum(jnp.sum(mask), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, d * d, 0.0)) / count)
    return T, fitness, rmse


def fgr_registration(
    source: PointCloud,
    target: PointCloud,
    params: FGRRegistrationParams,
    seed: int = 0,
) -> RegistrationResult:
    """Fast Global Registration (counterpart of `do_fgr_registration`,
    `global_registration_util.py:63-80`)."""
    src_down, src_fpfh = preprocess_point_cloud(source, params.voxel_size)
    tgt_down, tgt_fpfh = preprocess_point_cloud(target, params.voxel_size)

    # Mutual nearest correspondences (FGR's reciprocity test).
    _, idx_st = knn_ops.nearest_neighbor(src_fpfh, tgt_fpfh)
    _, idx_ts = knn_ops.nearest_neighbor(tgt_fpfh, src_fpfh)
    mutual = idx_ts[idx_st] == jnp.arange(src_fpfh.shape[0])

    src_c = src_down.points
    tgt_c = tgt_down.points[idx_st]

    keep = mutual
    if params.tuple_test:
        key = jax.random.PRNGKey(seed)
        tkeep = _tuple_test(
            key, src_c, tgt_c,
            jnp.asarray(params.tuple_scale, jnp.float32),
            int(params.max_tuple_count),
        )
        keep = keep & tkeep

    scale = 1.0
    if not params.use_absolute_scale:
        # FGR normalizes by the point-cloud spread unless absolute scale is on.
        span = jnp.maximum(
            jnp.linalg.norm(jnp.max(src_c, 0) - jnp.min(src_c, 0)),
            jnp.linalg.norm(jnp.max(tgt_down.points, 0) - jnp.min(tgt_down.points, 0)),
        )
        scale = float(span)

    T, fitness, rmse = _fgr_optimize(
        src_c, tgt_c, keep.astype(jnp.float32),
        jnp.asarray(params.maximum_correspondence * scale, jnp.float32),
        jnp.asarray(params.division_factor, jnp.float32),
        int(params.max_iterations),
        bool(params.decrease_mu),
    )
    return RegistrationResult(
        transformation=np.asarray(T, np.float64),
        fitness=float(fitness),
        inlier_rmse=float(rmse),
        num_iterations=int(params.max_iterations),
        converged=True,
    )
