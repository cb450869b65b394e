"""Sequential RANSAC plane fitting, vmapped on TPU.

Counterpart of `fit_planes` (`/root/reference/src/utils/plane_fitting_util.py:6-102`):
extract up to `plane_count` planes; per plane, `iterations` random 3-point
hypotheses (with a minimum pairwise sample distance), plane from the cross
product, inliers = |point-plane distance| < threshold AND |normal . plane
normal| > normal_threshold; best hypothesis wins; inliers are removed before
the next round while original indices are tracked.

TPU shape: all hypotheses of a round are generated and scored in one vmapped
batch (the reference loops in Python); removed points are masked, not
reallocated, so shapes stay static. Also provides `plane_grid_points`, the
geometry counterpart of `get_o3d_plane` (`plane_fitting_util.py:105-154`) for
display meshes without Open3D.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.parameters import PlaneFittingParams
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud


@functools.partial(jax.jit, static_argnames=("iterations",))
def _fit_single_plane(
    key, points, normals, active,
    distance_threshold, normal_threshold, min_sample_distance,
    iterations: int,
):
    """Best plane over `iterations` vmapped hypotheses.

    Returns (plane [4], inlier_mask [N], inlier_count).
    """
    n = points.shape[0]
    probs = active.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    # Sample 3 support points per hypothesis; hypotheses violating the
    # min-pairwise-distance constraint are discarded (the reference instead
    # rejection-samples until satisfied, plane_fitting_util.py:71-90).
    idx = jax.random.choice(key, n, shape=(iterations, 3), replace=True, p=probs)

    def one(sample):
        p1, p2, p3 = points[sample[0]], points[sample[1]], points[sample[2]]
        d12 = jnp.linalg.norm(p1 - p2)
        d13 = jnp.linalg.norm(p1 - p3)
        d23 = jnp.linalg.norm(p2 - p3)
        sample_ok = (
            (d12 >= min_sample_distance)
            & (d13 >= min_sample_distance)
            & (d23 >= min_sample_distance)
        )
        nrm = jnp.cross(p2 - p1, p3 - p1)
        nn = jnp.linalg.norm(nrm)
        nrm = nrm / jnp.maximum(nn, 1e-12)
        d = -jnp.dot(nrm, p1)
        dists = points @ nrm + d
        dist_in = jnp.abs(dists) < distance_threshold
        align = jnp.abs(normals @ nrm) > normal_threshold
        inliers = dist_in & align & active
        count = jnp.where(sample_ok & (nn > 1e-12), jnp.sum(inliers), -1)
        return count, jnp.concatenate([nrm, d[None]])

    counts, planes = jax.vmap(one)(idx)
    best = jnp.argmax(counts)
    plane = planes[best]
    dists = points @ plane[:3] + plane[3]
    inliers = (
        (jnp.abs(dists) < distance_threshold)
        & (jnp.abs(normals @ plane[:3]) > normal_threshold)
        & active
    )
    return plane, inliers, counts[best]


def fit_planes(
    pc: PointCloud,
    params: PlaneFittingParams,
    seed: int = 0,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Sequential multi-plane RANSAC. Returns (plane_coefficients [4] list,
    original-inlier-index arrays), like the reference's `fit_planes`."""
    if pc.normals is None:
        from gaussiansplattingregistration_tpu.ops import normals as normals_ops

        pc = normals_ops.with_estimated_normals(pc)

    key = jax.random.PRNGKey(seed)
    active = jnp.ones(pc.num_points, dtype=bool)
    coefficients, inlier_lists = [], []
    for _ in range(params.plane_count):
        key, sub = jax.random.split(key)
        plane, inliers, count = _fit_single_plane(
            sub, pc.points, pc.normals, active,
            jnp.asarray(params.distance_threshold, jnp.float32),
            jnp.asarray(params.normal_threshold, jnp.float32),
            jnp.asarray(params.min_distance, jnp.float32),
            int(params.iterations),
        )
        if int(count) <= 0:
            break
        coefficients.append(np.asarray(plane))
        inlier_lists.append(np.flatnonzero(np.asarray(inliers)))
        active = active & ~inliers
        if int(jnp.sum(active)) == 0:
            break
    return coefficients, inlier_lists


def project_points_onto_plane(points: jax.Array, plane: jax.Array):
    """(`plane_fitting_util.py:93-102`): returns (projected points, signed
    distances)."""
    nrm = plane[:3] / jnp.maximum(jnp.linalg.norm(plane[:3]), 1e-12)
    dists = points @ nrm + plane[3]
    return points - dists[:, None] * nrm, dists


def plane_grid_points(
    plane: np.ndarray, points: np.ndarray, resolution: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """Display-mesh geometry for a fitted plane (counterpart of
    `get_o3d_plane`, `plane_fitting_util.py:105-154`, minus Open3D): returns
    (vertices [res*res, 3], double-sided triangle index list [M, 3])."""
    a, b, c, d = [float(v) for v in plane]
    nrm = np.array([a, b, c], dtype=np.float32)
    nrm /= max(np.linalg.norm(nrm), 1e-12)
    dists = points @ nrm + d
    projected = points - dists[:, None] * nrm

    u = np.array([-b, a, 0.0], dtype=np.float32)
    if np.linalg.norm(u) == 0:
        u = np.array([1.0, 0.0, 0.0], dtype=np.float32)
    u /= np.linalg.norm(u)
    v = np.cross(nrm, u)

    coords = np.stack([projected @ u, projected @ v], axis=-1)
    lo, hi = coords.min(0), coords.max(0)
    xs = np.linspace(lo[0], hi[0], resolution)
    ys = np.linspace(lo[1], hi[1], resolution)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    verts = (X[..., None] * u + Y[..., None] * v).reshape(-1, 3)
    verts += nrm * (-d)

    tris = []
    for i in range(resolution - 1):
        for j in range(resolution - 1):
            idx = i * resolution + j
            tris.append([idx, idx + resolution, idx + 1])
            tris.append([idx + resolution, idx + resolution + 1, idx + 1])
    tris += [[t[2], t[1], t[0]] for t in tris]
    return verts.astype(np.float32), np.asarray(tris, np.int32)
