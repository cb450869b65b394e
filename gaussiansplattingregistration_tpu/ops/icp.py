"""Local registration: the ICP family, TPU-native.

Counterpart of `do_icp_registration`
(`/root/reference/src/utils/local_registration_util.py:76-100`), which
delegates to Open3D's C++ pipelines. Here the whole solver runs on-device:

* correspondence search is a blocked brute-force nearest neighbor (a Gram
  matmul on the MXU — no KD-tree pointer chasing);
* estimation is a closed-form weighted Kabsch/SVD (point-to-point) or a single
  Gauss-Newton step on se(3) per iteration (point-to-plane, colored,
  generalized), with robust-kernel weights
  (`local_registration_util.py:58-73` semantics);
* the iteration loop is a `lax.while_loop` with Open3D's convergence
  criteria: |Δfitness| < relative_fitness and |Δrmse| < relative_rmse
  (`local_registration_util.py:54-55`), capped at max_iteration;
* fitness = matched fraction of source points, inlier_rmse = RMSE over
  matches — the same definitions Open3D reports.

Colored ICP follows Park et al. 2017 (Open3D's formulation): photometric
residual against a precomputed tangent-plane color gradient of the target,
blended with the geometric term by lambda_geometric = 0.968.
Generalized ICP follows Segal et al.: plane-to-plane Mahalanobis residuals
with (eps, 1, 1)-regularized covariances.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.parameters import (
    KernelLossFunctionType,
    LocalRegistrationParams,
    LocalRegistrationType,
)
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.models.registration_data import RegistrationResult
from gaussiansplattingregistration_tpu.ops import knn as knn_ops
from gaussiansplattingregistration_tpu.ops import math3d, se3

LAMBDA_GEOMETRIC = 0.968  # Open3D colored-ICP default
GICP_EPSILON = 1e-3       # Open3D generalized-ICP covariance epsilon


# --------------------------------------------------------------------------
# Robust kernels (Open3D weight functions, local_registration_util.py:58-73)
# --------------------------------------------------------------------------

def robust_weight(kind: KernelLossFunctionType, r: jax.Array, k: float) -> jax.Array:
    """w(r) = psi(r)/r for each Open3D robust loss."""
    if kind is KernelLossFunctionType.NONE or k == 0.0:
        return jnp.ones_like(r)
    if kind is KernelLossFunctionType.TUKEY:
        u = r / k
        return jnp.where(jnp.abs(r) <= k, (1.0 - u * u) ** 2, 0.0)
    if kind is KernelLossFunctionType.CAUCHY:
        u = r / k
        return 1.0 / (1.0 + u * u)
    if kind is KernelLossFunctionType.GM:
        return k / (k + r * r) ** 2
    if kind is KernelLossFunctionType.HUBER:
        return jnp.where(jnp.abs(r) <= k, 1.0, k / jnp.maximum(jnp.abs(r), 1e-12))
    raise ValueError(f"unknown kernel {kind}")


# --------------------------------------------------------------------------
# Estimation solvers (one update per correspondence round)
# --------------------------------------------------------------------------

def _solve_point_to_point(p, q, w):
    """Weighted Kabsch: best rigid (R, t) aligning p -> q. Returns (4,4)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    p_bar = jnp.sum(p * w[:, None], axis=0) / wsum
    q_bar = jnp.sum(q * w[:, None], axis=0) / wsum
    pc = p - p_bar
    qc = q - q_bar
    H = (pc * w[:, None]).T @ qc  # [3, 3]
    # Horn quaternion solve (math3d.kabsch_rotation) — never jnp.linalg.svd,
    # whose TPU f32 factors are non-orthogonal enough to shrink the cloud.
    R = math3d.kabsch_rotation(H)
    t = q_bar - R @ p_bar
    return math3d.make_se3(R, t)


def _gauss_newton_step(J, r, w, damping=1e-6):
    """Solve weighted normal equations; returns the se(3) increment (4,4).

    J: [M, 6], r: [M], w: [M]. Minimizes sum w (r + J dx)^2.
    """
    A = (J * w[:, None]).T @ J + damping * jnp.eye(6, dtype=J.dtype)
    b = (J * w[:, None]).T @ r
    dx = -jnp.linalg.solve(A, b)
    return se3.se3_exp(dx)


def _solve_point_to_plane(p, q, n, w):
    r = jnp.sum((p - q) * n, axis=-1)
    J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)  # [M, 6]
    return _gauss_newton_step(J, r, w)


def _solve_colored(p, q, n, c_src, c_tgt, g_tgt, w):
    """Joint geometric + photometric step (Park et al. / Open3D)."""
    r_g = jnp.sum((p - q) * n, axis=-1)
    J_g = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)

    # Project p onto the target tangent plane, evaluate linearized intensity.
    d_plane = jnp.sum((p - q) * n, axis=-1, keepdims=True)
    p_proj = p - d_plane * n
    i_proj = c_tgt + jnp.sum(g_tgt * (p_proj - q), axis=-1)
    r_i = i_proj - c_src
    # dr_i/dp = (I - n n^T) g
    g_perp = g_tgt - jnp.sum(g_tgt * n, axis=-1, keepdims=True) * n
    J_i = jnp.concatenate([g_perp, jnp.cross(p, g_perp)], axis=-1)

    sl = jnp.sqrt(LAMBDA_GEOMETRIC)
    si = jnp.sqrt(1.0 - LAMBDA_GEOMETRIC)
    J = jnp.concatenate([sl * J_g, si * J_i], axis=0)
    r = jnp.concatenate([sl * r_g, si * r_i], axis=0)
    ww = jnp.concatenate([w, w], axis=0)
    return _gauss_newton_step(J, r, ww)


def _solve_generalized(p, q, cov_p, cov_q, w):
    """Plane-to-plane (GICP): Mahalanobis residual d^T (Cq + R Cp R^T)^-1 d.

    cov_p here is already rotated into the current frame by the caller.
    """
    d = p - q  # [M, 3]
    M = cov_q + cov_p  # [M, 3, 3]
    Minv = jnp.linalg.inv(M + 1e-9 * jnp.eye(3, dtype=p.dtype))
    # J of d wrt xi: [I3 | -skew(p)], stacked per row: [M, 3, 6]
    zeros = jnp.zeros_like(p[:, 0])
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    skew = jnp.stack(
        [
            jnp.stack([zeros, -pz, py], axis=-1),
            jnp.stack([pz, zeros, -px], axis=-1),
            jnp.stack([-py, px, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), skew.shape)
    J = jnp.concatenate([eye, -skew], axis=-1)  # [M, 3, 6]

    # Weighted normal equations with matrix weights w * Minv.
    WM = Minv * w[:, None, None]
    A = jnp.einsum("mij,mik,mkl->jl", J, WM, J) + 1e-6 * jnp.eye(6, dtype=p.dtype)
    b = jnp.einsum("mij,mik,mk->j", J, WM, d)
    dx = -jnp.linalg.solve(A, b)
    return se3.se3_exp(dx)


def gicp_regularized_covariances(points: jax.Array, covariances: Optional[jax.Array],
                                 k: int = 20, epsilon: float = GICP_EPSILON) -> jax.Array:
    """(eps, 1, 1)-regularized covariances for GICP, [N, 3, 3].

    If per-point covariances exist (e.g. Gaussian splats), their eigenbasis is
    reused; otherwise a kNN PCA provides it — mirroring Open3D's behavior of
    estimating covariances when absent.
    """
    if covariances is not None:
        full = math3d.unpack_symmetric(covariances)
    else:
        d2, idx = knn_ops.knn(points, points, k=min(k, points.shape[0]))
        neigh = points[idx]
        mean = jnp.mean(neigh, axis=1, keepdims=True)
        c = neigh - mean
        full = jnp.einsum("nki,nkj->nij", c, c) / k
    _, vecs = jnp.linalg.eigh(full)  # ascending eigenvalues
    vals = jnp.array([epsilon, 1.0, 1.0], dtype=points.dtype)
    return jnp.einsum("nij,j,nkj->nik", vecs, vals, vecs)


def compute_color_gradients(points: jax.Array, normals: jax.Array,
                            intensities: jax.Array, k: int = 30) -> jax.Array:
    """Per-point tangent-plane color gradient (Open3D
    `InitializePointCloudForColoredICP` analogue). [N, 3]."""
    n_pts = points.shape[0]
    k = min(k, n_pts)
    d2, idx = knn_ops.knn(points, points, k=k)
    p_n = points[idx]            # [N, k, 3]
    i_n = intensities[idx]       # [N, k]
    nrm = normals                # [N, 3]
    # Project neighbors onto each tangent plane.
    rel = p_n - points[:, None, :]
    rel_t = rel - jnp.sum(rel * nrm[:, None, :], axis=-1, keepdims=True) * nrm[:, None, :]
    di = i_n - intensities[:, None]
    # LS for g with soft constraint g . n = 0.
    A = jnp.einsum("nki,nkj->nij", rel_t, rel_t) + \
        10.0 * jnp.einsum("ni,nj->nij", nrm, nrm) + \
        1e-6 * jnp.eye(3, dtype=points.dtype)
    b = jnp.einsum("nki,nk->ni", rel_t, di)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def _intensity(colors: jax.Array) -> jax.Array:
    return jnp.mean(colors, axis=-1)


# --------------------------------------------------------------------------
# Main driver
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "registration_type", "rejection_type", "k_value", "grid_dims"
    ),
)
def _icp_loop(
    src_points, src_colors, src_cov_reg,
    tgt_points, tgt_normals, tgt_colors, tgt_grads, tgt_cov_reg,
    init_transform,
    registration_type: LocalRegistrationType,
    rejection_type: KernelLossFunctionType,
    k_value,
    max_correspondence,
    relative_fitness,
    relative_rmse,
    max_iteration,      # traced: one compile serves every iteration budget
    n_src_true,         # traced: true (pre-padding) source count
    n_tgt_true=None,    # traced: true (pre-padding) target count
    grid_origin=None,
    grid_inv_cell=None,
    grid_dims=None,     # static (nx, ny, nz, max_occ) — None = brute force
):
    max_d2 = max_correspondence * max_correspondence

    if grid_dims is not None:
        # Build the 27-cell candidate table ON DEVICE, once per call,
        # amortized over every while_loop iteration below.
        nx, ny, nz, max_occ = grid_dims
        grid_w = 27 * max_occ
        grid_table = knn_ops.build_grid_table(
            tgt_points,
            jnp.arange(tgt_points.shape[0]) < n_tgt_true,
            grid_origin, grid_inv_cell,
            nx, ny, nz, max_occ,
        )

    def correspondences(T):
        p = src_points @ T[:3, :3].T + T[:3, 3]
        if grid_dims is not None:
            # Gated NN via the 27-cell candidate table: exact for every
            # in-gate match (the only ones the mask admits below).
            d2, idx = knn_ops.grid_nearest_neighbor(
                p, grid_table, grid_origin, grid_inv_cell,
                nx, ny, nz, grid_w,
            )
        else:
            d2, idx = knn_ops.nearest_neighbor(p, tgt_points)
        mask = d2 <= max_d2
        count = jnp.maximum(jnp.sum(mask), 1)
        fitness = jnp.sum(mask) / n_src_true
        rmse = jnp.sqrt(jnp.sum(jnp.where(mask, d2, 0.0)) / count)
        return p, idx, mask, fitness, rmse

    def step(T):
        p, idx, mask, fitness, rmse = correspondences(T)
        q = tgt_points[idx]
        wm = mask.astype(p.dtype)

        if registration_type is LocalRegistrationType.ICP_POINT_TO_POINT:
            # Open3D never applies robust kernels to point-to-point
            # (local_registration_util.py:58-60).
            delta = _solve_point_to_point(p, q, wm)
        else:
            n = tgt_normals[idx]
            r_plane = jnp.sum((p - q) * n, axis=-1)
            w = wm * robust_weight(rejection_type, r_plane, k_value)
            if registration_type is LocalRegistrationType.ICP_POINT_TO_PLANE:
                delta = _solve_point_to_plane(p, q, n, w)
            elif registration_type is LocalRegistrationType.ICP_COLOR:
                delta = _solve_colored(
                    p, q, n, _intensity(src_colors), _intensity(tgt_colors)[idx],
                    tgt_grads[idx], w,
                )
            elif registration_type is LocalRegistrationType.ICP_GENERAL:
                R = T[:3, :3]
                cov_p = jnp.einsum("ij,njk,lk->nil", R, src_cov_reg, R)
                delta = _solve_generalized(p, q, cov_p, tgt_cov_reg[idx], w)
            else:
                raise ValueError(registration_type)
        return delta @ T, fitness, rmse

    def cond(state):
        T, fitness, rmse, prev_f, prev_r, it, converged = state
        return (it < max_iteration) & jnp.logical_not(converged)

    def body(state):
        T, fitness, rmse, prev_f, prev_r, it, _ = state
        T_new, f_new, r_new = step(T)
        converged = (jnp.abs(f_new - prev_f) < relative_fitness) & (
            jnp.abs(r_new - prev_r) < relative_rmse
        ) & (it > 0)
        return (T_new, f_new, r_new, f_new, r_new, it + 1, converged)

    init = (
        init_transform, jnp.zeros(()), jnp.zeros(()),
        jnp.asarray(-1.0), jnp.asarray(-1.0), jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    T, _, _, _, _, iters, converged = jax.lax.while_loop(cond, body, init)
    # Final metrics at the converged pose (Open3D reports post-update values).
    _, _, _, fitness, rmse = correspondences(T)
    return T, fitness, rmse, iters, converged


def _shape_bucket(n: int) -> int:
    """Round n up to a coarse size grid (<= 12.5% padding, <= 8 buckets per
    octave) so clouds of nearby sizes share ONE compiled ICP executable —
    multiscale pyramids have a distinct point count per level and would
    otherwise recompile the whole solver at every scale."""
    if n <= 2048:
        return -(-n // 256) * 256
    step = 1 << (n.bit_length() - 4)
    return -(-n // step) * step


# Pad coordinates: +/-1e8 keeps pad-source and pad-target points ~2e8 apart
# (never within max_correspondence of each other or of real points), so every
# padded row is masked out of the correspondence set.
_PAD_SRC = 1.0e8
_PAD_TGT = -1.0e8


def _pad_rows(x: jax.Array, n: int, fill: float = 0.0) -> jax.Array:
    pad = ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


def icp(
    source: PointCloud,
    target: PointCloud,
    params: LocalRegistrationParams,
    init_transform=None,
    shape_bucket: bool = False,
    correspondence: str = "auto",
) -> RegistrationResult:
    """Run local ICP registration. Drop-in analogue of `do_icp_registration`
    (`/root/reference/src/utils/local_registration_util.py:76-100`).

    `shape_bucket=True` pads both clouds up to a coarse size grid so repeat
    calls at nearby sizes (multiscale pyramids) reuse one compiled solver.

    `correspondence`: "brute" = blocked [Q, N] min/argmin sweep; "grid" =
    the 27-cell candidate table (ops/knn.py `grid_nn_plan`), exact under the
    correspondence gate and ~O(Q * W) per iteration; "auto" picks grid when
    Q * N is large enough to pay for the host-side table build and the
    scene's density admits a bounded table.
    """
    if init_transform is None:
        init_transform = jnp.eye(4)
    init_transform = jnp.asarray(init_transform, jnp.float32)
    if correspondence not in ("auto", "brute", "grid"):
        raise ValueError(f"unknown correspondence mode {correspondence!r}")

    rt = params.registration_type
    needs_normals = rt is not LocalRegistrationType.ICP_POINT_TO_POINT

    tgt_normals = target.normals
    if needs_normals and tgt_normals is None:
        from gaussiansplattingregistration_tpu.ops import normals as normals_ops

        tgt_normals = normals_ops.estimate_normals(target.points)
    if tgt_normals is None:
        tgt_normals = jnp.zeros_like(target.points)

    tgt_colors = target.colors
    src_colors = source.colors
    tgt_grads = jnp.zeros_like(target.points)
    if rt is LocalRegistrationType.ICP_COLOR:
        if tgt_colors is None or src_colors is None:
            raise ValueError("colored ICP requires colors on both clouds")
        tgt_grads = compute_color_gradients(
            target.points, tgt_normals, _intensity(tgt_colors)
        )
    if tgt_colors is None:
        tgt_colors = jnp.zeros_like(target.points)
    if src_colors is None:
        src_colors = jnp.zeros_like(source.points)

    src_cov_reg = jnp.zeros((source.num_points, 3, 3), jnp.float32)
    tgt_cov_reg = jnp.zeros((target.num_points, 3, 3), jnp.float32)
    if rt is LocalRegistrationType.ICP_GENERAL:
        src_cov_reg = gicp_regularized_covariances(source.points, source.covariances)
        tgt_cov_reg = gicp_regularized_covariances(target.points, target.covariances)

    # Grid-pruned correspondence plan (host-side; before any padding so the
    # table indexes the TRUE target rows).
    grid = None
    # Threshold from the measured crossover (PERF.md): brute wins below
    # ~25k^2 (the [Q]-row gather + table build overheads), grid wins above.
    want_grid = correspondence == "grid" or (
        correspondence == "auto"
        and source.num_points * target.num_points >= 500_000_000
    )
    if want_grid:
        grid = knn_ops.grid_nn_plan(
            np.asarray(target.points), float(params.max_correspondence)
        )
        if (
            grid is not None
            and correspondence == "auto"
            and 27 * grid[3] * 40 > target.num_points
        ):
            # The candidate width W is too close to N for the pruning to
            # beat the brute sweep's fused [Q, N] reduce (measured
            # crossover ~N/W >= 40): keep brute.
            grid = None

    src_points, tgt_points = source.points, target.points
    n_src_true = src_points.shape[0]
    if shape_bucket:
        bs = _shape_bucket(src_points.shape[0])
        bt = _shape_bucket(tgt_points.shape[0])
        src_points = _pad_rows(src_points, bs, _PAD_SRC)
        src_colors = _pad_rows(src_colors, bs)
        src_cov_reg = _pad_rows(src_cov_reg, bs)
        tgt_points = _pad_rows(tgt_points, bt, _PAD_TGT)
        tgt_normals = _pad_rows(tgt_normals, bt)
        tgt_colors = _pad_rows(tgt_colors, bt)
        tgt_grads = _pad_rows(tgt_grads, bt)
        tgt_cov_reg = _pad_rows(tgt_cov_reg, bt)

    if grid is not None:
        g_origin, g_inv, (gnx, gny, gnz), g_occ = grid
        grid_kw = dict(
            n_tgt_true=jnp.asarray(target.num_points, jnp.int32),
            grid_origin=jnp.asarray(g_origin),
            grid_inv_cell=jnp.asarray(g_inv),
            grid_dims=(gnx, gny, gnz, g_occ),
        )
    else:
        grid_kw = {}
    T, fitness, rmse, iters, converged = _icp_loop(
        src_points, src_colors, src_cov_reg,
        tgt_points, tgt_normals, tgt_colors, tgt_grads, tgt_cov_reg,
        init_transform,
        rt,
        params.rejection_type,
        float(params.k_value),
        jnp.asarray(params.max_correspondence, jnp.float32),
        jnp.asarray(params.relative_fitness, jnp.float32),
        jnp.asarray(params.relative_rmse, jnp.float32),
        jnp.asarray(params.max_iteration, jnp.int32),
        jnp.asarray(n_src_true, jnp.float32),
        **grid_kw,
    )
    return RegistrationResult(
        transformation=np.asarray(T, np.float64),
        fitness=float(fitness),
        inlier_rmse=float(rmse),
        num_iterations=int(iters),
        converged=bool(converged),
    )
