"""FPFH features (Fast Point Feature Histograms), jittable.

Counterpart of `o3d.pipelines.registration.compute_fpfh_feature` used in
`preprocess_point_cloud` (`/root/reference/src/utils/global_registration_util.py:83-94`).
Follows Rusu et al. 2009 / the PCL formulation Open3D implements: 3 Darboux
pair features (alpha, phi, theta), 11 bins each -> 33-dim histograms; SPFH
histograms are percentage-normalized, FPFH(p) = SPFH(p) + (1/k) sum_i
SPFH(q_i)/omega_i with omega the neighbor distance.

TPU shape: fixed-K hybrid neighborhoods (radius + max_nn cap, like Open3D's
KDTreeSearchParamHybrid), one-hot histogram accumulation on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops import knn as knn_ops

FPFH_BINS = 11
FPFH_DIM = 3 * FPFH_BINS


def _pair_features(p_s, n_s, p_t, n_t):
    """Darboux-frame pair features (alpha, phi, theta, d) for source point
    (p_s, n_s) and neighbor (p_t, n_t); all [..., 3] -> [...]."""
    dvec = p_t - p_s
    d = jnp.linalg.norm(dvec, axis=-1)
    dsafe = jnp.maximum(d, 1e-12)[..., None]
    du = dvec / dsafe

    u = n_s
    v = jnp.cross(du, u)
    vnorm = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    v = v / vnorm
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * n_t, axis=-1)
    phi = jnp.sum(u * du, axis=-1)
    theta = jnp.arctan2(jnp.sum(w * n_t, axis=-1), jnp.sum(u * n_t, axis=-1))
    return alpha, phi, theta, d


def _histogram(values, vmin, vmax, valid):
    """One-hot histogram over FPFH_BINS bins. values [N, K] -> [N, BINS]."""
    scaled = (values - vmin) / (vmax - vmin) * FPFH_BINS
    bins = jnp.clip(jnp.floor(scaled), 0, FPFH_BINS - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(bins, FPFH_BINS, dtype=values.dtype)
    return jnp.sum(onehot * valid[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("max_nn",))
def compute_fpfh(
    points: jax.Array,
    normals: jax.Array,
    radius: float,
    max_nn: int = 100,
) -> jax.Array:
    """[N, 3] points + normals -> [N, 33] FPFH features.

    Defaults mirror the reference: radius = 5 * voxel_size, max_nn = 100
    (`global_registration_util.py:90-93`).
    """
    n = points.shape[0]
    k = min(max_nn, n)
    d2, idx, valid = knn_ops.hybrid_search(points, points, radius, k)
    # Exclude self-matches (distance 0 at slot 0).
    self_mask = idx == jnp.arange(n, dtype=idx.dtype)[:, None]
    valid = valid & ~self_mask

    p_t = points[idx]          # [N, K, 3]
    n_t = normals[idx]
    p_s = points[:, None, :]
    n_s = normals[:, None, :]
    alpha, phi, theta, d = _pair_features(p_s, n_s, p_t, n_t)

    vf = valid.astype(points.dtype)
    counts = jnp.maximum(jnp.sum(vf, axis=1, keepdims=True), 1.0)
    # Percentage-normalized SPFH (PCL/Open3D hist_incr = 100/nn).
    incr = 100.0 / counts
    spfh = jnp.concatenate(
        [
            _histogram(alpha, -1.0, 1.0, vf * incr),
            _histogram(phi, -1.0, 1.0, vf * incr),
            _histogram(theta, -jnp.pi, jnp.pi, vf * incr),
        ],
        axis=-1,
    )  # [N, 33]

    # FPFH = SPFH(p) + (1/k) sum SPFH(q_i) / ||p - q_i||.
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    w = jnp.where(valid, 1.0 / jnp.maximum(dist, 1e-6), 0.0)  # [N, K]
    neigh_spfh = spfh[idx]  # [N, K, 33]
    fpfh = spfh + jnp.einsum("nk,nkf->nf", w, neigh_spfh) / counts
    return fpfh
