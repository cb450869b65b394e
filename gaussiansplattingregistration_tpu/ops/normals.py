"""Point-cloud normal estimation via local PCA (kNN plane fitting).

Counterpart of Open3D's `estimate_normals(KDTreeSearchParamHybrid(...))` used
throughout the reference (e.g.
`/root/reference/src/utils/point_cloud_converter.py:24-27,44-47`,
`/root/reference/src/gui/workers/registration/qt_multiscale_registrator.py:127-133`).
Implementation: for each point, gather k neighbors (hybrid radius search),
eigendecompose the neighborhood covariance, take the smallest-eigenvalue
eigenvector, orient toward a reference direction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops import knn as knn_ops


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(
    points: jax.Array,
    k: int = 30,
    radius: float = jnp.inf,
    orientation_reference: jax.Array | None = None,
) -> jax.Array:
    """[N, 3] points -> [N, 3] unit normals.

    Defaults (k=30) match the reference's `max_nn=30` hybrid searches. Masked
    neighbors outside `radius` are excluded from the covariance.
    """
    n = points.shape[0]
    k = min(k, n)
    d2, idx = knn_ops.knn(points, points, k=k)
    valid = d2 <= radius * radius  # [N, k]
    neigh = points[idx]  # [N, k, 3]
    w = valid.astype(points.dtype)[..., None]
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(neigh * w, axis=1) / count
    centered = (neigh - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / count[..., None]
    # Smallest-eigenvector of each 3x3 covariance.
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., :, 0]
    if orientation_reference is None:
        # Open3D default: orient toward +z half-space.
        orientation_reference = jnp.array([0.0, 0.0, 1.0], dtype=points.dtype)
    sign = jnp.sign(jnp.sum(normals * orientation_reference, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return normals * sign


def with_estimated_normals(pc, k: int = 30, radius: float = jnp.inf):
    """Return a copy of a PointCloud with estimated normals attached."""
    normals = estimate_normals(pc.points, k=k, radius=radius)
    return dataclasses.replace(pc, normals=normals)
