"""PointCloud: plain point cloud pytree (the Open3D-point-cloud analogue).

The reference converts both sparse PLYs and Gaussian clouds into
`open3d.geometry.PointCloud` objects for registration
(`/root/reference/src/utils/point_cloud_converter.py:11-49`). Here the same
role is played by an immutable JAX pytree holding positions plus optional
colors, normals, and per-point covariances (needed by generalized ICP).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    points: jax.Array                        # [N, 3]
    colors: Optional[jax.Array] = None       # [N, 3] in [0, 1]
    normals: Optional[jax.Array] = None      # [N, 3]
    covariances: Optional[jax.Array] = None  # [N, 6] packed symmetric

    def __len__(self) -> int:
        return int(self.points.shape[0])

    @property
    def num_points(self) -> int:
        return int(self.points.shape[0])

    def transform(self, T: jax.Array) -> "PointCloud":
        """Apply a 4x4 rigid transform to points, normals, covariances."""
        from gaussiansplattingregistration_tpu.ops import math3d

        T = jnp.asarray(T, self.points.dtype)
        R = T[:3, :3]
        new_points = self.points @ R.T + T[:3, 3]
        new_normals = None if self.normals is None else self.normals @ R.T
        new_cov = (
            None
            if self.covariances is None
            else math3d.transform_covariance(self.covariances, R)
        )
        return dataclasses.replace(
            self, points=new_points, normals=new_normals, covariances=new_cov
        )

    def select(self, indices: jax.Array) -> "PointCloud":
        """Gather a subset (counterpart of Open3D `select_by_index`)."""
        take = lambda a: None if a is None else a[indices]
        return PointCloud(
            points=self.points[indices],
            colors=take(self.colors),
            normals=take(self.normals),
            covariances=take(self.covariances),
        )

    def aabb(self) -> tuple[jax.Array, jax.Array]:
        return jnp.min(self.points, axis=0), jnp.max(self.points, axis=0)
