"""Voxel-grid downsampling, static-shaped for TPU.

Counterpart of Open3D's `voxel_down_sample` used by the multiscale registrator
(`/root/reference/src/gui/workers/registration/qt_multiscale_registrator.py:127-133`)
and global-registration preprocessing
(`/root/reference/src/utils/global_registration_util.py:83-94`): points are
averaged per occupied voxel.

TPU formulation: voxel ids -> sort -> segment means via `segment_sum` over a
static output budget. The number of occupied voxels is dynamic; the API
returns (padded arrays, valid mask, count), or a host-side wrapper that
compacts to the dynamic size outside jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud


@functools.partial(jax.jit, static_argnames=("max_voxels",))
def _voxel_downsample_padded(
    points, colors, normals, voxel_size, origin, max_voxels: int
):
    n = points.shape[0]
    ijk = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    # Lexicographic 3-key sort avoids packing voxel ids into one integer
    # (which would overflow int32 on large grids; x64 is disabled).
    ix, iy, iz, order = jax.lax.sort(
        (ijk[:, 0], ijk[:, 1], ijk[:, 2], jnp.arange(n, dtype=jnp.int32)),
        num_keys=3,
    )
    # Unique voxel segments: head of each run.
    heads = jnp.concatenate(
        [
            jnp.array([True]),
            (ix[1:] != ix[:-1]) | (iy[1:] != iy[:-1]) | (iz[1:] != iz[:-1]),
        ]
    )
    seg = jnp.cumsum(heads.astype(jnp.int32)) - 1          # [N] segment index
    count = seg[-1] + 1

    def seg_mean(x):
        s = jax.ops.segment_sum(x[order], seg, num_segments=max_voxels)
        c = jax.ops.segment_sum(jnp.ones((n, 1), x.dtype), seg, num_segments=max_voxels)
        return s / jnp.maximum(c, 1.0)

    out_points = seg_mean(points)
    out_colors = None if colors is None else seg_mean(colors)
    out_normals = None if normals is None else seg_mean(normals)
    valid = jnp.arange(max_voxels) < count
    return out_points, out_colors, out_normals, valid, count


def voxel_downsample(
    pc: PointCloud, voxel_size: float, max_voxels: Optional[int] = None
) -> PointCloud:
    """Host-facing downsample: returns a compacted PointCloud (dynamic size).

    Use `_voxel_downsample_padded` directly inside jitted pipelines where the
    padded/masked form is needed.
    """
    n = pc.num_points
    max_voxels = max_voxels or n
    origin = jnp.min(pc.points, axis=0)
    pts, cols, nrms, valid, count = _voxel_downsample_padded(
        pc.points, pc.colors, pc.normals, float(voxel_size), origin, max_voxels
    )
    k = int(count)
    take = lambda a: None if a is None else a[:k]
    out = PointCloud(points=pts[:k], colors=take(cols), normals=take(nrms))
    if out.normals is not None:
        norm = jnp.linalg.norm(out.normals, axis=-1, keepdims=True)
        out = PointCloud(
            points=out.points,
            colors=out.colors,
            normals=out.normals / jnp.maximum(norm, 1e-12),
        )
    return out
