"""Multi-chip rasterization: splat-sharded projection, tile-sharded compositing.

The distributed design SURVEY.md §5.7 calls for:

* each device holds N/D splats and projects them locally (embarrassingly
  parallel — the expensive per-splat EWA math never crosses the ICI);
* the compact screen-space records (means2d, conic, depth, radius, color,
  opacity — 12 floats/splat vs ~59 for the raw splat) are `all_gather`ed over
  the `splat` axis;
* image tiles are range-partitioned over the same axis: each device bins and
  composites only its horizontal tile slab (`rasterize_tile_slab`), so the
  O(N log N) sort and the K-deep compositing shrink by 1/D per device;
* slabs concatenate into the full image along H — no further reduction is
  needed because compositing is exact per tile (unlike a depth-split scheme,
  no cross-device alpha merge is required).

Gradients: the whole thing is `shard_map`ped jnp, so `jax.grad` produces the
backward pass with XLA inserting the reduce-scatter mirror of the all_gather.

Scaling note: the all_gather keeps per-device memory and sort cost O(N_total).
This is the simple/robust path; the scalable §5.7 design — depth-bucketed
all_to_all + partial-composite merge with O(N/D) per-device memory — lives in
parallel/compositor.py. Use this one for small N or when exact per-tile
truncation semantics across device counts matter; use the compositor to scale
N beyond a single device's memory.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import (
    DEFAULT_CONFIG,
    RasterizeConfig,
    compute_view_colors,
    project_gaussians,
    rasterize_tile_slab,
)


def _slab_body(
    means, cov3d, opacity, features,
    viewmat, intrinsics, background,
    width: int, height: int, sh_degree: int,
    tiles_x: int, tiles_y_padded: int,
    config: RasterizeConfig,
    axis: str,
):
    """Per-device body under shard_map: local projection -> all_gather ->
    composite own tile slab."""
    n_dev = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)

    proj = project_gaussians(
        means, cov3d, viewmat, intrinsics, width, height, config
    )
    cam_center = -(viewmat[:3, :3].T @ viewmat[:3, 3])
    colors = compute_view_colors(features, means, cam_center, sh_degree)
    op = opacity * proj["valid"].astype(opacity.dtype)

    def gather(x):
        return jax.lax.all_gather(x, axis, tiled=True)

    g_means2d = gather(proj["means2d"])
    g_conic = gather(proj["conic"])
    g_depth = gather(proj["depth"])
    g_radius = gather(proj["radius"])
    g_valid = gather(proj["valid"])
    g_colors = gather(colors)
    g_op = gather(op)

    tiles_per_dev = tiles_y_padded // n_dev
    ty_offset = my * tiles_per_dev

    rgb, alpha, depth = rasterize_tile_slab(
        g_means2d, g_conic, g_depth, g_radius, g_valid, g_colors, g_op,
        tiles_x, tiles_y_padded, config,
        ty_offset=ty_offset, tiles_y_window=tiles_per_dev,
    )
    rgb = rgb + (1.0 - alpha[..., None]) * background[None, None, :]
    return rgb, alpha, depth


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "config", "mesh", "axis"),
)
def rasterize_arrays_sharded(
    means: jax.Array,      # [N, 3] sharded over `axis`
    cov3d: jax.Array,      # [N, 6]
    opacity: jax.Array,    # [N]
    features: jax.Array,   # [N, K, 3]
    viewmat: jax.Array,
    intrinsics: jax.Array,
    width: int,
    height: int,
    sh_degree: int,
    background: jax.Array,
    config: RasterizeConfig = DEFAULT_CONFIG,
    *,
    mesh: Mesh,
    axis: str = "splat",
):
    """Multi-device rasterization over a mesh axis.

    N must be divisible by the axis size (pad the cloud with
    `GaussianCloud.pad_to`); returns full (rgb, alpha, depth) images,
    replicated.
    """
    ts = config.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)
    n_dev = mesh.shape[axis]
    tiles_y_padded = ((tiles_y + n_dev - 1) // n_dev) * n_dev

    # Inputs: splat arrays sharded on the leading axis; camera replicated.
    in_specs = (
        P(axis), P(axis), P(axis), P(axis),  # splat arrays
        P(), P(), P(),                        # viewmat, intrinsics, background
    )
    out_specs = (P(axis), P(axis), P(axis))  # slabs stack along H

    body = functools.partial(
        _slab_body,
        width=width, height=height, sh_degree=sh_degree,
        tiles_x=tiles_x, tiles_y_padded=tiles_y_padded,
        config=config, axis=axis,
    )
    rgb, alpha, depth = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(means, cov3d, opacity, features, viewmat, intrinsics, background)

    return rgb[:height, :width], alpha[:height, :width], depth[:height, :width]


def rasterize_sharded(
    cloud,
    camera,
    mesh: Mesh,
    background=(0.0, 0.0, 0.0),
    scaling_modifier: float = 1.0,
    config: RasterizeConfig = DEFAULT_CONFIG,
):
    """Render a GaussianCloud over a device mesh (splat axis sharded)."""
    n_dev = mesh.shape["splat"]
    n = cloud.num_points
    padded = cloud.pad_to(((n + n_dev - 1) // n_dev) * n_dev)

    shard = NamedSharding(mesh, P("splat"))
    means = jax.device_put(padded.xyz, shard)
    cov = jax.device_put(padded.get_covariance(scaling_modifier), shard)
    op = jax.device_put(padded.get_opacity[:, 0], shard)
    feats = jax.device_put(padded.get_features, shard)

    return rasterize_arrays_sharded(
        means, cov, op, feats,
        camera.viewmat, camera.intrinsics,
        camera.width, camera.height, cloud.sh_degree,
        jnp.asarray(background, jnp.float32),
        config, mesh=mesh,
    )
