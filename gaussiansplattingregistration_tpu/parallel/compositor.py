"""Scalable multi-chip compositor: depth-sharded partial composites (SURVEY §5.7).

`parallel/sharded_raster.py` all_gathers every screen-space record to every
device, so per-device memory and sort stay O(N_total) regardless of device
count. This module is the scalable design the survey calls for — the
ring-attention analogue for alpha compositing:

1. each device projects its N/D splats locally (compact 13-float records);
2. devices agree on D-1 global DEPTH pivots (psum'd histogram quantiles) and
   `all_to_all` the records into depth buckets: device d ends up owning the
   d-th front-to-back slice of the scene (~N/D records, fixed capacity with
   an overflow counter — the bounded-coverage idiom);
3. each device bins + sorts + composites ITS depth slice over the FULL tile
   grid, producing per-pixel partials (rgb, acc_alpha = 1 - T, depth);
4. one more `all_to_all` moves tile SLABS: device j receives the j-th slab of
   every device's partial, ordered by source = depth order, and folds them
   with the associative over-operator
       (rgb_a, T_a) (+) (rgb_b, T_b) = (rgb_a + T_a * rgb_b, T_a * T_b),
   which is exactly why the forward composites in log-transmittance
   (ops/rasterize.py docstring).

Per-device memory: O(N/D) records + O(tiles * pixels) partials. Communication
per device: ~13 floats x N/D (records) + 5 floats x image (slab exchange) —
vs all_gather's 13 x N. Both all_to_alls ride the ICI ring as ppermute chains
(XLA lowers all_to_all to ring exchanges on TPU meshes).

EXACTNESS. Depth bucketing keeps global front-to-back order, so with
`transmittance_min = 0` the result equals the single-device render to f32
rounding. With early termination on (default 1e-4), a bucket cannot see the
transmittance flowing IN from nearer buckets, so entries the single-device
pass zeroes (T <= tmin) survive scaled by T_in <= tmin: per-pixel deviation
is bounded by transmittance_min — quantified in tests/test_compositor.py.

The reference has no distributed story at all (SURVEY §2.9: single GPU,
`/root/reference/src/utils/rasterization_util.py:13-29`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussiansplattingregistration_tpu.ops.rasterize import (
    DEFAULT_CONFIG,
    RasterizeConfig,
    compute_view_colors,
    project_gaussians,
    rasterize_tile_slab,
)

_HIST_BINS = 256
_REC_COLS = 13  # means2d 2 | conic 3 | depth 1 | radius 1 | valid 1 | color 3 | op 1 | pad 1


def _depth_pivots(depth, valid, n_dev, axis, config):
    """Global depth-quantile pivots via a psum'd histogram. [n_dev - 1].

    Bucketing is a discrete routing decision: no gradient flows through it
    (pmax has no VJP), so inputs are stop_gradient'ed."""
    depth = jax.lax.stop_gradient(depth)
    zmax = jax.lax.pmax(jnp.max(jnp.where(valid, depth, config.near)), axis)
    zmin = config.near
    span = jnp.maximum(zmax - zmin, 1e-6)
    b = jnp.clip(
        ((depth - zmin) / span * _HIST_BINS).astype(jnp.int32), 0,
        _HIST_BINS - 1,
    )
    hist = jnp.zeros((_HIST_BINS,), jnp.int32).at[b].add(
        valid.astype(jnp.int32)
    )
    hist = jax.lax.psum(hist, axis)
    cum = jnp.cumsum(hist)
    total = jnp.maximum(cum[-1], 1)
    # pivot_j = upper edge of the first bin where cum >= j/D * total
    targets = (jnp.arange(1, n_dev) * total) // n_dev
    bins = jnp.searchsorted(cum, targets, side="left")
    return zmin + (bins.astype(jnp.float32) + 1.0) / _HIST_BINS * span


def _exchange_records(rec, bucket, n_dev, cap, axis):
    """all_to_all records into depth buckets.

    rec [n_local, F], bucket [n_local] in [0, n_dev) -> ([n_dev * cap, F]
    records now owned by this device's depth slice, dropped_count)."""
    n_local = rec.shape[0]
    order = jnp.argsort(bucket)              # stable: ties keep local order
    rec_s = rec[order]
    b_s = bucket[order]
    starts = jnp.searchsorted(b_s, jnp.arange(n_dev, dtype=bucket.dtype))
    ends = jnp.searchsorted(b_s, jnp.arange(n_dev, dtype=bucket.dtype),
                            side="right")
    counts = ends - starts
    rec_p = jnp.pad(rec_s, ((0, cap), (0, 0)))
    k = jnp.arange(cap)
    send = []
    for j in range(n_dev):   # n_dev is static and small
        blk = jax.lax.dynamic_slice_in_dim(rec_p, starts[j], cap, axis=0)
        live = (k < counts[j])[:, None]
        send.append(jnp.where(live, blk, 0.0))
    send = jnp.concatenate(send, axis=0)          # [n_dev * cap, F]
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv, dropped


def composite_body(
    means, cov3d, opacity, features,
    viewmat, intrinsics, background,
    width: int, height: int, sh_degree: int,
    tiles_x: int, tiles_y_padded: int, cap: int,
    config: RasterizeConfig, axis: str,
):
    n_dev = jax.lax.axis_size(axis)

    # 1. local projection -> compact records
    proj = project_gaussians(means, cov3d, viewmat, intrinsics, width,
                             height, config)
    cam_center = -(viewmat[:3, :3].T @ viewmat[:3, 3])
    colors = compute_view_colors(features, means, cam_center, sh_degree)
    valid = proj["valid"]
    op = opacity * valid.astype(opacity.dtype)
    rec = jnp.concatenate(
        [
            proj["means2d"], proj["conic"], proj["depth"][:, None],
            proj["radius"][:, None], valid.astype(jnp.float32)[:, None],
            colors, op[:, None],
            jnp.zeros((means.shape[0], 1), jnp.float32),
        ],
        axis=-1,
    )

    # 2. depth pivots + record exchange (device d <- depth slice d)
    pivots = _depth_pivots(proj["depth"], valid, n_dev, axis, config)
    bucket = jnp.searchsorted(pivots, proj["depth"], side="right").astype(
        jnp.int32
    )
    # Invalid (culled) records get bucket n_dev: they sort past every real
    # bucket run and are never sent — they'd otherwise crowd out real
    # records from the fixed per-bucket capacity.
    bucket = jnp.where(valid, bucket, n_dev)
    rec2, dropped = _exchange_records(rec, bucket, n_dev, cap, axis)

    # 3. composite my depth slice over the FULL tile grid
    m2d = rec2[:, 0:2]
    conic = rec2[:, 2:5]
    depth = rec2[:, 5]
    radius = rec2[:, 6]
    v2 = rec2[:, 7] > 0.5
    col2 = rec2[:, 8:11]
    op2 = rec2[:, 11]
    rgb_p, alpha_p, depth_p = rasterize_tile_slab(
        m2d, conic, depth, radius, v2, col2, op2,
        tiles_x, tiles_y_padded, config,
    )                                  # [H_pad, W_pad, .] partials, T = 1-alpha
    partial = jnp.concatenate(
        [rgb_p, alpha_p[..., None], depth_p[..., None]], axis=-1
    )                                               # [H_pad, W_pad, 5]

    # 4. slab exchange: device j gets slab j of every depth slice, sources
    # arrive in depth order -> associative front-to-back fold.
    slab_h = tiles_y_padded // n_dev * config.tile_size
    parts = jax.lax.all_to_all(
        partial.reshape(n_dev, slab_h, partial.shape[1], 5),
        axis, split_axis=0, concat_axis=0,
    )                                               # [n_dev, slab_h, W, 5]

    def over(carry, p):
        rgb, T, dep = carry
        rgb = rgb + T[..., None] * p[..., 0:3]
        dep = dep + T * p[..., 4]
        T = T * (1.0 - p[..., 3])
        return (rgb, T, dep), None

    init = (
        jnp.zeros((slab_h, partial.shape[1], 3)),
        jnp.ones((slab_h, partial.shape[1])),
        jnp.zeros((slab_h, partial.shape[1])),
    )
    (rgb, T, dep), _ = jax.lax.scan(over, init, parts)
    rgb = rgb + T[..., None] * background[None, None, :]
    return rgb, 1.0 - T, dep, jax.lax.psum(dropped, axis)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "config", "mesh",
                     "axis", "capacity_slack"),
)
def rasterize_arrays_depth_sharded(
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
    capacity_slack: float = 1.5,
):
    """Depth-sharded multi-device rasterization (module docstring).

    Returns (rgb [H,W,3], alpha [H,W], depth [H,W], dropped) — `dropped` is
    the total record count that overflowed the per-bucket all_to_all
    capacity (0 == the fixed capacity was exact for this scene/view).
    """
    ts = config.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)
    n_dev = mesh.shape[axis]
    tiles_y_padded = ((tiles_y + n_dev - 1) // n_dev) * n_dev
    n_local = means.shape[0] // n_dev
    cap = max(128, -(-int(n_local * capacity_slack) // n_dev // 128) * 128)

    in_specs = (
        P(axis), P(axis), P(axis), P(axis),
        P(), P(), P(),
    )
    out_specs = (P(axis), P(axis), P(axis), P())

    body = functools.partial(
        composite_body,
        width=width, height=height, sh_degree=sh_degree,
        tiles_x=tiles_x, tiles_y_padded=tiles_y_padded, cap=cap,
        config=config, axis=axis,
    )
    rgb, alpha, depth, dropped = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(means, cov3d, opacity, features, viewmat, intrinsics, background)
    return (
        rgb[:height, :width], alpha[:height, :width],
        depth[:height, :width], dropped,
    )


def rasterize_depth_sharded(
    cloud,
    camera,
    mesh: Mesh,
    background=(0.0, 0.0, 0.0),
    scaling_modifier: float = 1.0,
    config: RasterizeConfig = DEFAULT_CONFIG,
    capacity_slack: float = 1.5,
):
    """Render a GaussianCloud with the depth-sharded compositor."""
    n_dev = mesh.shape["splat"]
    n = cloud.num_points
    padded = cloud.pad_to(((n + n_dev - 1) // n_dev) * n_dev)
    shard = NamedSharding(mesh, P("splat"))
    means = jax.device_put(padded.xyz, shard)
    cov = jax.device_put(padded.get_covariance(scaling_modifier), shard)
    op = jax.device_put(padded.get_opacity[:, 0], shard)
    feats = jax.device_put(padded.get_features, shard)
    return rasterize_arrays_depth_sharded(
        means, cov, op, feats, camera.viewmat, camera.intrinsics,
        camera.width, camera.height, cloud.sh_degree,
        jnp.asarray(background, jnp.float32), config, mesh=mesh,
        capacity_slack=capacity_slack,
    )
