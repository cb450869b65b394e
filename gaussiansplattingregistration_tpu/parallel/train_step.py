"""Sharded photometric pose-registration training step.

The full multi-chip training configuration (SURVEY.md §2.9 / §5.7):

* `data` mesh axis  — cameras (targets + view matrices) are sharded: pure
  data parallelism over the photometric batch;
* `splat` mesh axis — the N-gaussians axis: projection and SH coloring run on
  local shards, compact screen-space records are all_gathered over ICI, each
  device composites its horizontal tile slab, and the per-slab squared errors
  reduce with one `psum` over both axes;
* the pose twist xi (and the Adam state) is replicated; its gradient comes
  back through the shard_map (XLA inserts the reduce-scatter mirror of the
  all_gather) and is implicitly all-reduced by the loss psum.

`make_photometric_train_step` returns a jitted `step(xi, opt_state, splats,
cameras, targets) -> (xi, opt_state, loss, dropped)` ready for a real pod
slice; the driver's `dryrun_multichip` runs one step of exactly this on a
virtual mesh — both compositing modes. The `compositor="depth_sharded"`
variant replaces the all_gather slab (O(N_total) per device) with the
SURVEY §5.7 depth-sharded compositor (O(N/D + tiles) per device).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussiansplattingregistration_tpu.ops import math3d, se3
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    compute_view_colors,
    project_gaussians,
    rasterize_tile_slab,
)


def make_photometric_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    sh_degree: int,
    config: RasterizeConfig,
    learning_rate: float = 5e-3,
    compositor: str = "all_gather",
    capacity_slack: float = 1.5,
):
    """Build the jitted sharded train step. Shapes are static:

    splats: dict(means [N,3], cov [N,6], opacity [N], features [N,K,3]) with
    N divisible by the splat-axis size; cameras: (viewmats [C,4,4],
    intrinsics [C,3,3]) and targets [C,H,W,3] with C divisible by the
    data-axis size. Targets enter sharded over `data` and height-padded to
    the tile grid.

    compositor:
      * "all_gather"    — every device receives every screen record and
        composites its tile slab: O(N_total) per-device memory, one gather;
      * "depth_sharded" — the SURVEY §5.7 scalable path
        (`parallel/compositor.py`): records are all_to_all'ed into depth
        buckets, each device composites its ~N/D-record depth slice over the
        full grid, then tile slabs fold front-to-back. O(N/D + tiles)
        per-device memory. Per-bucket capacity is `capacity_slack * N/D`;
        overflowing records are DROPPED and counted in the step's `dropped`
        output — a nonzero count means the render (and its gradients)
        silently truncated and capacity_slack should be raised.

    Returns (step, init, pad_targets); `step(...) -> (xi, opt_state, loss,
    dropped)` where dropped == 0 always for "all_gather".
    """
    import optax

    if compositor not in ("all_gather", "depth_sharded"):
        raise ValueError(f"unknown compositor {compositor!r}")
    ts = config.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)
    n_splat = mesh.shape["splat"]
    tiles_y_padded = ((tiles_y + n_splat - 1) // n_splat) * n_splat
    padded_h = tiles_y_padded * ts
    optimizer = optax.adam(learning_rate)

    def body(xi, means, cov, op, feats, viewmats, intrinsics, targets):
        """Per-device body. means/cov/op/feats: local splat shard;
        viewmats/intrinsics/targets: local camera shard (targets pre-padded
        to [Cl, padded_h, tiles_x*ts, 3])."""
        my_slab = jax.lax.axis_index("splat")
        tiles_per_dev = tiles_y_padded // n_splat
        ty_offset = my_slab * tiles_per_dev

        T = se3.se3_exp(xi)
        R = T[:3, :3]
        means_t = means @ R.T + T[:3, 3]
        cov_t = math3d.transform_covariance(cov, R)

        # Depth-sharded per-bucket capacity, from the static local shard size.
        n_local = means.shape[0]
        cap = max(128, -(-int(n_local * capacity_slack) // n_splat // 128) * 128)

        def slab_error(rgb, target):
            # My slab of this camera's target; mask padding rows/cols.
            tgt_slab = jax.lax.dynamic_slice_in_dim(
                target, ty_offset * ts, tiles_per_dev * ts, axis=0
            )
            row = jnp.arange(tiles_per_dev * ts) + ty_offset * ts
            col = jnp.arange(tiles_x * ts)
            mask = (
                (row[:, None] < height) & (col[None, :] < width)
            ).astype(rgb.dtype)[..., None]
            return jnp.sum(((jnp.clip(rgb, 0.0, 1.0) - tgt_slab) ** 2) * mask)

        def per_camera_all_gather(args):
            viewmat, intrinsic, target = args
            proj = project_gaussians(
                means_t, cov_t, viewmat, intrinsic, width, height, config
            )
            cam_center = -(viewmat[:3, :3].T @ viewmat[:3, 3])
            colors = compute_view_colors(feats, means_t, cam_center, sh_degree)
            opv = op * proj["valid"].astype(op.dtype)

            gather = lambda x: jax.lax.all_gather(x, "splat", tiled=True)
            rgb, alpha, _ = rasterize_tile_slab(
                gather(proj["means2d"]), gather(proj["conic"]),
                gather(proj["depth"]), gather(proj["radius"]),
                gather(proj["valid"]), gather(colors), gather(opv),
                tiles_x, tiles_y_padded, config,
                ty_offset=ty_offset, tiles_y_window=tiles_per_dev,
            )
            return slab_error(rgb, target), jnp.zeros((), jnp.int32)

        def per_camera_depth_sharded(args):
            from gaussiansplattingregistration_tpu.parallel.compositor import (
                composite_body,
            )

            viewmat, intrinsic, target = args
            # composite_body routes records into depth buckets (all_to_all),
            # composites this device's depth slice over the full grid, and
            # slab-exchanges so this device ends with ITS final tile slab —
            # the same slab layout as the all_gather path.
            rgb, _alpha, _dep, dropped = composite_body(
                means_t, cov_t, op, feats, viewmat, intrinsic,
                jnp.zeros(3, means.dtype),
                width=width, height=height, sh_degree=sh_degree,
                tiles_x=tiles_x, tiles_y_padded=tiles_y_padded, cap=cap,
                config=config, axis="splat",
            )
            return slab_error(rgb, target), dropped.astype(jnp.int32)

        per_camera = (
            per_camera_depth_sharded
            if compositor == "depth_sharded"
            else per_camera_all_gather
        )
        errs, dropped = jax.lax.map(per_camera, (viewmats, intrinsics, targets))
        total = jax.lax.psum(jnp.sum(errs), ("data", "splat"))
        # per-camera dropped is already splat-psum'd inside composite_body
        # (replicated over the splat axis) — reduce over cameras + data only.
        dropped_total = jax.lax.psum(jnp.sum(dropped), "data")
        n_cams_total = viewmats.shape[0] * mesh.shape["data"]
        return total / (n_cams_total * height * width * 3.0), dropped_total

    in_specs = (
        P(),                                  # xi
        P("splat"), P("splat"), P("splat"), P("splat"),
        P("data"), P("data"), P("data"),
    )
    sharded_loss = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )

    def loss_fn(xi, splats, viewmats, intrinsics, targets):
        loss, dropped = sharded_loss(
            xi, splats["means"], splats["cov"], splats["opacity"],
            splats["features"], viewmats, intrinsics, targets,
        )
        return loss, dropped

    @jax.jit
    def step(xi, opt_state, splats, viewmats, intrinsics, targets):
        (loss, dropped), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            xi, splats, viewmats, intrinsics, targets
        )
        updates, opt_state = optimizer.update(grad, opt_state, xi)
        xi = optax.apply_updates(xi, updates)
        return xi, opt_state, loss, dropped

    def init(xi0=None):
        xi = jnp.zeros(6, jnp.float32) if xi0 is None else jnp.asarray(xi0)
        return xi, optimizer.init(xi)

    def pad_targets(targets):
        """[C, H, W, 3] -> [C, padded_h, tiles_x*ts, 3]."""
        return jnp.pad(
            targets,
            ((0, 0), (0, padded_h - targets.shape[1]),
             (0, tiles_x * ts - targets.shape[2]), (0, 0)),
        )

    return step, init, pad_targets


def shard_splats(cloud, mesh: Mesh, scaling_modifier: float = 1.0) -> dict:
    """GaussianCloud -> splat-sharded raw arrays dict for the train step."""
    n_dev = mesh.shape["splat"]
    n = cloud.num_points
    padded = cloud.pad_to(((n + n_dev - 1) // n_dev) * n_dev)
    shard = NamedSharding(mesh, P("splat"))
    return {
        "means": jax.device_put(padded.xyz, shard),
        "cov": jax.device_put(padded.get_covariance(scaling_modifier), shard),
        "opacity": jax.device_put(padded.get_opacity[:, 0], shard),
        "features": jax.device_put(padded.get_features, shard),
    }
