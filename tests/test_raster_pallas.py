"""Pallas compositing kernel vs the XLA reference path (interpret mode on CPU).

Oracle: backend="pallas" must match backend="xla" bitwise-close in forward
AND gradients — the <1e-3 pixel-grad criterion from BASELINE.json applied
between our two implementations.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    rasterize,
    rasterize_arrays,
)
from tests.test_rasterize import make_camera, make_scene, WIDTH, HEIGHT


XLA_CFG = RasterizeConfig(max_tiles_per_splat=16, max_splats_per_tile=64,
                          tile_chunk=4, backend="xla")
PAL_CFG = dataclasses.replace(XLA_CFG, backend="pallas")


def test_pallas_forward_matches_xla(rng):
    cloud = make_scene(rng, n=50)
    cam = make_camera()
    bg = (0.1, 0.2, 0.3)
    rgb_x, alpha_x, depth_x = rasterize(cloud, cam, background=bg, config=XLA_CFG)
    rgb_p, alpha_p, depth_p = rasterize(cloud, cam, background=bg, config=PAL_CFG)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_x), atol=1e-4)


def test_pallas_gradients_match_xla(rng):
    cloud = make_scene(rng, n=20, scale=(0.1, 0.3))
    cam = make_camera(width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def make_loss(config):
        def loss(means, cov, op, feats):
            rgb, alpha, _ = rasterize_arrays(
                means, cov, op, feats, cam.viewmat, cam.intrinsics,
                32, 32, cloud.sh_degree, jnp.zeros(3), config,
            )
            return jnp.mean((rgb - target) ** 2) + 0.1 * jnp.mean(alpha)

        return loss

    args = (cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
            cloud.get_features)
    g_x = jax.grad(make_loss(XLA_CFG), argnums=(0, 1, 2, 3))(*args)
    g_p = jax.grad(make_loss(PAL_CFG), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_p, g_x, ("xyz", "cov", "op", "feat")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=1e-3 * scale, err_msg=name)


def test_pallas_empty_tiles(rng):
    """Tiles with zero entries must render pure background."""
    cloud = make_scene(rng, n=3)
    import jax.numpy as jnp2

    cloud = dataclasses.replace(cloud, xyz=cloud.xyz + jnp2.asarray([10.0, 10.0, 0.0]))
    bg = (0.5, 0.25, 0.125)
    rgb, alpha, _ = rasterize(cloud, make_camera(), background=bg, config=PAL_CFG)
    np.testing.assert_allclose(
        np.asarray(rgb), np.broadcast_to(bg, (HEIGHT, WIDTH, 3)), atol=1e-6
    )


def test_pallas_gradients_match_xla_beyond_cache_budget(rng):
    """max_splats_per_tile=512 puts the backward term cache past the VMEM
    budget (4 x 4 chunks x 8 x 256 x 128 f32 = 16.8 MB > 13 MB): _bwd_rule
    must select the recompute fallback (cache_terms=False) and produce the
    same gradients."""
    from gaussiansplattingregistration_tpu.ops import raster_pallas

    big = dataclasses.replace(PAL_CFG, max_splats_per_tile=512, tile_chunk=4)
    # The gate really selects the fallback at this K.
    n_chunks = 512 // raster_pallas._CHUNK
    cache = 4 * n_chunks * raster_pallas._BLOCK * 256 * raster_pallas._CHUNK * 4
    assert cache > raster_pallas._TERM_CACHE_BUDGET

    cloud = make_scene(rng, n=20, scale=(0.1, 0.3))
    cam = make_camera(width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def make_loss(config):
        def loss(means, cov, op, feats):
            rgb, alpha, _ = rasterize_arrays(
                means, cov, op, feats, cam.viewmat, cam.intrinsics,
                32, 32, cloud.sh_degree, jnp.zeros(3), config,
            )
            return jnp.mean((rgb - target) ** 2) + 0.1 * jnp.mean(alpha)
        return loss

    args = (cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
            cloud.get_features)
    xla_big = dataclasses.replace(big, backend="xla")
    g_x = jax.grad(make_loss(xla_big), argnums=(0, 1, 2, 3))(*args)
    g_p = jax.grad(make_loss(big), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_p, g_x, ("xyz", "cov", "op", "feat")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=1e-3 * scale, err_msg=name)
