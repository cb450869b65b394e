"""Golden-fixture tests: production pipeline vs COMMITTED independent oracle.

The fixtures (tests/data/golden_raster.npz, golden_icp.npz) were generated
by `scripts/make_goldens.py` — a standalone f64 numpy oracle with ZERO
imports from this package (EWA + front-to-back compositing re-derived from
the 3DGS/gsplat spec, central-difference pixel gradients, Open3D-semantics
ICP). These tests pin the production JAX implementation against those
committed outputs: renders <1e-3, pixel gradients <1e-2 relative (the f32
forward bounds gradient precision), ICP poses/fitness/RMSE matching.

This is the BASELINE.md north-star check ("<1e-3 pixel-grad vs gsplat",
"pose convergence matching Open3D") realized with the only oracle available
in this image: gsplat and Open3D are not installed and there is no egress,
so the oracle is an independent implementation of the same published specs,
committed for review alongside its outputs.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.parameters import (
    LocalRegistrationParams, LocalRegistrationType,
)
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.ops.icp import icp
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig, rasterize_arrays,
)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="module")
def raster_golden():
    return np.load(os.path.join(DATA, "golden_raster.npz"))


@pytest.fixture(scope="module")
def icp_golden():
    return np.load(os.path.join(DATA, "golden_icp.npz"))


def _raster_inputs(g):
    return (
        jnp.asarray(g["means"], jnp.float32),
        jnp.asarray(g["cov6"], jnp.float32),
        jnp.asarray(g["opacity"], jnp.float32),
        jnp.asarray(g["features"], jnp.float32),
        jnp.asarray(g["viewmat"], jnp.float32),
        jnp.asarray(g["intrinsics"], jnp.float32),
        int(g["width"]), int(g["height"]),
        int(g["sh_degree"]),
        jnp.asarray(g["background"], jnp.float32),
    )


# Generous bounds so nothing truncates: the golden is the EXACT render.
CFG = RasterizeConfig(max_tiles_per_splat=16, max_splats_per_tile=64,
                      tile_chunk=4)


def test_render_matches_golden(raster_golden):
    (means, cov6, op, feats, viewmat, K, w, h, deg, bg) = _raster_inputs(
        raster_golden
    )
    rgb, acc, _ = rasterize_arrays(
        means, cov6, op, feats, viewmat, K, w, h, deg, bg, CFG
    )
    np.testing.assert_allclose(
        np.asarray(rgb), raster_golden["rgb"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(acc), raster_golden["acc"], atol=1e-3
    )


def test_pixel_gradients_match_golden(raster_golden):
    """jax.grad through the full rasterizer vs committed f64 central
    differences, every parameter tensor (means / cov / opacity / SH)."""
    g = raster_golden
    (means, cov6, op, feats, viewmat, K, w, h, deg, bg) = _raster_inputs(g)
    ct = jnp.asarray(g["ct"], jnp.float32)

    def loss(m, c, o, ft):
        rgb, _, _ = rasterize_arrays(m, c, o, ft, viewmat, K, w, h, deg,
                                     bg, CFG)
        return jnp.sum(rgb * ct)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        means, cov6, op, feats
    )
    np.testing.assert_allclose(float(val), float(g["loss"]), rtol=1e-4)
    for got, want in zip(
        grads, (g["grad_means"], g["grad_cov"], g["grad_opacity"],
                g["grad_features"]),
    ):
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want,
            rtol=5e-3, atol=5e-3 * scale,
        )


def _pose_close(T_got, T_want, atol):
    np.testing.assert_allclose(np.asarray(T_got), np.asarray(T_want),
                               atol=atol)


@pytest.mark.parametrize("variant", ["point_to_point", "point_to_plane"])
def test_icp_matches_golden(icp_golden, variant):
    g = icp_golden
    src = PointCloud(points=jnp.asarray(g["source"], jnp.float32))
    tgt = PointCloud(
        points=jnp.asarray(g["target"], jnp.float32),
        normals=jnp.asarray(g["target_normals"], jnp.float32),
    )
    rt = (LocalRegistrationType.ICP_POINT_TO_POINT
          if variant == "point_to_point"
          else LocalRegistrationType.ICP_POINT_TO_PLANE)
    params = LocalRegistrationParams(
        registration_type=rt,
        max_correspondence=float(g["max_correspondence"]),
        max_iteration=int(g["max_iteration"]),
        # the oracle runs a fixed iteration budget with no early exit
        relative_fitness=0.0, relative_rmse=0.0,
    )
    res = icp(src, tgt, params)
    key = "pp" if variant == "point_to_point" else "pl"
    T_want = g[f"T_{'point_to_point' if key == 'pp' else 'point_to_plane'}"]
    _pose_close(res.transformation, T_want, atol=5e-5)
    _pose_close(res.transformation, g["T_true"], atol=5e-5)
    np.testing.assert_allclose(res.fitness, g[f"fitness_{key}"], atol=1e-6)
    assert res.inlier_rmse < 1e-4  # oracle rmse is ~1e-15 (exact overlap)
