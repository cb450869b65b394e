"""HEM downsampler tests.

Oracles (SURVEY.md §4): component counts shrink ~1/hem_reduction per level,
total mixture weight is conserved (responsibilities sum to 1 per child;
orphans pass through), covariances stay PSD, and the downsampled cloud stays
inside the original's spatial extent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.parameters import GaussianMixtureParams
from gaussiansplattingregistration_tpu.ops import hem
from gaussiansplattingregistration_tpu.ops import math3d
from tests.conftest import make_random_cloud


def make_dense_cloud(rng, n=600):
    """Dense relative to splat scale (query radius must reach neighbors)."""
    import dataclasses

    cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.06, 0.12))
    xyz = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    cloud = dataclasses.replace(cloud, xyz=jnp.asarray(xyz))
    return dataclasses.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(
            cloud.get_scaling, cloud.get_rotation
        ),
    )


def test_hem_level_counts(rng):
    cloud = make_dense_cloud(rng)
    params = GaussianMixtureParams(cluster_level=3, hem_reduction=3.0)
    levels = hem.create_mixture(cloud, params, seed=0)
    assert len(levels) == 3
    counts = [len(cloud)] + [lvl.xyz.shape[0] for lvl in levels]
    for a, b in zip(counts[:-1], counts[1:]):
        assert b < a, counts  # strictly shrinking
    # Roughly geometric decay with ratio 1/3 (loose bounds: stochastic parents).
    assert counts[1] < 0.75 * counts[0]
    assert counts[-1] < 0.4 * counts[0]


def test_hem_weight_conservation(rng):
    cloud = make_dense_cloud(rng, n=300)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    state = hem.init_mixture(
        k1, cloud.xyz, cloud.get_colors, cloud.get_opacity[:, 0],
        cloud.get_covariance(), cloud.features_rest.reshape(len(cloud), -1), 3.0,
    )
    new = hem.hem_cluster_level(k2, state, 3.0, 3.0, 2.5, 1.0)
    total_in = float(jnp.sum(state.weight * state.alive))
    total_out = float(jnp.sum(new.weight * new.alive))
    # Conservation up to culled components (rare on clean data).
    assert abs(total_in - total_out) / total_in < 0.02, (total_in, total_out)


def test_hem_covariances_psd(rng):
    cloud = make_dense_cloud(rng)
    levels = hem.create_mixture(cloud, GaussianMixtureParams(cluster_level=2), seed=1)
    for lvl in levels:
        full = np.asarray(math3d.unpack_symmetric(jnp.asarray(lvl.covariance)))
        eig = np.linalg.eigvalsh(full)
        assert np.all(eig[:, 0] > -1e-8), eig.min()
        assert np.all(np.isfinite(lvl.xyz))
        assert np.all(np.isfinite(lvl.features))


def test_hem_stays_in_extent(rng):
    cloud = make_dense_cloud(rng)
    levels = hem.create_mixture(cloud, GaussianMixtureParams(cluster_level=2), seed=2)
    lo = np.asarray(cloud.xyz).min(0) - 1e-4
    hi = np.asarray(cloud.xyz).max(0) + 1e-4
    for lvl in levels:
        assert np.all(lvl.xyz >= lo) and np.all(lvl.xyz <= hi)


def test_mixture_to_cloud_roundtrip(rng):
    cloud = make_dense_cloud(rng, n=200)
    levels = hem.create_mixture(cloud, GaussianMixtureParams(cluster_level=1), seed=3)
    clouds = hem.mixture_levels_to_clouds(levels, cloud.sh_degree)
    assert len(clouds) == 1
    down = clouds[0]
    assert down.sh_degree == cloud.sh_degree
    assert down.num_points == levels[0].xyz.shape[0]
    # Covariance cache must reproduce the mixture covariance.
    np.testing.assert_allclose(
        np.asarray(down.get_covariance()), levels[0].covariance, rtol=1e-3, atol=1e-6
    )
    # Opacity round-trip through logits.
    np.testing.assert_allclose(
        np.asarray(down.get_opacity[:, 0]), levels[0].opacities, rtol=1e-4, atol=1e-5
    )


def test_hem_deterministic_with_seed(rng):
    cloud = make_dense_cloud(rng, n=200)
    l1 = hem.create_mixture(cloud, GaussianMixtureParams(cluster_level=2), seed=7)
    l2 = hem.create_mixture(cloud, GaussianMixtureParams(cluster_level=2), seed=7)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a.xyz, b.xyz)


def test_hem_grid_neighbor_search_matches_global(rng):
    """The 27-cell grid candidate path must reproduce the global fixed-K
    path closely on a uniform scene (the grid keeps >= as many in-radius
    children, so small deviations toward the exact radius-search semantics
    are allowed; wholesale divergence is not)."""
    import dataclasses as dc

    import gaussiansplattingregistration_tpu.ops.knn as knn_ops
    from gaussiansplattingregistration_tpu.models.parameters import (
        GaussianMixtureParams,
    )

    n = 12_000
    cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.02, 0.05))
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    cloud = dc.replace(cloud, xyz=jnp.asarray(xyz))
    cloud = dc.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(
            cloud.get_scaling, cloud.get_rotation
        ),
    )
    params = GaussianMixtureParams(cluster_level=2)

    calls = []
    orig = knn_ops.grid_topk

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    knn_ops.grid_topk = spy
    try:
        lv_grid = hem.create_mixture(cloud, params, seed=0,
                                     neighbor_search="grid")
    finally:
        knn_ops.grid_topk = orig
    assert calls, "grid path did not engage (plan declined?)"
    lv_glob = hem.create_mixture(cloud, params, seed=0,
                                 neighbor_search="global")
    for g, b in zip(lv_grid, lv_glob):
        sg, sb = g.xyz.shape[0], b.xyz.shape[0]
        assert abs(sg - sb) <= max(0.02 * sb, 5), (sg, sb)
        np.testing.assert_allclose(
            np.mean(np.asarray(g.xyz), axis=0),
            np.mean(np.asarray(b.xyz), axis=0),
            rtol=0, atol=0.05,
        )
