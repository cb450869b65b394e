"""Native C++ HEM vs JAX HEM equivalence.

The native implementation (native/hem.cpp) does exact unbounded radius search;
the JAX path uses fixed-K candidates. On scenes with < K neighbors in radius
they compute the same mixture, so each is an independent oracle for the other
(same parent flags injected).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.parameters import GaussianMixtureParams
from gaussiansplattingregistration_tpu.ops import hem, math3d
from gaussiansplattingregistration_tpu.utils import native
from tests.test_hem import make_dense_cloud


needs_native = pytest.mark.skipif(
    native.load_library() is None,
    reason=f"native lib unavailable: {native.build_error()}",
)


@needs_native
def test_native_single_level_matches_jax(rng):
    cloud = make_dense_cloud(rng, n=300)
    n = len(cloud)
    rng2 = np.random.default_rng(7)
    flags = (rng2.random(n) < (1.0 / 3.0)).astype(np.uint8)

    mean = np.asarray(cloud.xyz, np.float32)
    color = np.asarray(cloud.get_colors, np.float32)
    cov6 = np.asarray(cloud.get_covariance(), np.float32)
    opacity = np.asarray(cloud.get_opacity[:, 0], np.float32)
    weight = np.ones(n, np.float32)
    features = np.asarray(cloud.features_rest.reshape(n, -1), np.float32)
    nvar = hem._initial_nvar(cov6)

    out = native.hem_cluster_level_native(
        mean, color, cov6, opacity, weight, features, nvar, flags,
        3.0, 2.5, 1.0,
    )
    assert out is not None
    n_mean, n_color, n_cov, n_op, n_w, n_feat, n_nvar = out

    # JAX path with the same parent flags, K large enough to be exact.
    state = hem.MixtureState(
        mean=jnp.asarray(mean), color=jnp.asarray(color), cov=jnp.asarray(cov6),
        opacity=jnp.asarray(opacity), weight=jnp.asarray(weight),
        features=jnp.asarray(features), nvar=jnp.asarray(nvar),
        is_parent=jnp.asarray(flags.astype(bool)),
        alive=jnp.ones(n, bool),
    )
    new = hem.hem_cluster_level(
        jax.random.PRNGKey(0), state, 3.0, 3.0, 2.5, 1.0, max_children=256
    )
    alive = np.asarray(new.alive)
    j_mean = np.asarray(new.mean)[alive]
    j_w = np.asarray(new.weight)[alive]

    assert n_mean.shape[0] == j_mean.shape[0], (n_mean.shape, j_mean.shape)
    # Compare as sets (orders differ): lexicographic sort of rounded rows.
    def order(a):
        key = np.round(np.asarray(a, np.float64), 4)
        return np.lexsort((key[:, 2], key[:, 1], key[:, 0]))

    ni, ji = order(n_mean), order(j_mean)
    np.testing.assert_allclose(n_mean[ni], j_mean[ji], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(n_w[ni], j_w[ji], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(n_cov)[ni], np.asarray(new.cov)[alive][ji], rtol=5e-3, atol=1e-5
    )


@needs_native
def test_native_create_mixture(rng):
    cloud = make_dense_cloud(rng, n=400)
    params = GaussianMixtureParams(cluster_level=2)
    levels = hem.create_mixture(cloud, params, seed=0, backend="native")
    assert len(levels) == 2
    assert levels[0].xyz.shape[0] < 400
    assert levels[1].xyz.shape[0] < levels[0].xyz.shape[0]
    # PSD + finite like the JAX path guarantees.
    full = np.asarray(math3d.unpack_symmetric(jnp.asarray(levels[-1].covariance)))
    assert np.all(np.linalg.eigvalsh(full)[:, 0] > -1e-7)
    # Convertible back to a cloud.
    clouds = hem.mixture_levels_to_clouds(levels, cloud.sh_degree)
    assert clouds[0].num_points == levels[0].xyz.shape[0]


# ---------------------------------------------------------------------------
# Chip-scale behavior: the bench-class scene at 50k points. Round 3's bench
# failure showed that small-scene tests don't predict the clustering rate at
# scale; these pin (a) the >=2x/level reduction the bench gates on and (b) a
# measured bound on the fixed-K truncation vs the exact-radius native oracle
# at a scale where most parents ARE saturated (K-th neighbor still in radius).


@pytest.fixture(scope="module")
def scale_scene_results():
    """JAX HEM (3 levels, with stats) + native HEM on a 50k bench-class scene."""
    n = 50_000
    rng = np.random.default_rng(3)
    from tests.conftest import make_random_cloud

    # Same relative density as bench.py's 200k scene: scales grow by
    # (200/50)^(1/3) with the inter-point spacing.
    cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.064, 0.159))
    params = GaussianMixtureParams(cluster_level=3)
    levels, stats = hem.create_mixture(
        cloud, params, seed=0, backend="jax", with_stats=True
    )
    native_levels = (
        hem.create_mixture(cloud, params, seed=0, backend="native")
        if native.load_library() is not None
        else None
    )
    return n, levels, stats, native_levels


def test_hem_reduction_at_scale(scale_scene_results):
    """Each level reduces >=2x (the bench gate is >=1.8x) on >=50k points."""
    n, levels, stats, _ = scale_scene_results
    sizes = [lvl.xyz.shape[0] for lvl in levels]
    prev = n
    for sz in sizes:
        assert sz <= prev / 2.0, f"clustering stalled: sizes {sizes}"
        prev = sz
    # The scene genuinely saturates the fixed-K neighborhoods — i.e. this
    # test exercises the truncated regime, unlike the small-scene tests.
    assert stats[0]["saturated_parents"] > 0.5 * stats[0]["parents"]


@needs_native
def test_fixed_k_truncation_bound_at_scale(scale_scene_results):
    """Fixed-K (K=32) level sizes stay within 5% of the exact-radius native
    oracle even with >90% of parents saturated; population statistics agree."""
    _, levels, _, native_levels = scale_scene_results
    assert native_levels is not None
    for i, (j, nat) in enumerate(zip(levels, native_levels)):
        js, ns = j.xyz.shape[0], nat.xyz.shape[0]
        assert abs(js - ns) <= 0.05 * ns, f"level {i}: jax {js} vs native {ns}"
        # Population centroid and mean opacity must agree closely:
        # truncation redistributes responsibilities locally, it must not
        # shift the mixture globally. Tolerance = ~3 standard errors of the
        # centroid of the coarsest level (~2.4k components of a unit-std
        # scene: SE ~ 1/sqrt(2400) ~ 0.02).
        np.testing.assert_allclose(
            np.mean(np.asarray(j.xyz), axis=0),
            np.mean(np.asarray(nat.xyz), axis=0),
            rtol=0, atol=0.06,
        )
        np.testing.assert_allclose(
            np.mean(np.asarray(j.opacities)),
            np.mean(np.asarray(nat.opacities)),
            rtol=0.05,
        )
