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
