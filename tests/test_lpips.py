"""JAX-native LPIPS tests.

The reference hard-requires the torch `lpips` package for evaluation
(`/root/reference/src/gui/workers/graphics/qt_evaluator.py:50`); ours must
work with no torch. Real trained weights are not fetchable in this
environment, so these tests validate the metric axioms and the architecture
(tap shapes match AlexNet), not published LPIPS values — the weight source is
recorded in every evaluation log.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.ops import lpips as lpips_ops
from gaussiansplattingregistration_tpu.ops import metrics as metrics_ops


@pytest.fixture(scope="module")
def params():
    return lpips_ops.default_params()


def _img(rng, h=64, w=64):
    return jnp.asarray(rng.uniform(0, 1, size=(h, w, 3)), jnp.float32)


def test_identical_images_zero(rng, params):
    x = _img(rng)
    assert float(lpips_ops.lpips(x, x, params)) < 1e-6


def test_symmetric_and_positive(rng, params):
    x, y = _img(rng), _img(rng)
    d_xy = float(lpips_ops.lpips(x, y, params))
    d_yx = float(lpips_ops.lpips(y, x, params))
    assert d_xy > 0
    assert abs(d_xy - d_yx) < 1e-6


def test_monotone_in_perturbation(rng, params):
    """Distance grows with perturbation magnitude (smoke perceptual axiom)."""
    x = _img(rng, 96, 96)
    noise = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    ds = [
        float(lpips_ops.lpips(x, jnp.clip(x + s * noise, 0, 1), params))
        for s in (0.05, 0.2, 0.5)
    ]
    assert ds[0] < ds[1] < ds[2]


def test_alexnet_tap_shapes(params):
    """The backbone must be the exact torchvision-AlexNet feature stack
    (64/192/384/256/256 channels; strides 4,2,1,2,1,1,1) so real converted
    weights drop in unchanged."""
    x = jnp.zeros((1, 3, 64, 64))
    taps = lpips_ops._features(x, params)
    chans = [t.shape[1] for t in taps]
    assert chans == [64, 192, 384, 256, 256]
    # torch Conv2d/MaxPool2d floor arithmetic: 64px -> 15, 7, 3, 3, 3
    spatial = [t.shape[2] for t in taps]
    assert spatial == [15, 7, 3, 3, 3]


def test_weight_roundtrip(tmp_path, params, rng):
    p = str(tmp_path / "w.npz")
    lpips_ops.save_weights(params, p)
    loaded = lpips_ops.load_weights(p)
    assert loaded.source.startswith("npz:")
    x, y = _img(rng), _img(rng)
    np.testing.assert_allclose(
        float(lpips_ops.lpips(x, y, params)),
        float(lpips_ops.lpips(x, y, loaded)), rtol=1e-6,
    )


def test_all_metrics_includes_lpips(rng):
    x, y = _img(rng), _img(rng)
    fn = metrics_ops.lpips_fn()
    assert fn is not None
    m = metrics_ops.all_metrics(x, y, fn)
    assert "lpips" in m and np.isfinite(m["lpips"])
    assert fn.source in ("random", "torch") or fn.source.startswith("npz:")
