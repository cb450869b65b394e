"""Image quality metrics: MSE, RMSE, PSNR, windowed SSIM (+optional LPIPS).

Counterpart of `/root/reference/src/utils/evaluation_utils.py:19-59`: SSIM
uses the same 11x11 Gaussian window (sigma 1.5) applied per channel with
same-padding depthwise convolution; PSNR is 20 log10(1/sqrt(mse)).

All metrics are jnp and jittable; LPIPS is an optional host-side extra (the
reference uses the `lpips` torch package, which may not be installed — it is
gated exactly like the reference gates GPU use).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


def mse(img1: jax.Array, img2: jax.Array) -> jax.Array:
    return jnp.mean((img1 - img2) ** 2)


def rmse(img1: jax.Array, img2: jax.Array) -> jax.Array:
    return jnp.sqrt(mse(img1, img2))


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse(img1, img2), 1e-12)))


def _gaussian_window(window_size: int, sigma: float) -> jax.Array:
    xs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(xs**2) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]  # [W, W]


def _depthwise_conv(img: jax.Array, window: jax.Array) -> jax.Array:
    """[C, H, W] image, same-padded depthwise conv with a [K, K] window."""
    c = img.shape[0]
    kernel = jnp.broadcast_to(window, (c, 1) + window.shape)  # [C, 1, K, K]
    return jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )[0]


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
) -> jax.Array:
    """Windowed SSIM; images are [H, W, C] (or [C, H, W] matching shapes).

    Matches `_ssim` (`evaluation_utils.py:30-50`): C1 = 0.01^2, C2 = 0.03^2.
    """
    if img1.ndim == 3 and img1.shape[-1] in (1, 3):
        img1 = jnp.transpose(img1, (2, 0, 1))
        img2 = jnp.transpose(img2, (2, 0, 1))
    window = _gaussian_window(window_size, 1.5)

    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map, axis=(1, 2))


def lpips_fn() -> Optional[object]:
    """Return the JAX-native LPIPS callable (AlexNet architecture; see
    ops/lpips.py for the weight-resolution order). Always available — the
    reference hard-requires the torch `lpips` package
    (`/root/reference/src/gui/workers/graphics/qt_evaluator.py:50`); here
    the metric runs on-device with no torch."""
    from gaussiansplattingregistration_tpu.ops import lpips as lpips_ops

    params = lpips_ops.default_params()

    def run(img1, img2):
        return float(lpips_ops.lpips(img1, img2, params))

    run.source = params.source  # type: ignore[attr-defined]
    return run


def all_metrics(img1: jax.Array, img2: jax.Array, lpips_callable=None) -> dict:
    """The evaluator's metric dict (MSE/RMSE/SSIM/PSNR [+LPIPS]), matching
    the names logged by `qt_evaluator.py:89-103`."""
    m = float(mse(img1, img2))
    out = {
        "mse": m,
        "rmse": math.sqrt(m),
        "ssim": float(ssim(img1, img2)),
        "psnr": float(psnr(img1, img2)),
    }
    if lpips_callable is not None:
        out["lpips"] = float(lpips_callable(img1, img2))
    return out
