"""LPIPS perceptual metric, JAX-native (AlexNet backbone + linear heads).

The reference hard-depends on the torch `lpips` package with the AlexNet
backbone (`/root/reference/src/gui/workers/graphics/qt_evaluator.py:50`,
`requirements.txt`). This is the same computation expressed in JAX so the
metric runs on TPU inside jitted evaluation with no torch at all:

    d(x, y) = sum_l mean_hw || w_l * (norm(f_l(x)) - norm(f_l(y))) ||^2

with f_l the 5 AlexNet ReLU taps, norm() channel-unit-normalization, and
w_l >= 0 learned 1x1 heads — exactly `lpips.LPIPS(net='alex')`.

Weights resolve in priority order:

1. an explicit npz path (or the `GSR_LPIPS_WEIGHTS` env var) holding the
   trained AlexNet + head tensors (see `save_weights`/`weights_from_torch`
   for the layout; `weights_from_torch` converts the torch packages' weights
   when those are installed somewhere);
2. the torch `lpips`+`torchvision` packages, converted on the fly;
3. a DETERMINISTIC random-feature fallback (fixed-seed He-init convs,
   uniform heads). Random-feature LPIPS is a documented variant: Zhang et
   al. 2018 (the LPIPS paper, Table 5) report that an untrained AlexNet
   scores well above traditional metrics on their perceptual 2AFC data
   (~83% vs ~93% trained). Values are NOT comparable to published
   trained-LPIPS numbers; `LPIPSParams.source` says which weights are live
   and the evaluation log records it.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature stack (torchvision layout): (out_ch, in_ch, k, stride, pad),
# with 3x3/2 max-pools after stages 1 and 2.
_CONVS = (
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # max-pool follows conv indices 0 and 1

# lpips.ScalingLayer constants (input in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_RANDOM_SEED = 1834579


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LPIPSParams:
    """conv{i}_w [O,I,K,K], conv{i}_b [O], head{i} [C_i] (non-negative)."""

    tensors: Dict[str, jax.Array]
    source: str = dataclasses.field(metadata={"static": True}, default="random")


def _random_params() -> LPIPSParams:
    """Deterministic He-init backbone + uniform heads (weight source #3)."""
    rng = np.random.default_rng(_RANDOM_SEED)
    t: Dict[str, np.ndarray] = {}
    for i, (o, c, k, _, _) in enumerate(_CONVS):
        fan_in = c * k * k
        t[f"conv{i}_w"] = (
            rng.normal(0.0, np.sqrt(2.0 / fan_in), size=(o, c, k, k))
        ).astype(np.float32)
        t[f"conv{i}_b"] = np.zeros((o,), np.float32)
        t[f"head{i}"] = np.full((o,), 1.0 / o, np.float32)
    return LPIPSParams(
        tensors={k: jnp.asarray(v) for k, v in t.items()}, source="random"
    )


def save_weights(params: LPIPSParams, path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.tensors.items()})


def load_weights(path: str) -> LPIPSParams:
    with np.load(path) as z:
        tensors = {k: jnp.asarray(z[k]) for k in z.files}
    for i, (o, c, k, _, _) in enumerate(_CONVS):
        if tensors[f"conv{i}_w"].shape != (o, c, k, k):
            raise ValueError(f"conv{i}_w shape {tensors[f'conv{i}_w'].shape}")
    return LPIPSParams(tensors=tensors, source=f"npz:{os.path.basename(path)}")


def weights_from_torch() -> Optional[LPIPSParams]:
    """Convert torchvision AlexNet + lpips linear heads when importable
    (weight source #2; requires those packages and their weight caches)."""
    try:
        import lpips as lpips_pkg  # type: ignore

        net = lpips_pkg.LPIPS(net="alex")
        t: Dict[str, np.ndarray] = {}
        convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
                [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
                [m for m in net.net.slice5]
        convs = [m for m in convs if m.__class__.__name__ == "Conv2d"]
        for i, m in enumerate(convs):
            t[f"conv{i}_w"] = m.weight.detach().numpy()
            t[f"conv{i}_b"] = m.bias.detach().numpy()
        for i, lin in enumerate(net.lins):
            t[f"head{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)
        return LPIPSParams(
            tensors={k: jnp.asarray(v) for k, v in t.items()}, source="torch"
        )
    except Exception:
        return None


@functools.lru_cache(maxsize=1)
def default_params() -> LPIPSParams:
    """Resolve weights by the priority order in the module docstring."""
    path = os.environ.get("GSR_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_weights(path)
    p = weights_from_torch()
    if p is not None:
        return p
    return _random_params()


def _features(x: jax.Array, params: LPIPSParams):
    """x: [N, 3, H, W] in [-1, 1] -> list of 5 ReLU taps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE
    )[None, :, None, None]
    taps = []
    for i, (_, _, _, s, p) in enumerate(_CONVS):
        w = params.tensors[f"conv{i}_w"]
        b = params.tensors[f"conv{i}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
    return taps


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    return f / jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True) + eps)


@jax.jit
def lpips_pair(img1: jax.Array, img2: jax.Array, params: LPIPSParams) -> jax.Array:
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""

    def prep(x):
        x = jnp.transpose(x.astype(jnp.float32), (2, 0, 1))[None]
        return x * 2.0 - 1.0  # [-1, 1], the lpips input convention

    f1 = _features(prep(img1), params)
    f2 = _features(prep(img2), params)
    total = jnp.zeros(())
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = _unit_normalize(a) - _unit_normalize(b)
        head = params.tensors[f"head{i}"]
        # 1x1 conv with non-negative weights == channel-weighted sum of d^2.
        per_pix = jnp.einsum("nchw,c->nhw", d * d, jnp.maximum(head, 0.0))
        total = total + jnp.mean(per_pix)
    return total


def lpips(img1, img2, params: Optional[LPIPSParams] = None) -> jax.Array:
    """LPIPS(alex) distance, [H, W, 3] images in [0, 1]. Uses the default
    weight resolution (`default_params`) unless `params` is given."""
    if params is None:
        params = default_params()
    return lpips_pair(jnp.asarray(img1), jnp.asarray(img2), params)
