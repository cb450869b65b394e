"""Minimal TPU repro for the composite kernel compile failure."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig
from gaussiansplattingregistration_tpu.ops import raster_pallas

T, K, TS = 8, 128, 16
config = RasterizeConfig(max_splats_per_tile=K)

rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(T, K, 10)).astype(np.float32))
valid = jnp.asarray((rng.random((T, K)) < 0.5).astype(np.float32))
origin = jnp.asarray(rng.integers(0, 64, size=(T, 2)).astype(np.float32))

out = raster_pallas.composite_tiles_pallas(g, valid, origin, TS, config)
print("fwd ok", [o.shape for o in out])
jax.block_until_ready(out)


def loss(g, valid):
    rgb, a, d = raster_pallas.composite_tiles_pallas(g, valid, origin, TS, config)
    return jnp.sum(rgb) + jnp.sum(a) + jnp.sum(d)


grads = jax.grad(loss, argnums=(0,))(g, valid)
jax.block_until_ready(grads)
print("bwd ok", grads[0].shape)
