"""TPU-side correctness check: pallas backend vs xla backend vs CPU result.

The unit tests compare the two backends in interpret mode on CPU; this
script validates the COMPILED kernels on the real chip (fwd + grads).
"""
import dataclasses
import math
import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig, rasterize_arrays,
)

W, H = 128, 96
N = 5000
rng = np.random.default_rng(1)
xyz = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
scales = rng.uniform(0.01, 0.05, size=(N, 3)).astype(np.float32)
quats = rng.normal(size=(N, 4)).astype(np.float32)
cov = np.asarray(math3d.covariance_from_scaling_rotation(
    jnp.asarray(scales), jnp.asarray(quats)))
opacity = (1 / (1 + np.exp(-rng.normal(size=N)))).astype(np.float32)
features = (rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32)
f = W / (2 * math.tan(math.radians(60) / 2))
cam = Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, W, H)
bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

cfg_x = RasterizeConfig(max_tiles_per_splat=9, max_splats_per_tile=256,
                        tile_chunk=8, backend="xla")
cfg_p = dataclasses.replace(cfg_x, backend="pallas")

args = (jnp.asarray(xyz), jnp.asarray(cov), jnp.asarray(opacity),
        jnp.asarray(features))

def run(cfg):
    def loss(means, cov3d, op, feats):
        rgb, a, d = rasterize_arrays(means, cov3d, op, feats, cam.viewmat,
                                     cam.intrinsics, W, H, 0, bg, cfg)
        return jnp.sum(rgb * rgb) + jnp.sum(a) + 0.1 * jnp.sum(d * a)
    def render(means, cov3d, op, feats):
        return rasterize_arrays(means, cov3d, op, feats, cam.viewmat,
                                cam.intrinsics, W, H, 0, bg, cfg)
    out = jax.jit(render)(*args)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(*args)
    return [np.asarray(o) for o in out], [np.asarray(x) for x in g]

out_x, g_x = run(cfg_x)
out_p, g_p = run(cfg_p)
names = ["rgb", "alpha", "depth"]
for a, b, n in zip(out_p, out_x, names):
    scale = max(np.abs(b).max(), 1.0)
    err = np.abs(a - b).max() / scale
    print(f"fwd {n:6s} rel max|diff| = {err:.3e}")
    assert err < 2e-4, n
for a, b, n in zip(g_p, g_x, ["d_means", "d_cov", "d_op", "d_feat"]):
    scale = np.abs(b).max() + 1e-12
    err = np.abs(a - b).max() / scale
    print(f"grad {n:8s} rel max|diff| = {err:.3e}")
    assert err < 2e-3, n
print("TPU pallas == xla: OK")
