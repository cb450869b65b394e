"""On-chip Pallas rasterizer tests: Mosaic lowering + numerics vs XLA.

These compile and EXECUTE the Pallas kernels on the real TPU — the class of
bug the CPU-interpret suite cannot see (e.g. round-1's `ValueError: Can only
load scalars from SMEM` at the old raster_pallas table kernel). Oracles are
the XLA backend of the same pipeline, which is itself validated against a
brute-force oracle and finite differences in `tests/test_rasterize.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    rasterize_arrays,
)

WIDTH, HEIGHT = 256, 256


def _scene(rng, n, scale_range=(0.01, 0.05)):
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = rng.uniform(*scale_range, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    cov = math3d.covariance_from_scaling_rotation(
        jnp.asarray(scales), jnp.asarray(quats)
    )
    op = jnp.asarray(
        (1 / (1 + np.exp(-rng.normal(0, 1, n)))).astype(np.float32)
    )
    feat = jnp.asarray((rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32))
    viewmat = jnp.eye(4).at[2, 3].set(3.0)
    intr = jnp.array(
        [[500.0, 0, WIDTH / 2], [0, 500.0, HEIGHT / 2], [0, 0, 1]],
        jnp.float32,
    )
    return jnp.asarray(xyz), cov, op, feat, viewmat, intr


def _fwd_bwd(args, viewmat, intr, config):
    bg = jnp.zeros(3, jnp.float32)

    def loss(m, c, o, f):
        rgb, a, d = rasterize_arrays(
            m, c, o, f, viewmat, intr, WIDTH, HEIGHT, 0, bg, config
        )
        return jnp.sum(rgb) + jnp.sum(a) + 0.1 * jnp.sum(d)

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
    jax.block_until_ready(g)
    return v, g


def test_pallas_matches_xla_fwd_bwd_on_chip(rng):
    m, c, o, f, viewmat, intr = _scene(rng, 5000)
    v_x, g_x = _fwd_bwd((m, c, o, f), viewmat, intr,
                        RasterizeConfig(backend="xla"))
    v_p, g_p = _fwd_bwd((m, c, o, f), viewmat, intr,
                        RasterizeConfig(backend="pallas"))
    assert np.isfinite(float(v_p))
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-3)
    for a, b in zip(g_x, g_p):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        diff = float(jnp.max(jnp.abs(a - b)))
        assert diff / scale < 5e-3, (diff, scale)


def test_pallas_small_scene_regression(rng):
    # ADVICE r1 high: n * max_tiles_per_splat <= max_splats_per_tile made the
    # old slice-DMA table kernel read other tiles' entries. Keep this config
    # (n*C = 80 <= K = 512) as a permanent regression case.
    m, c, o, f, viewmat, intr = _scene(rng, 20, scale_range=(0.05, 0.15))
    cfg = dict(max_tiles_per_splat=4, max_splats_per_tile=512)
    r_p, _, _ = rasterize_arrays(
        m, c, o, f, viewmat, intr, WIDTH, HEIGHT, 0, jnp.zeros(3),
        RasterizeConfig(backend="pallas", **cfg),
    )
    r_x, _, _ = rasterize_arrays(
        m, c, o, f, viewmat, intr, WIDTH, HEIGHT, 0, jnp.zeros(3),
        RasterizeConfig(backend="xla", **cfg),
    )
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), atol=1e-5)


def test_bench_config_compiles_and_runs(rng):
    # The exact RasterizeConfig bench.py uses (bf16 cotangent transport,
    # K=384, occupancy-row cap) at reduced N: a lowering or VMEM failure
    # here is a failure of the driver benchmark contract.
    m, c, o, f, viewmat, intr = _scene(rng, 100_000, scale_range=(0.002, 0.006))
    config = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=384, tile_chunk=32,
        backend="pallas", bwd_sort_bf16=True, max_live_tiles=256,
    )
    v, g = _fwd_bwd((m, c, o, f), viewmat, intr, config)
    assert np.isfinite(float(v))
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)


def test_sliced_live_cap_gradients_on_chip(rng):
    """max_live_tiles that GENUINELY slices (live tiles at high image ids),
    compiled Mosaic path: gradients must match the uncapped transport —
    regression for the r5 live_s bound fix, on the real chip."""
    import dataclasses

    m, c, o, f, viewmat, intr = _scene(rng, 3000, scale_range=(0.01, 0.04))
    # Push the cloud toward the bottom-right: live tiles get HIGH image ids
    # while low-id tiles stay empty — worst case for the cap bound.
    m = m * 0.35 + jnp.asarray([0.55, 0.45, 0.0], jnp.float32)
    base = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=128, tile_chunk=32,
        backend="pallas", bwd_sort_bf16=False,
    )
    capped = dataclasses.replace(base, max_live_tiles=128)  # < 256 tiles
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        rasterize_arrays_with_stats,
    )
    _, _, _, s = rasterize_arrays_with_stats(
        m, c, o, f, viewmat, intr, WIDTH, HEIGHT, 0, jnp.zeros(3), capped
    )
    assert int(s["live_tile_overflow"]) == 0, "cap must cover live tiles"
    v0, g0 = _fwd_bwd((m, c, o, f), viewmat, intr, base)
    v1, g1 = _fwd_bwd((m, c, o, f), viewmat, intr, capped)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a, b in zip(g0, g1):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
