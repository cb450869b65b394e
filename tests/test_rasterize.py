"""Rasterizer correctness tests.

Oracle: a brute-force numpy rasterizer that composites *all* splats per pixel
in exact global depth order, with the same EWA projection math — the
tile-binning + top-K pipeline must match it on small scenes (this plays the
role of the gsplat golden comparison from SURVEY.md §4, which cannot run here
without CUDA). Plus analytic single-splat checks and gradient sanity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d, sh as sh_ops
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig,
    project_gaussians,
    rasterize,
    rasterize_arrays,
)
from tests.conftest import make_random_cloud


WIDTH, HEIGHT = 64, 48


def make_camera(width=WIDTH, height=HEIGHT, fov=60.0):
    import math

    f = width / (2 * math.tan(math.radians(fov) / 2))
    R = np.eye(3)
    T = np.array([0.0, 0.0, 4.0])  # camera looking at origin from z=-4 (w2c translation)
    return Camera.create(R, T, f, f, width, height)


def make_scene(rng, n=40, sh_degree=1, spread=1.0, scale=(0.05, 0.3)):
    cloud = make_random_cloud(rng, n=n, sh_degree=sh_degree, scale_range=scale)
    # Spread splats in front of the camera (world z in [-1, 1] -> cam z ~ 3-5).
    import dataclasses

    xyz = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    cloud = dataclasses.replace(cloud, xyz=jnp.asarray(xyz))
    import jax.numpy as jnp2

    return dataclasses.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(
            cloud.get_scaling, cloud.get_rotation
        ),
    )


def numpy_reference_rasterize(cloud, camera, background, config: RasterizeConfig):
    """Brute-force per-pixel front-to-back compositing (exact, no tiling)."""
    means = np.asarray(cloud.xyz, np.float64)
    cov6 = np.asarray(cloud.get_covariance(), np.float64)
    opacity = np.asarray(cloud.get_opacity[:, 0], np.float64)
    feats = np.asarray(cloud.get_features, np.float64)
    viewmat = np.asarray(camera.viewmat, np.float64)
    K = np.asarray(camera.intrinsics, np.float64)
    W, H = camera.width, camera.height

    Rv, tv = viewmat[:3, :3], viewmat[:3, 3]
    p_view = means @ Rv.T + tv
    z = p_view[:, 2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    zc = np.maximum(z, config.near)
    mean2d = np.stack([fx * p_view[:, 0] / zc + cx, fy * p_view[:, 1] / zc + cy], axis=1)

    lim_x = 1.3 * (W / 2.0) / fx
    lim_y = 1.3 * (H / 2.0) / fy
    tx = zc * np.clip(p_view[:, 0] / zc, -lim_x, lim_x)
    ty = zc * np.clip(p_view[:, 1] / zc, -lim_y, lim_y)

    n = means.shape[0]
    conic = np.zeros((n, 3))
    radius = np.zeros(n)
    for i in range(n):
        J = np.array(
            [[fx / zc[i], 0, -fx * tx[i] / zc[i] ** 2], [0, fy / zc[i], -fy * ty[i] / zc[i] ** 2]]
        )
        full = np.asarray(math3d.unpack_symmetric(jnp.asarray(cov6[i])), np.float64)
        c2 = J @ Rv @ full @ Rv.T @ J.T + config.eps2d * np.eye(2)
        det = np.linalg.det(c2)
        inv = np.linalg.inv(c2)
        conic[i] = [inv[0, 0], inv[0, 1], inv[1, 1]]
        mid = 0.5 * (c2[0, 0] + c2[1, 1])
        lam1 = mid + np.sqrt(max(mid * mid - det, 0.1))
        radius[i] = np.ceil(3.0 * np.sqrt(lam1))

    inside = (
        (mean2d[:, 0] + radius > 0) & (mean2d[:, 0] - radius < W)
        & (mean2d[:, 1] + radius > 0) & (mean2d[:, 1] - radius < H)
    )
    valid = (z > config.near) & (radius > config.radius_clip) & inside

    cam_center = -(Rv.T @ tv)
    dirs = means - cam_center
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    colors = np.asarray(
        sh_ops.eval_sh(cloud.sh_degree, jnp.asarray(feats, jnp.float32), jnp.asarray(dirs, jnp.float32)),
        np.float64,
    ) + 0.5
    colors = np.maximum(colors, 0.0)

    order = np.argsort(z, kind="stable")
    img = np.zeros((H, W, 3))
    acc = np.zeros((H, W))
    for yy in range(H):
        for xx in range(W):
            px, py = xx + 0.5, yy + 0.5
            T = 1.0
            for i in order:
                if not valid[i]:
                    continue
                dx_, dy_ = px - mean2d[i, 0], py - mean2d[i, 1]
                sigma = 0.5 * (conic[i, 0] * dx_ ** 2 + conic[i, 2] * dy_ ** 2) + conic[i, 1] * dx_ * dy_
                if sigma < 0:
                    continue
                alpha = min(opacity[i] * np.exp(-sigma), config.alpha_max)
                if alpha < config.alpha_clip:
                    continue
                if T < config.transmittance_min:
                    break
                img[yy, xx] += alpha * T * colors[i]
                acc[yy, xx] += alpha * T
                T *= 1.0 - alpha
    img += (1.0 - acc[..., None]) * np.asarray(background)[None, None, :]
    return img, acc


CFG = RasterizeConfig(max_tiles_per_splat=16, max_splats_per_tile=64, tile_chunk=4)


def test_matches_bruteforce_reference(rng):
    cloud = make_scene(rng, n=40)
    cam = make_camera()
    bg = (0.1, 0.2, 0.3)
    rgb, alpha, _ = rasterize(cloud, cam, background=bg, config=CFG)
    ref_rgb, ref_acc = numpy_reference_rasterize(cloud, cam, bg, CFG)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb, atol=2e-3)
    np.testing.assert_allclose(np.asarray(alpha), ref_acc, atol=2e-3)


def test_empty_scene_renders_background(rng):
    cloud = make_scene(rng, n=4)
    import dataclasses

    # Push everything behind the camera.
    cloud = dataclasses.replace(cloud, xyz=cloud.xyz + jnp.asarray([0.0, 0.0, 100.0]))
    bg = (0.25, 0.5, 0.75)
    rgb, alpha, _ = rasterize(cloud, make_camera(), background=bg, config=CFG)
    np.testing.assert_allclose(np.asarray(rgb), np.broadcast_to(bg, (HEIGHT, WIDTH, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def test_single_splat_center_alpha(rng):
    """A single isotropic splat at the optical axis: peak alpha = sigmoid(op)."""
    import dataclasses

    cloud = make_scene(rng, n=1)
    s = 0.2
    cloud = dataclasses.replace(
        cloud,
        xyz=jnp.asarray([[0.0, 0.0, 0.0]]),
        scaling=jnp.log(jnp.full((1, 3), s)),
        rotation=jnp.asarray([[1.0, 0.0, 0.0, 0.0]]),
        opacity=jnp.asarray([[2.0]]),
    )
    cloud = dataclasses.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(cloud.get_scaling, cloud.get_rotation),
    )
    cam = make_camera()
    rgb, alpha, _ = rasterize(cloud, cam, config=CFG)
    # Analytic alpha at the nearest pixel center, offset (0.5, 0.5) px from the
    # projected mean: var2d = (fx*s/z)^2 + eps2d, sigma = r^2/(2 var).
    fx = float(cam.fx)
    var2d = (fx * s / 4.0) ** 2 + CFG.eps2d
    sigma = 0.5 * (0.5**2 + 0.5**2) / var2d
    expected_peak = float(jax.nn.sigmoid(2.0)) * np.exp(-sigma)
    center = np.asarray(alpha)[HEIGHT // 2 - 2 : HEIGHT // 2 + 2, WIDTH // 2 - 2 : WIDTH // 2 + 2]
    assert abs(center.max() - expected_peak) < 1e-3


def test_depth_ordering(rng):
    """A fully opaque near splat must occlude a far one."""
    import dataclasses

    cloud = make_scene(rng, n=2, sh_degree=1)
    red = np.zeros((2, 1, 3), np.float32)
    red[0, 0] = [(1.0 - 0.5) / sh_ops.SH_C0, -0.5 / sh_ops.SH_C0, -0.5 / sh_ops.SH_C0]
    red[1, 0] = [-0.5 / sh_ops.SH_C0, (1.0 - 0.5) / sh_ops.SH_C0, -0.5 / sh_ops.SH_C0]
    cloud = dataclasses.replace(
        cloud,
        xyz=jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),  # cam z: 4 and 5
        features_dc=jnp.asarray(red),
        features_rest=jnp.zeros_like(cloud.features_rest),
        scaling=jnp.log(jnp.full((2, 3), 0.3)),
        rotation=jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
        opacity=jnp.full((2, 1), 12.0),  # ~fully opaque
    )
    cloud = dataclasses.replace(
        cloud,
        covariance=math3d.covariance_from_scaling_rotation(cloud.get_scaling, cloud.get_rotation),
    )
    rgb, _, _ = rasterize(cloud, make_camera(), config=CFG)
    center = np.asarray(rgb)[HEIGHT // 2, WIDTH // 2]
    assert center[0] > 0.8 and center[1] < 0.2  # red wins


def test_gradients_flow_to_all_params(rng):
    cloud = make_scene(rng, n=12)
    cam = make_camera(width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(xyz, cov, opacity, features):
        rgb, _, _ = rasterize_arrays(
            xyz, cov, opacity, features, cam.viewmat, cam.intrinsics,
            32, 32, cloud.sh_degree, jnp.zeros(3), CFG,
        )
        return jnp.mean((rgb - target) ** 2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0], cloud.get_features
    )
    for g, name in zip(grads, ("xyz", "cov", "opacity", "features")):
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), name
        assert np.abs(g).max() > 0, f"no gradient signal through {name}"


def test_gradient_matches_finite_difference(rng):
    """Pixel-gradient check (the BASELINE.json north-star criterion, applied
    to our own forward): analytic grad vs central differences."""
    cloud = make_scene(rng, n=6, scale=(0.1, 0.4))
    cam = make_camera(width=24, height=24)

    def loss_fn(xyz):
        rgb, _, _ = rasterize_arrays(
            xyz, cloud.get_covariance(), cloud.get_opacity[:, 0], cloud.get_features,
            cam.viewmat, cam.intrinsics, 24, 24, cloud.sh_degree, jnp.zeros(3), CFG,
        )
        return jnp.sum(rgb)

    g = np.asarray(jax.grad(loss_fn)(cloud.xyz))
    eps = 1e-3
    xyz = np.asarray(cloud.xyz)
    for (i, j) in [(0, 0), (2, 1), (4, 2)]:
        dx = np.zeros_like(xyz)
        dx[i, j] = eps
        f_plus = float(loss_fn(jnp.asarray(xyz + dx)))
        f_minus = float(loss_fn(jnp.asarray(xyz - dx)))
        fd = (f_plus - f_minus) / (2 * eps)
        assert abs(g[i, j] - fd) < 2e-2 * max(1.0, abs(fd)), (i, j, g[i, j], fd)


def test_projection_culling(rng):
    cloud = make_scene(rng, n=8)
    cam = make_camera()
    proj = project_gaussians(
        cloud.xyz, cloud.get_covariance(), cam.viewmat, cam.intrinsics,
        WIDTH, HEIGHT, CFG,
    )
    behind = jnp.asarray([[0.0, 0.0, -10.0]])  # behind camera (cam z < 0)
    proj_b = project_gaussians(
        behind, jnp.asarray([[0.01, 0, 0, 0.01, 0, 0.01]]), cam.viewmat, cam.intrinsics,
        WIDTH, HEIGHT, CFG,
    )
    assert not bool(proj_b["valid"][0])
    assert np.asarray(proj["depth"]).min() > 0


def test_stats_counters_trip_on_pathological_scene(rng):
    """SURVEY §7 hard part #2: truncation must be observable, not silent.

    A scene with huge splats (coverage > max_tiles_per_splat) and a tiny
    per-tile budget (occupancy > max_splats_per_tile) must trip the
    counters; a benign scene must report zeros."""
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        rasterize_arrays_with_stats,
    )

    cam = make_camera()
    bg = jnp.zeros(3, jnp.float32)

    # Pathological: 64 large overlapping splats, coverage cap 1, tile cap 8.
    cloud = make_scene(rng, n=64, sh_degree=0, spread=0.3, scale=(0.5, 0.8))
    config = RasterizeConfig(
        max_tiles_per_splat=1, max_splats_per_tile=8, backend="xla"
    )
    *_, stats = rasterize_arrays_with_stats(
        cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
        cloud.get_features, cam.viewmat, cam.intrinsics,
        WIDTH, HEIGHT, 0, bg, config,
    )
    assert int(stats["coverage_clipped_splats"]) > 0
    assert int(stats["overflow_tiles"]) > 0
    assert int(stats["dropped_entries"]) > 0

    # Benign: generous budgets -> all counters zero.
    config2 = RasterizeConfig(
        max_tiles_per_splat=64, max_splats_per_tile=256, backend="xla"
    )
    *_, stats2 = rasterize_arrays_with_stats(
        cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
        cloud.get_features, cam.viewmat, cam.intrinsics,
        WIDTH, HEIGHT, 0, bg, config2,
    )
    assert int(stats2["coverage_clipped_splats"]) == 0
    assert int(stats2["overflow_tiles"]) == 0
    assert int(stats2["dropped_entries"]) == 0
    assert int(stats2["bwd_cap_violations"]) == 0


def test_bwd_cap_exactness_and_truncation(rng):
    """max_bwd_splats_per_tile == K must reproduce the uncapped gradients
    bit-for-bit; a tiny cap must (by design) drop gradient tails on a deep
    scene — and the drop must only ever REMOVE contributions."""
    cloud = make_scene(rng, n=96, sh_degree=0, spread=0.2, scale=(0.2, 0.4))
    cam = make_camera()
    bg = jnp.zeros(3, jnp.float32)
    K = 64

    def grads(config):
        def loss(op):
            rgb, _, _ = rasterize_arrays(
                cloud.xyz, cloud.get_covariance(), op,
                cloud.get_features, cam.viewmat, cam.intrinsics,
                WIDTH, HEIGHT, 0, bg, config,
            )
            return jnp.sum(rgb)

        return jax.grad(loss)(cloud.get_opacity[:, 0])

    base = RasterizeConfig(
        max_tiles_per_splat=8, max_splats_per_tile=K, backend="xla"
    )
    g_none = grads(base)
    import dataclasses

    g_full = grads(dataclasses.replace(base, max_bwd_splats_per_tile=K))
    np.testing.assert_array_equal(np.asarray(g_none), np.asarray(g_full))

    g_tiny = grads(dataclasses.replace(base, max_bwd_splats_per_tile=4))
    # The capped backward must differ on this deep scene (tails dropped).
    assert not np.allclose(np.asarray(g_none), np.asarray(g_tiny))


@pytest.mark.parametrize("C", [1, 2, 3, 5, 9, 16])
def test_gather_entries_vjp_matches_plain_jax(rng, C):
    """The sort+fold+one-hot-landing VJP of `gather_entries` must equal the
    plain-JAX VJP of the equivalent gather, for EVERY max_tiles_per_splat —
    including values where the landing window is not a multiple of 128/32
    (C % 4 != 0 crashed the round-2 multi-chip dryrun)."""
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        _build_tile_table,
        gather_entries,
    )

    n, F = 37, 10
    cfg = RasterizeConfig(
        max_tiles_per_splat=C, max_splats_per_tile=8, backend="xla"
    )
    means2d = jnp.asarray(rng.uniform(0, 64, size=(n, 2)), jnp.float32)
    radius = jnp.asarray(rng.uniform(1, 20, size=n), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=n), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.2)
    table, sorted_entry, live, _, _, _ = _build_tile_table(
        means2d, radius, depth, valid, tiles_x=4, tiles_y=3, config=cfg
    )
    packed = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)
    ct = jnp.asarray(
        rng.normal(size=(table.shape[0], F, table.shape[1])), jnp.float32
    )

    def plain(p):
        splat = jnp.where(table >= 0, table // C, 0)
        g = p[splat] * (table >= 0).astype(p.dtype)[..., None]
        return jnp.transpose(g, (0, 2, 1))   # channel-major, like the op

    _, vjp_ref = jax.vjp(plain, packed)
    (g_ref,) = vjp_ref(ct)

    def custom(p):
        return gather_entries(p, table, sorted_entry, live, C, None)

    _, vjp_c = jax.vjp(custom, packed)
    (g_c,) = vjp_c(ct)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)

    # Capped transport == plain VJP with cotangent ranks past the cap
    # zeroed. `live` must come from a table build with the SAME KB — the
    # library path always passes config.max_bwd_splats_per_tile to both.
    import dataclasses as _dc

    KB = 3
    _, _, live_cap, _, _, _ = _build_tile_table(
        means2d, radius, depth, valid, tiles_x=4, tiles_y=3,
        config=_dc.replace(cfg, max_bwd_splats_per_tile=KB),
    )
    ct_masked = ct * (jnp.arange(table.shape[1]) < KB)[None, None, :]
    (g_ref_cap,) = vjp_ref(ct_masked)

    def custom_cap(p):
        return gather_entries(p, table, sorted_entry, live_cap, C, KB)

    _, vjp_cc = jax.vjp(custom_cap, packed)
    (g_cc,) = vjp_cc(ct)
    np.testing.assert_allclose(np.asarray(g_cc), np.asarray(g_ref_cap),
                               rtol=1e-6, atol=1e-6)


def test_bf16_cotangent_transport_close_to_f32(rng):
    """bwd_sort_bf16 rounds each per-entry cotangent to bf16 before the
    transport sort; the landed per-splat gradients must stay within bf16
    rounding (<= 2^-8 relative, before the <= C-row sum) of the f32 path,
    for every parameter tensor of the full rasterizer backward."""
    import dataclasses

    cloud = make_scene(rng, n=400, scale=(0.05, 0.15))
    cam = make_camera()
    bg = jnp.zeros(3, jnp.float32)
    base = RasterizeConfig(
        max_tiles_per_splat=8, max_splats_per_tile=64, tile_chunk=4,
    )

    def grads(config):
        def loss(m, c, o, f):
            rgb, _, _ = rasterize_arrays(
                m, c, o, f, cam.viewmat, cam.intrinsics,
                WIDTH, HEIGHT, cloud.sh_degree, bg, config,
            )
            return jnp.sum(rgb * jnp.cos(jnp.arange(rgb.size).reshape(rgb.shape)))

        return jax.grad(loss, argnums=(0, 1, 2, 3))(
            cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
            cloud.get_features,
        )

    g32 = grads(base)
    g16 = grads(dataclasses.replace(base, bwd_sort_bf16=True))
    # Error model: each ENTRY cotangent rounds at <= 2^-9 relative to ITS
    # magnitude; the landed grad sums <= C of them, so tensors whose landed
    # values are small relative to their entry cotangents (SH features: the
    # color cotangent is O(1) while dL/dfeat ~ 1e-2) see a larger fraction
    # of the tensor max. Bounds are measured behavior + ~50% margin
    # (means/cov/op ratio <= 0.8e-2, feat <= 3.2e-2 on this scene).
    for name, a, b in zip(("means", "cov", "op", "feat"), g32, g16):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = np.abs(a).max()
        assert scale > 0
        tol = 5e-2 if name == "feat" else 1.2e-2
        np.testing.assert_allclose(b, a, atol=tol * scale)
        rel = np.linalg.norm(b - a) / np.linalg.norm(a)
        assert rel < 2e-2, (name, rel)


def test_max_live_tiles_exact_and_counted(rng):
    """Occupancy-row cap: exact when every non-empty tile fits under the
    cap, and `live_tile_overflow` counts live tiles past it when not."""
    import dataclasses

    from gaussiansplattingregistration_tpu.ops.rasterize import (
        rasterize_arrays_with_stats,
    )

    # Scene concentrated near the center: edge tiles empty.
    cloud = make_scene(rng, n=200, spread=0.7, scale=(0.05, 0.12))
    cam = make_camera()
    bg = jnp.asarray([0.3, 0.1, 0.2], jnp.float32)
    base = RasterizeConfig(
        max_tiles_per_splat=8, max_splats_per_tile=64, tile_chunk=4,
        backend="pallas",
    )
    args = (cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
            cloud.get_features, cam.viewmat, cam.intrinsics,
            WIDTH, HEIGHT, cloud.sh_degree, bg)
    rgb_ref, _, _, stats = rasterize_arrays_with_stats(*args, base)
    n_live = int(np.sum(np.asarray(stats["max_count"]) > 0))  # scalar guard
    # count non-empty tiles via a full-table probe
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        project_gaussians, _build_tile_table,
    )
    proj = project_gaussians(cloud.xyz, cloud.get_covariance(), cam.viewmat,
                             cam.intrinsics, WIDTH, HEIGHT, base)
    *_, counts, order, _ = _build_tile_table(
        proj["means2d"], proj["radius"], proj["depth"], proj["valid"],
        -(-WIDTH // 16), -(-HEIGHT // 16), base)
    n_nonempty = int(jnp.sum(counts > 0))
    assert 4 < n_nonempty < 12  # 4x3 tile grid: some empty, some live

    ok_cfg = dataclasses.replace(base, max_live_tiles=n_nonempty + 8)
    rgb_ok, _, _, s_ok = rasterize_arrays_with_stats(*args, ok_cfg)
    assert int(s_ok["live_tile_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(rgb_ok), np.asarray(rgb_ref),
                               atol=1e-6)

    # Gradients too: the clipped transport must match the full one.
    def loss(cfg):
        def f(m):
            rgb, _, _ = rasterize_arrays(
                m, cloud.get_covariance(), cloud.get_opacity[:, 0],
                cloud.get_features, cam.viewmat, cam.intrinsics,
                WIDTH, HEIGHT, cloud.sh_degree, bg, cfg)
            return jnp.sum(rgb * rgb)
        return np.asarray(jax.grad(f)(cloud.xyz))
    np.testing.assert_allclose(loss(ok_cfg), loss(base), atol=1e-5)

    tight = dataclasses.replace(base, max_live_tiles=1)
    _, _, _, s_bad = rasterize_arrays_with_stats(*args, tight)
    assert int(s_bad["live_tile_overflow"]) > 0


def test_cumsum_flat_mxu_exact(rng):
    """The MXU triangular cumsum (liveness window trick) must be EXACTLY
    np.cumsum on 0/1 vectors, including non-512-multiple lengths."""
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        _cumsum_flat_mxu,
    )

    for E in (1, 7, 512, 513, 4096, 12_345):
        bits = rng.uniform(size=E) > 0.4
        got = np.asarray(_cumsum_flat_mxu(jnp.asarray(bits)))
        np.testing.assert_array_equal(got, np.cumsum(bits.astype(np.int64)))
    # All-ones: within-row sums reach the full row width (f32-exactness
    # boundary the docstring claims).
    ones = jnp.ones((2048,), bool)
    np.testing.assert_array_equal(
        np.asarray(_cumsum_flat_mxu(ones)), np.arange(1, 2049)
    )


def test_max_live_tiles_sliced_gradients(rng):
    """Cap that GENUINELY slices (T_live < num_tiles) with live tiles at
    HIGH image ids: regression for the live_s bound in the gather VJP —
    validity must be judged against the FULL num_tiles * K, not the capped
    table size, or every live tile with image id >= cap is miscounted dead
    and the landing misaligns (gradients were 100% wrong, not subtly off)."""
    import dataclasses

    from gaussiansplattingregistration_tpu.ops.rasterize import (
        rasterize_arrays_with_stats,
    )

    W, H = 160, 96                               # 10 x 6 = 60 tiles
    cloud = make_scene(rng, n=300, spread=0.5, scale=(0.02, 0.06))
    # Shift toward the bottom-right: the non-empty tiles get the HIGHEST
    # image ids, the worst case for an image-order validity bound.
    cloud = dataclasses.replace(
        cloud, xyz=cloud.xyz + jnp.asarray([0.8, 0.6, 0.0], jnp.float32)
    )
    cam = make_camera(width=W, height=H)
    bg = jnp.zeros(3, jnp.float32)
    base = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=64, tile_chunk=4,
        backend="pallas",
    )
    capped = dataclasses.replace(base, max_live_tiles=16)  # T_live=16 < 60
    args = (cloud.xyz, cloud.get_covariance(), cloud.get_opacity[:, 0],
            cloud.get_features, cam.viewmat, cam.intrinsics,
            W, H, cloud.sh_degree, bg)
    _, _, _, s = rasterize_arrays_with_stats(*args, capped)
    assert int(s["live_tile_overflow"]) == 0     # cap covers all live tiles

    def gradf(cfg):
        def f(m):
            rgb, _, _ = rasterize_arrays(m, *args[1:-1], bg, cfg)
            return jnp.sum(rgb * rgb)
        return np.asarray(jax.grad(f)(cloud.xyz))

    np.testing.assert_allclose(gradf(capped), gradf(base), atol=1e-5)
    r0, _, _ = rasterize_arrays(*args, base)
    r1, _, _ = rasterize_arrays(*args, capped)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-6)
