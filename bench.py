"""Benchmarks for the five BASELINE.json configs.

The driver contract is ONE JSON line on stdout: the headline metric
(rasterize fwd+bwd pixels/s/chip at 1M splats). The remaining BASELINE
configs (ICP iters/s, FPFH+RANSAC+colored-refine wall-clock, HEM+multiscale
wall-clock, photometric pose-opt steps/s) are emitted as secondary JSON
lines on STDERR and written to BENCH_EXTRA.json.

Runs on whatever JAX platform the environment provides (the real TPU chip
under the driver; CPU if forced).

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
headline denominator is the north-star proxy — an estimated H100 gsplat
fwd+bwd throughput of 2.5e8 px/s at 1M splats (>=2.0 would mean "2x H100
per chip"; the pod-level 2x target then comes from scaling). Secondary
metrics have no reference numbers at all (the reference delegates to
Open3D/CPU and publishes nothing); vs_baseline is null there.
"""

import json
import math
import os
import sys
import time

import numpy as np

H100_FWD_BWD_PIXELS_PER_S = 2.5e8  # estimated gsplat fwd+bwd at 1M splats

WIDTH, HEIGHT = 1280, 720
N_SPLATS = 1_000_000
WARMUP = 3
# Steady-state: wall/iter converges by ~12 dispatches (measured 72.3 ->
# 61.6 ms/frame from 2 to 12 iters — per-dispatch tunnel overhead
# amortizes); at a ~44 ms frame the residual per-dispatch overhead is
# still ~1 ms at 16 iters — 32 halves it (measured 46.8 -> ~45 ms/frame).
ITERS = 32


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_raster():
    """Config 4: 1M-splat tile rasterization, fwd+bwd (the headline)."""
    import jax
    import jax.numpy as jnp

    from gaussiansplattingregistration_tpu.models.camera import Camera
    from gaussiansplattingregistration_tpu.ops import math3d
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        RasterizeConfig,
        rasterize_arrays,
        rasterize_arrays_with_stats,
    )

    rng = np.random.default_rng(0)
    n = N_SPLATS
    # Scene sized so splats are a few pixels across at 720p (realistic 3DGS
    # splat density), bounded tile coverage.
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.006, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    cov = np.asarray(
        math3d.covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    opacity = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 1.0, size=n)))).astype(np.float32)
    features = (rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32)

    f = WIDTH / (2 * math.tan(math.radians(70) / 2))
    cam = Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, WIDTH, HEIGHT)

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    config = RasterizeConfig(
        max_tiles_per_splat=4,       # tiny splats: 2x2 tile window is exact
        # K swept on-chip: 384 keeps the truncation oracle at 41.4 dB
        # (>= the 40 dB visually-exact gate below, which enforces this at
        # every run) and cuts the slot count — and with it the fwd gather,
        # the bwd transport sort, and the kernel's chunk count — by 25%
        # (frame 89 -> 78 ms). 512 was 50.8 dB with the same gate.
        max_splats_per_tile=384,
        tile_chunk=32,
        backend=backend,
        # No backward cap: this scene is deep (mean early-termination
        # horizon ~306 of K=512, max 512 — see the stats line), so any cap
        # below K would drop real gradients. The V-B transport (sort + fold
        # + one-hot landing) is cheap even uncapped.
        max_bwd_splats_per_tile=None,
        # bf16 cotangent transport: halves the bwd sort bytes and makes the
        # landing single-pass; gradient-precision contract pinned in
        # tests/test_rasterize.py::test_bf16_cotangent_transport_close_to_f32.
        bwd_sort_bf16=(backend == "pallas"),
        # ~28% of this scene's 3600 tiles are EMPTY at every gate pose
        # (measured non-empty: 2610 / 2340 / 2340 over the 3 poses, deterministic
        # scene+poses); the
        # occupancy-row cap skips them from the gather/sorts/kernels
        # exactly. Guarded twice: any live tile past the cap trips
        # live_tile_overflow (hard gate below) at the timed pose, and would
        # crater the >=40 dB truncation oracle at the others.
        max_live_tiles=(2688 if backend == "pallas" else None),
    )

    means_d = jnp.asarray(xyz)
    cov_d = jnp.asarray(cov)
    op_d = jnp.asarray(opacity)
    feat_d = jnp.asarray(features)
    viewmat = cam.viewmat
    intr = cam.intrinsics
    bg = jnp.zeros(3, jnp.float32)

    # Truncation/termination observability: the static bounds drop work
    # (tile entries past K, tiles past a splat's C coverage budget, gradient
    # tails past the bwd cap). Before timing, (a) refuse any backward-cap
    # gradient drop, and (b) quantify BOTH truncations against an
    # untruncated oracle (xla backend, K = max pre-truncation run, C=8 so
    # coverage clipping is absent too) over THREE orbit poses — the
    # headline is only published if the MINIMUM per-view PSNR >= 40 dB.
    # The same gate also runs on a CLUSTERED scene (real-3DGS-like density:
    # surface clusters, mixed splat scales, opaque fronts) and its minimum
    # is REPORTED alongside — the headline K is justified against the worse
    # of the two (see detail "truncation_psnr_clustered_db").
    if backend == "pallas":
        import dataclasses as _dc

        from gaussiansplattingregistration_tpu.ops import math3d as _m3

        yaws = (0.0, 0.35, -0.35)
        viewmats = []
        for yaw in yaws:
            R = np.asarray(
                _m3.axis_angle_to_rotmat(
                    jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(yaw)
                )
            )
            c2 = Camera.create(R, [0.0, 0.0, 3.0], f, f, WIDTH, HEIGHT)
            viewmats.append(c2.viewmat)

        def oracle_gate(m_d, c_d, o_d, f_d, label, render_cfg=None):
            """min per-view PSNR of the bench config vs the C=8/K-exact
            oracle over the 3 orbit poses."""
            render_cfg = render_cfg or config
            probe_cfg = _dc.replace(config, backend="xla",
                                    max_tiles_per_splat=8, tile_chunk=4)
            max_run = 0
            for vm in viewmats:
                _, _, _, s_v = rasterize_arrays_with_stats(
                    m_d, c_d, o_d, f_d, vm, intr,
                    WIDTH, HEIGHT, 0, bg, probe_cfg,
                )
                max_run = max(max_run, int(s_v["max_run"]))
            k_exact = -(-max_run // 128) * 128
            oracle_cfg = _dc.replace(
                config, backend="xla", max_tiles_per_splat=8,
                max_splats_per_tile=k_exact, tile_chunk=4,
                max_bwd_splats_per_tile=None,
            )
            per_view = []
            for yaw, vm in zip(yaws, viewmats):
                rgb_t, _, _ = rasterize_arrays(
                    m_d, c_d, o_d, f_d, vm, intr,
                    WIDTH, HEIGHT, 0, bg, render_cfg,
                )
                rgb_e, _, _ = rasterize_arrays(
                    m_d, c_d, o_d, f_d, vm, intr,
                    WIDTH, HEIGHT, 0, bg, oracle_cfg,
                )
                mse = float(jnp.mean((rgb_t - rgb_e) ** 2))
                psnr = 10.0 * math.log10(1.0 / max(mse, 1e-12))
                per_view.append(round(psnr, 2))
                _log(f"# truncation oracle [{label}]: yaw={yaw:+.2f} "
                     f"K_exact={k_exact} psnr_vs_exact={psnr:.2f} dB")
            return min(per_view), per_view, k_exact

        rgb_trunc, *_, stats = rasterize_arrays_with_stats(
            means_d, cov_d, op_d, feat_d, viewmat, intr,
            WIDTH, HEIGHT, 0, bg, config,
        )
        viol = int(stats["bwd_cap_violations"])
        _log(f"# raster stats: {json.dumps({k: float(v) for k, v in stats.items()})}")
        if viol:
            raise RuntimeError(
                f"bench config drops gradients ({viol} tiles over the bwd cap)"
            )
        lto = int(stats.get("live_tile_overflow", 0))
        if lto:
            raise RuntimeError(
                f"bench config drops {lto} live tiles (max_live_tiles too "
                "small for this scene/view)"
            )
        trunc_psnr, per_view, k_exact = oracle_gate(
            means_d, cov_d, op_d, feat_d, "uniform"
        )
        if trunc_psnr < 40.0:
            raise RuntimeError(
                f"headline scene truncation is visible: min {trunc_psnr:.1f} "
                f"dB < 40 dB vs the C=8/K={k_exact} exact render over "
                f"{len(yaws)} poses; raise max_splats_per_tile or "
                f"max_tiles_per_splat"
            )

        # Clustered real-3DGS-like scene: splats concentrated on cluster
        # surfaces (lego-like density spikes), log-uniform mixed scales,
        # opaque fronts (real scenes saturate early, which is what makes
        # front-most-K truncation visually exact).
        crng = np.random.default_rng(7)
        n_clusters = 2000
        centers = crng.uniform(-1, 1, size=(n_clusters, 3)).astype(np.float32)
        assign = crng.integers(0, n_clusters, size=n)
        cxyz = (centers[assign]
                + crng.normal(0, 0.045, size=(n, 3))).astype(np.float32)
        cscales = np.exp(crng.uniform(
            np.log(0.0015), np.log(0.012), size=(n, 3))).astype(np.float32)
        cquats = crng.normal(size=(n, 4)).astype(np.float32)
        ccov = np.asarray(math3d.covariance_from_scaling_rotation(
            jnp.asarray(cscales), jnp.asarray(cquats)))
        cop = (1.0 / (1.0 + np.exp(
            -crng.normal(1.2, 0.8, size=n)))).astype(np.float32)
        cfeat = (crng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32)
        # max_live_tiles is a per-scene tuning (the clustered scene fills
        # nearly every tile): the clustered gate validates the K/C
        # truncation with the cap off.
        cl_psnr, cl_per_view, cl_k = oracle_gate(
            jnp.asarray(cxyz), jnp.asarray(ccov), jnp.asarray(cop),
            jnp.asarray(cfeat), "clustered",
            render_cfg=_dc.replace(config, max_live_tiles=None),
        )
        stats = {**{k: float(v) for k, v in stats.items()},
                 "truncation_psnr_db": trunc_psnr,
                 "truncation_psnr_per_view_db": per_view,
                 "truncation_psnr_clustered_db": cl_psnr,
                 "truncation_psnr_clustered_per_view_db": cl_per_view,
                 "clustered_k_exact": cl_k}
    else:
        stats = None

    # Single-pose timed loop. Multi-frame batching was MEASURED a loss on
    # this chip (scripts/raster_ab.py, r5): lax.map/scan over 3 poses costs
    # +6.7 ms/frame (scan residual copies beat the ~2 ms dispatch saving);
    # an unrolled 3-pose body triples compile for the same device time.
    def loss_fn(means, cov3d, op, feats):
        rgb, _, _ = rasterize_arrays(
            means, cov3d, op, feats, viewmat, intr,
            WIDTH, HEIGHT, 0, bg, config,
        )
        return jnp.sum(rgb)

    fwd_bwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))

    for _ in range(WARMUP):
        grads = fwd_bwd(means_d, cov_d, op_d, feat_d)
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        grads = fwd_bwd(means_d, cov_d, op_d, feat_d)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / ITERS

    pixels_per_s = WIDTH * HEIGHT / dt
    out = {
        "metric": "rasterize_fwd_bwd_pixels_per_s_per_chip_1M_splats",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pixels_per_s / H100_FWD_BWD_PIXELS_PER_S, 4),
    }
    if stats is not None:
        out["detail"] = stats
    return out


def _two_clouds(rng, n, offset=(0.08, -0.05, 0.04), angle=0.06, colors=False):
    """Synthetic overlapping cloud pair with a known small SE(3) offset."""
    import jax.numpy as jnp

    from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud

    pts = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    # Structured surface (not pure noise) so ICP has gradients to follow.
    pts[:, 2] = 0.3 * np.sin(3.0 * pts[:, 0]) + 0.2 * np.cos(2.0 * pts[:, 1])
    pts[:, 2] += 0.01 * rng.normal(size=n).astype(np.float32)
    c, s = math.cos(angle), math.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    src = pts @ R.T + np.asarray(offset, np.float32)
    col = None
    if colors:
        col = (0.5 + 0.5 * np.sin(5.0 * pts)).astype(np.float32)
    tgt_pc = PointCloud(points=jnp.asarray(pts),
                        colors=None if col is None else jnp.asarray(col))
    src_pc = PointCloud(points=jnp.asarray(src),
                        colors=None if col is None else jnp.asarray(col))
    return src_pc, tgt_pc


def bench_icp():
    """Config 1: point-to-point ICP iterations/s on two 100k-point clouds."""
    import jax

    from gaussiansplattingregistration_tpu.models.parameters import (
        LocalRegistrationParams,
    )
    from gaussiansplattingregistration_tpu.ops import icp as icp_ops

    rng = np.random.default_rng(1)
    src, tgt = _two_clouds(rng, 100_000)
    params = LocalRegistrationParams(
        max_correspondence=0.3, max_iteration=30,
        relative_fitness=0.0, relative_rmse=0.0,  # run all 30 iters
    )
    res = icp_ops.icp(src, tgt, params)  # compile + warmup
    t0 = time.perf_counter()
    runs = 3
    for _ in range(runs):
        res = icp_ops.icp(src, tgt, params)
    dt = (time.perf_counter() - t0) / runs

    # Secondary: a volumetric 100k cloud with a realistic tight gate — the
    # regime where the grid-pruned correspondence path engages (the bench
    # scene above is a surface whose gate ~ bbox scale: auto keeps brute,
    # see PERF.md "ICP correspondence"). Measured r4: 59 vs 27 iters/s.
    from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
    from gaussiansplattingregistration_tpu.ops import se3 as se3_ops
    import jax.numpy as jnp

    vol = rng.uniform(-1, 1, size=(100_000, 3)).astype(np.float32)
    T_off = se3_ops.se3_exp(jnp.asarray([0.01, -0.02, 0.01, 0.03, -0.02, 0.01]))
    src_v = PointCloud(points=jnp.asarray(vol) @ T_off[:3, :3].T + T_off[:3, 3])
    tgt_v = PointCloud(points=jnp.asarray(vol))
    params_v = LocalRegistrationParams(
        max_correspondence=0.05, max_iteration=30,
        relative_fitness=0.0, relative_rmse=0.0,
    )
    res_v = icp_ops.icp(src_v, tgt_v, params_v)
    t0 = time.perf_counter()
    res_v = icp_ops.icp(src_v, tgt_v, params_v)
    dt_v = time.perf_counter() - t0

    return {
        "metric": "icp_p2p_iters_per_s_100k_pts",
        "value": round(res.num_iterations / dt, 2),
        "unit": "iters/s",
        "vs_baseline": None,
        "detail": {"fitness": res.fitness, "rmse": res.inlier_rmse,
                   "iters": res.num_iterations, "wall_s": round(dt, 4),
                   "volumetric_grid_iters_per_s": round(
                       res_v.num_iterations / dt_v, 2),
                   "volumetric_fitness": res_v.fitness},
    }


def bench_global():
    """Config 2: FPFH+RANSAC global then colored-ICP refine (wall-clock)."""
    from gaussiansplattingregistration_tpu.models.parameters import (
        CorrespondenceChecker,
        LocalRegistrationParams,
        LocalRegistrationType,
        RANSACRegistrationParams,
    )
    from gaussiansplattingregistration_tpu.ops import global_registration as gr
    from gaussiansplattingregistration_tpu.ops import icp as icp_ops

    rng = np.random.default_rng(2)
    src, tgt = _two_clouds(rng, 50_000, offset=(0.3, -0.2, 0.15), angle=0.4,
                           colors=True)
    ransac = RANSACRegistrationParams(
        voxel_size=0.05,
        checkers=(CorrespondenceChecker("edge_length", 0.9),
                  CorrespondenceChecker("distance", 0.075)),
        max_iteration=100_000, confidence=0.999,
    )
    refine = LocalRegistrationParams(
        registration_type=LocalRegistrationType.ICP_COLOR,
        max_correspondence=0.1, max_iteration=30,
    )
    # Warmup/compile pass, then the timed pass.
    g = gr.ransac_registration(src, tgt, ransac, seed=0)
    icp_ops.icp(src, tgt, refine, init_transform=g.transformation)
    t0 = time.perf_counter()
    g = gr.ransac_registration(src, tgt, ransac, seed=1)
    r = icp_ops.icp(src, tgt, refine, init_transform=g.transformation)
    dt = time.perf_counter() - t0

    # Hypothesis THROUGHPUT, separately from the wall metric: the wall
    # number confidence-exits after one 512-hypothesis batch on this
    # well-separated pair, so it is insensitive to the search loop itself.
    # confidence=1.0 can never early-exit -> all 16384 hypotheses run.
    import dataclasses as _dc
    flood = _dc.replace(ransac, max_iteration=16384, confidence=1.0)
    gr.ransac_registration(src, tgt, flood, seed=0)  # compile
    t1 = time.perf_counter()
    gf = gr.ransac_registration(src, tgt, flood, seed=1)
    hyp_s = gf.num_iterations / (time.perf_counter() - t1)
    return {
        "metric": "global_fpfh_ransac_plus_colored_refine_wall_s_50k_pts",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": None,
        "detail": {"ransac_fitness": g.fitness, "refine_fitness": r.fitness,
                   "ransac_hypotheses": g.num_iterations,
                   "ransac_hypotheses_per_s": round(hyp_s, 1)},
    }


def bench_hem_multiscale():
    """Config 3: HEM downsample (3 levels) + coarse-to-fine registration."""
    import jax.numpy as jnp

    from gaussiansplattingregistration_tpu.models.parameters import (
        GaussianMixtureParams,
        MultiScaleRegistrationParams,
    )
    from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
    from gaussiansplattingregistration_tpu.ops import hem as hem_ops
    from gaussiansplattingregistration_tpu.pipelines.multiscale import (
        multiscale_mixture_registration,
    )
    from tests.scene_utils import make_random_cloud

    rng = np.random.default_rng(3)
    n = 200_000
    # Splat extents must stay comparable to the *coarsened* component
    # spacing for all cluster_level rounds, or the KLD/color eligibility
    # gates orphan a growing share per level (orphans pass through,
    # mixture.cpp:250-253, and compound). Measured on the exact-radius
    # native oracle (round 4): scales 0.02-0.06 degrade to 1.74x at level 3,
    # while 0.04-0.10 holds [2.90x, 2.78x, 2.45x] — the reference's
    # ~3x/level semantics (mixture.cpp:257-259). The fixed-K JAX path
    # matches the native sizes to <0.3% on this scene, so the gate below
    # measures scene/gate semantics, not fixed-K truncation.
    cloud = make_random_cloud(rng, n=n, sh_degree=1, scale_range=(0.04, 0.10))
    params = GaussianMixtureParams(cluster_level=3)

    # Warmup = the compile pass (ONE hem_cluster_level executable serves all
    # three levels — the state keeps its [N]-slot shape); the timed pass is
    # the steady-state wall, same contract as the multiscale timing below.
    t0 = time.perf_counter()
    hem_ops.create_mixture(cloud, params, seed=0, backend="jax",
                           with_stats=True)
    t_hem_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    levels, hem_stats = hem_ops.create_mixture(
        cloud, params, seed=0, backend="jax", with_stats=True
    )
    for lvl in levels:
        jnp.asarray(lvl.xyz).block_until_ready()
    t_hem = time.perf_counter() - t0
    print(f"# hem cold (compile) pass: {t_hem_cold:.2f}s", file=sys.stderr)

    level_sizes = [int(np.asarray(l.xyz).shape[0]) for l in levels]
    # Log the truncation stats BEFORE any gate can raise, so a red run still
    # carries the evidence of why (saturated_parents = fixed-K truncation).
    print(f"# hem levels: sizes={level_sizes} stats={hem_stats}", file=sys.stderr)
    # Observability gate: each level must actually reduce (>=1.8x of the
    # ~3x target; random parent sampling + orphans keep it below exactly 3).
    prev = n
    for sz in level_sizes:
        if sz > prev / 1.8:
            raise RuntimeError(
                f"HEM bench scene is not clustering: sizes {level_sizes} "
                f"stats {hem_stats}"
            )
        prev = sz

    # Build the level pyramid (finest -> coarsest) for both "clouds"; offset
    # the source copy by a known transform.
    def to_pc(xyz, colors):
        return PointCloud(points=jnp.asarray(xyz), colors=jnp.asarray(colors))

    base = to_pc(cloud.xyz, cloud.get_colors)
    tgt_levels = [base] + [to_pc(l.xyz, l.colors) for l in levels]
    T_off = np.eye(4, dtype=np.float32)
    T_off[:3, 3] = (0.05, -0.03, 0.02)
    src_levels = [pc.transform(jnp.asarray(T_off)) for pc in tgt_levels]

    ms = MultiScaleRegistrationParams(
        voxel_values=[0.3, 0.15, 0.08], iter_values=[30, 20, 14]
    )
    # Warmup = the compile pass (4 level shapes); the timed pass is the
    # steady-state coarse-to-fine wall a user iterating on alignments sees.
    multiscale_mixture_registration(src_levels, tgt_levels, ms)
    t0 = time.perf_counter()
    res = multiscale_mixture_registration(src_levels, tgt_levels, ms)
    t_reg = time.perf_counter() - t0
    return {
        "metric": "hem3_plus_multiscale_wall_s_200k_splats",
        "value": round(t_hem + t_reg, 3),
        "unit": "s",
        "vs_baseline": None,
        "detail": {"hem_s": round(t_hem, 3),
                   "hem_cold_s": round(t_hem_cold, 3),
                   "multiscale_s": round(t_reg, 3),
                   "level_sizes": level_sizes,
                   "hem_stats": hem_stats,
                   "fitness": res.fitness},
    }


def bench_photometric():
    """Config 5: differentiable photometric pose-opt steps/s (single chip;
    the sharded multi-host variant is parallel/train_step.py, exercised by
    __graft_entry__.dryrun_multichip)."""
    import jax
    import jax.numpy as jnp

    from gaussiansplattingregistration_tpu.models.camera import Camera
    from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig
    from gaussiansplattingregistration_tpu.pipelines import photometric
    from tests.scene_utils import make_random_cloud

    rng = np.random.default_rng(4)
    cloud = make_random_cloud(rng, n=100_000, sh_degree=1,
                              scale_range=(0.005, 0.02))
    w, h = 640, 360
    f = w / (2 * math.tan(math.radians(70) / 2))
    cams = [Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, w, h)]
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    config = RasterizeConfig(
        max_tiles_per_splat=4, max_splats_per_tile=256, tile_chunk=32,
        backend=backend, max_bwd_splats_per_tile=256,
    )
    targets = photometric.render_targets(cloud, cams, config=config)

    steps = 10
    # Warmup run compiles the step.
    photometric.photometric_pose_opt(
        cloud, cams, targets, steps=2, config=config, ssim_weight=0.2,
    )
    t0 = time.perf_counter()
    res = photometric.photometric_pose_opt(
        cloud, cams, targets, steps=steps, config=config, ssim_weight=0.2,
    )
    dt = time.perf_counter() - t0
    return {
        "metric": "photometric_pose_opt_steps_per_s_100k_splats_640x360",
        "value": round(steps / dt, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "detail": {"final_loss": res.final_loss},
    }


def main():
    # Persistent XLA compilation cache: bench executables replay from disk
    # on repeat runs (the HEM pipeline alone is a ~40 s remote compile; the
    # first-ever run on a machine still pays it). GSR_NO_COMPILE_CACHE=1
    # opts out.
    from gaussiansplattingregistration_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    cache = enable_compile_cache()
    if cache:
        _log(f"# compile cache: {cache}")
    only_headline = "--headline-only" in sys.argv
    headline = bench_raster()

    extras = []
    if not only_headline:
        for fn in (bench_icp, bench_global, bench_hem_multiscale,
                   bench_photometric):
            try:
                t0 = time.perf_counter()
                r = fn()
                _log(f"# {fn.__name__}: {time.perf_counter() - t0:.1f}s")
                extras.append(r)
            except Exception as e:  # secondary benches must not kill the run
                extras.append({"metric": fn.__name__, "error": repr(e)})
            _log(json.dumps(extras[-1]))
        try:
            # Round-stamped secondaries: the driver runs bench AFTER the
            # end-of-round commit, so writing a fixed path perpetually
            # dirtied the committed copy (VERDICT r4 weak #7). Stamp with
            # round = max existing BENCH_rNN.json + 1.
            import glob as _glob

            here = os.path.dirname(os.path.abspath(__file__))
            rounds = [
                int(os.path.basename(p)[len("BENCH_r"):-len(".json")])
                for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
                if os.path.basename(p)[len("BENCH_r"):-len(".json")].isdigit()
            ]
            stamp = (max(rounds) + 1) if rounds else 0
            path = os.path.join(here, f"BENCH_EXTRA_r{stamp:02d}.json")
            with open(path, "w") as fh:
                json.dump({"headline": headline, "secondary": extras}, fh,
                          indent=1)
        except OSError:
            pass

    # THE one stdout JSON line (driver contract).
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
