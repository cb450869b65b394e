"""Pallas TPU kernels for the tile-compositing hot loop.

Replaces the gsplat CUDA tile rasterizer's per-tile compositing loops
(`/root/reference/src/utils/rasterization_util.py:13-29` wraps it) with
TPU-first kernels. The XLA reference path (`ops/rasterize.py`) materializes
[tiles, K, pixels] alpha tensors in HBM chunk by chunk; these kernels keep
one tile's working set in VMEM in the TPU-natural layout

    pixels (P = 256) on SUBLANES  x  splat entries (K) on LANES

so that every step is relayout-free:

* per-splat param rows arrive channel-major [16, K] — each row is already a
  lane vector, and pixel-coordinate columns are sublane vectors, so the
  alpha evaluation [P, K] is pure broadcasting (VPU). The [T, 16, K] input
  is produced by the XLA-side gather with a fused transpose (profiled: the
  transpose fuses into the gather for ~0.4 ms; a separate transpose
  custom-call costs ~30 ms at 1M splats);
* the front-to-back transmittance is computed in log space with the
  cumulative sum done as ONE MXU matmul against a constant triangular
  matrix (log1p -> [P,S] @ triu[S,S] -> exp). This replaces the 7-step
  Hillis–Steele lane scan (~21 VPU ops per element) with work on the
  otherwise-idle MXU; precision=HIGHEST keeps f32-grade accuracy;
* the weighted (color, depth, alpha) accumulation contracts K with one MXU
  matmul per chunk, with the value rows used directly as the [5, K]
  operand — no transposes anywhere;
* the K axis streams in STATIC chunks of `_CHUNK` lanes (python-unrolled:
  static lane slices compile to free views), with 3DGS early termination at
  chunk granularity: once every pixel saturates, remaining chunks are
  skipped via lax.cond — the serial early-exit gsplat gets from CUDA warps,
  recovered on a vector machine;
* the backward is hand-written (gsplat's CUDA backward uses atomics; TPUs
  have none) and runs in ONE kernel: the unrolled forward sweep keeps each
  chunk's transmittance carry as an SSA value, and the unrolled reverse
  sweep consumes them while accumulating the gradient suffix statistic
  (the depth-suffix sum is also an MXU matmul, against the transposed
  triangle). The scatter back to splats is the sort-based VJP of the XLA
  gather that fed the kernel (`rasterize.gather_entries`) — atomics-free by
  construction (SURVEY.md §7 hard part #1).

Key identity for the backward (front-to-back compositing):
  out = sum_k w_k c_k,     w_k = a_k T_k,  T_k = prod_{j<k} (1 - a_j)
  dL/da_k = T_k (dL/dw_k) - S_k / (1 - a_k),
  S_k = sum_{j>k} (dL/dw_j) w_j   (a suffix sum along the depth axis).

All kernels run in interpret mode automatically on CPU (tests), compiled on
TPU; `tests_tpu/` executes them on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig

_CHUNK = 128          # K entries streamed per unrolled chunk (lane multiple)
_NCH = 10             # packed param channels (mx,my,conic*3,op,rgb,depth)
_BLOCK = 8            # tiles per grid step (amortizes ~6us/step grid overhead)
_VMEM_LIMIT = 100 * 1024 * 1024
# Max bytes for the backward term cache (see _bwd_rule); ~16 MB/core VMEM
# minus headroom for params, cotangents, outputs, carries, compiler temps.
_TERM_CACHE_BUDGET = 13 * 1024 * 1024
_HI = jax.lax.Precision.HIGHEST


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _triu(s: int):
    """[S, S] f32 with 1 where row <= col (inclusive-cumsum right-operand)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (r <= c).astype(jnp.float32)


def _tril(s: int):
    """[S, S] f32 with 1 where row >= col (inclusive-suffix-sum operand)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (r >= c).astype(jnp.float32)


def _cumsum_lanes(x, tri):
    """Inclusive cumulative sum along lanes via one MXU matmul."""
    return jax.lax.dot_general(
        x, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _dot_tri_split(x, tri):
    """x [P,S] @ 0/1-triangle [S,S] in TWO bf16 MXU passes (~16-mantissa-bit
    accuracy) instead of precision=HIGHEST's six.

    Mosaic rejects bf16-typed matmul operands and precision=HIGH in-kernel,
    and DEFAULT (one bf16 pass) was measured 21% wrong on gradients. Instead:
    split x into hi+lo parts that are exactly bf16-REPRESENTABLE f32 values —
    DEFAULT precision truncates MXU operands to bf16, which is lossless for
    such values, and the 0/1 triangle is exact in bf16 — so two DEFAULT
    passes reproduce the true sum of 16-bit-rounded terms (~8e-6 relative).
    The split masks mantissa bits with integer ops (f32->bf16 casts in
    Mosaic are packing relayouts — measured +8 ms on the bwd kernel);
    x_lo keeps exactly the low 8 mantissa bits, which renormalize into
    bf16's 8-bit significand.
    """
    x_hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    x_lo = x - x_hi
    dims = (((1,), (0,)), ((), ()))
    out = jax.lax.dot_general(
        x_hi, tri, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return out + jax.lax.dot_general(
        x_lo, tri, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(ts: int, dtype):
    """[P, 1] tile-local pixel-center coordinates, row-major (y*ts + x)."""
    p = ts * ts
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (idx % ts).astype(dtype) + 0.5
    py = (idx // ts).astype(dtype) + 0.5
    return px, py


def _chunk_terms(pc, px, py, config):
    """Alpha evaluation for one [16, S] param chunk.

    Returns [P, S] (alpha, raw_alpha, exp_term, sigma, dx, dy) — all
    sublane-pixel x lane-entry, relayout-free.
    """
    mx = pc[0:1, :]              # [1, S] lane rows
    my = pc[1:2, :]
    ca = pc[2:3, :]
    cb = pc[3:4, :]
    cc = pc[4:5, :]
    op = pc[5:6, :]

    dx = px - mx                                               # [P, S]
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    exp_term = jnp.exp(-jnp.maximum(sigma, 0.0))
    raw_alpha = op * exp_term
    alpha = jnp.minimum(raw_alpha, config.alpha_max)
    # No explicit valid channel: gather_entries zeroes masked rows, so
    # invalid entries arrive with opacity 0 and can never pass alpha_clip.
    visible = (alpha >= config.alpha_clip) & (sigma >= 0.0)
    alpha = jnp.where(visible, alpha, 0.0)
    return alpha, raw_alpha, exp_term, sigma, dx, dy


def _vals_rows(pc):
    """[5, S] value rows (r, g, b, depth, ones) straight from the params."""
    return jnp.concatenate([pc[6:10, :], jnp.ones_like(pc[0:1, :])], axis=0)


def _fwd_kernel(cnt_ref, p_ref, out_ref, carry_ref, *, ts: int,
                n_chunks: int, block: int, config: RasterizeConfig):
    """Block-vectorized forward compositing: the whole `block` of tiles runs
    as one [B, P, S] computation with ONE `pl.when` per chunk, gated on the
    block's max occupancy. Per-tile `lax.cond` early termination was
    measured to COST more than it saved (~11 ms/frame of vector->scalar
    max-reduce pipeline stalls at bench scale, while the saturation gate
    never fired on realistic sparse tiles); entries past a tile's own
    occupancy/saturation horizon contribute exactly zero through the w
    mask. The per-tile live horizon (consumed by the backward cap and the
    truncation stats) is tracked with VECTOR reduces — [B,P,1] -> [B,1,1]
    stays on the VPU."""
    dtype = p_ref.dtype
    px, py = _pixel_coords(ts, dtype)
    P = ts * ts
    S = _CHUNK
    B = block
    tri = _triu(S)
    tmin = config.transmittance_min

    cnt_max = cnt_ref[0, 0]
    for b in range(1, B):
        cnt_max = jnp.maximum(cnt_max, cnt_ref[b, 0])
    # Per-tile occupancy as a [B, 1, 1] vector for the live accounting.
    cntv = jnp.concatenate(
        [jnp.full((1, 1, 1), cnt_ref[b, 0], jnp.float32) for b in range(B)],
        axis=0,
    )

    out_ref[:, :, 0:5] = jnp.zeros((B, P, 5), jnp.float32)
    out_ref[:, :, 5:8] = jnp.zeros((B, P, 3), jnp.float32)
    carry_ref[...] = jnp.ones((B, P, 1), jnp.float32)
    live = jnp.zeros((B, 1, 1), jnp.float32)

    for c in range(n_chunks):
        carry_T = carry_ref[...]
        # Chunk-granular per-tile horizon: entries processed before every
        # pixel of the tile saturated AND within the occupied prefix.
        sat = jnp.max(carry_T, axis=1, keepdims=True)          # [B, 1, 1]
        alive = (sat > tmin) & (cntv > float(c * S))
        live = live + jnp.where(alive, float(S), 0.0)

        @pl.when(cnt_max > c * S)
        def _chunk(c=c, carry_T=carry_T):
            pc = p_ref[:, :, c * S:(c + 1) * S]                # [B, NCH, S]
            alpha, _, _, _, _, _ = _chunk_terms_blk(pc, px, py, config)
            lt = jnp.log1p(-alpha)                              # <= 0
            # Inclusive lane cumsum at HIGHEST (matches the pre-vectorized
            # kernel's numerics; MXU flops are negligible here).
            cum = _cumsum_lanes(lt.reshape(B * P, S), tri).reshape(B, P, S)
            T = carry_T * jnp.exp(cum - lt)                     # exclusive
            w = jnp.where(T > tmin, alpha * T, 0.0)
            acc = out_ref[:, :, 0:5]
            out_ref[:, :, 0:5] = acc + jnp.stack([
                jax.lax.dot_general(
                    w[b], _vals_rows(pc[b]),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                for b in range(B)
            ])
            carry_ref[...] = carry_T * jnp.exp(cum[:, :, S - 1:S])

    # Per-tile live horizon (see RasterizeConfig.max_bwd_splats_per_tile).
    out_ref[:, 0:1, 5:6] = live


def _chunk_terms_blk(pc, px, py, config):
    """Block-vectorized `_chunk_terms`: pc [B, NCH, S] -> [B, P, S] terms.

    All elementwise math runs on 3-D arrays whose trailing (sublane, lane)
    dims are the well-tiled (P, S); the leading B just unrolls."""
    mx = pc[:, 0:1, :]                                         # [B, 1, S]
    my = pc[:, 1:2, :]
    ca = pc[:, 2:3, :]
    cb = pc[:, 3:4, :]
    cc = pc[:, 4:5, :]
    op = pc[:, 5:6, :]

    dx = px[None, :, :] - mx                                   # [B, P, S]
    dy = py[None, :, :] - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    exp_term = jnp.exp(-jnp.maximum(sigma, 0.0))
    raw_alpha = op * exp_term
    alpha = jnp.minimum(raw_alpha, config.alpha_max)
    visible = (alpha >= config.alpha_clip) & (sigma >= 0.0)
    alpha = jnp.where(visible, alpha, 0.0)
    return alpha, raw_alpha, exp_term, sigma, dx, dy


def _dot_tri_blk(x, tri):
    """[B, P, S] @ [S, S] triangle via ONE flattened split-bf16 MXU matmul
    (the triangle acts row-wise, so collapsing (B, P) into rows is exact)."""
    B, P, S = x.shape
    return _dot_tri_split(x.reshape(B * P, S), tri).reshape(B, P, S)


def _bwd_kernel(cnt_ref, p_ref, ct_ref, d_ref, carry_ref, sfx_ref,
                alpha_ref, expt_ref, sigma_ref, texc_ref, *,
                ts: int, n_chunks: int, block: int,
                config: RasterizeConfig, cache_terms: bool = True):
    """Single kernel: unrolled forward sweep stores per-chunk transmittance
    carries in a VMEM scratch; unrolled reverse sweep consumes them while
    accumulating the gradient suffix statistic.

    The whole `block` of tiles is processed as one [B, P, S] vectorized
    computation, and chunk skipping (past every tile's occupancy/saturation
    horizon) is expressed as `pl.when` regions updating SCRATCH REFS at
    BLOCK granularity. The previous per-tile `lax.cond` formulation cost
    ~12.7 ms at bench scale even when every chunk skipped: 48 conds per
    grid step, each copying its [P, 1]/[10, S] carries through the branch
    phi. `pl.when` has no carries — skipped chunks cost one SMEM compare.
    Gradients are unchanged: a tile whose own horizon ends earlier than the
    block's contributes exactly zero through the live mask (w = dlda = 0),
    the same zeros its skip branch used to write.

    With `cache_terms=False` (VMEM-budget fallback, chosen by `_bwd_rule`
    when the 4 x [n_chunks, B, P, S] cache would exceed the ~16 MB/core
    VMEM), the forward sweep stores only the cheap [n_chunks+1, B, P, 1]
    carries and the reverse sweep recomputes each chunk's terms — the
    pre-cache formulation, numerically identical (same ops, same order)."""
    dtype = p_ref.dtype
    px, py = _pixel_coords(ts, dtype)
    P = ts * ts
    S = _CHUNK
    B = block
    tri = _triu(S)
    tri_s = _tril(S)
    tmin = config.transmittance_min

    cnt_max = cnt_ref[0, 0]
    for b in range(1, B):
        cnt_max = jnp.maximum(cnt_max, cnt_ref[b, 0])

    # ---- forward sweep: per-chunk entry transmittance carries -------------
    # carry_ref: [n_chunks + 1, B, P, 1] scratch; slot c holds the ENTRY
    # transmittance at chunk c's first entry. Slot layout wastes lanes but
    # each slot is only touched twice per grid step.
    carry_ref[0] = jnp.ones((B, P, 1), jnp.float32)
    for c in range(n_chunks):
        # Occupancy-only gate: a vector->scalar max reduce per chunk was
        # measured to stall the kernel ~11 ms/frame at bench scale (the
        # VPU->scalar sync serializes the pipeline), while the saturation
        # gate itself never fired on realistic scenes (identical timing
        # at opacity 0.7 vs 0.001) - sparse tiles keep some pixel
        # unsaturated. Rank-capping lives in max_bwd_splats_per_tile.
        pred = cnt_max > c * S

        @pl.when(pred)
        def _fwd_heavy(c=c):
            pc = p_ref[:, :, c * S:(c + 1) * S]                # [B, NCH, S]
            alpha, _, exp_term, sigma, _, _ = _chunk_terms_blk(
                pc, px, py, config
            )
            lt = jnp.log1p(-alpha)
            cum = _dot_tri_blk(lt, tri)
            if cache_terms:
                # Cache the chunk terms the reverse sweep would otherwise
                # recompute (~35 VPU passes/element incl. two
                # transcendentals): alpha, exp_term, sigma, and the
                # within-chunk entry-EXCLUSIVE factor exp(cum - lt).
                alpha_ref[c] = alpha
                expt_ref[c] = exp_term
                sigma_ref[c] = sigma
                texc_ref[c] = jnp.exp(cum - lt)
            carry_ref[c + 1] = carry_ref[c] * jnp.exp(cum[:, :, S - 1:S])

        @pl.when(jnp.logical_not(pred))
        def _fwd_skip(c=c):
            carry_ref[c + 1] = carry_ref[c]

    # ---- reverse sweep: suffix statistic + gradients ----------------------
    # ct arrives CHANNEL-on-SUBLANES [B, 8, P]: (ch, P) tiles are fully
    # packed (a [B, P, 8] layout uses 8 of 128 lanes per tile — its HBM
    # assembly alone cost ~2 ms at bench scale), and every consumer below
    # is an MXU dot contracting the channel or pixel dim directly.
    g_rgb = ct_ref[:, 0:3, :]                                  # [B, 3, P]
    g_depth = ct_ref[:, 3:4, :]                                # [B, 1, P]
    G5 = ct_ref[:, 0:5, :]                                     # [B, 5, P]

    sfx_ref[...] = jnp.zeros((B, P, 1), jnp.float32)
    for c in reversed(range(n_chunks)):
        # Occupancy-only gate: a vector->scalar max reduce per chunk was
        # measured to stall the kernel ~11 ms/frame at bench scale (the
        # VPU->scalar sync serializes the pipeline), while the saturation
        # gate itself never fired on realistic scenes (identical timing
        # at opacity 0.7 vs 0.001) - sparse tiles keep some pixel
        # unsaturated. Rank-capping lives in max_bwd_splats_per_tile.
        pred = cnt_max > c * S

        @pl.when(pred)
        def _heavy(c=c):
            sfx = sfx_ref[...]
            pc = p_ref[:, :, c * S:(c + 1) * S]                # [B, NCH, S]
            if cache_terms:
                alpha = alpha_ref[c]
                exp_term = expt_ref[c]
                sigma = sigma_ref[c]
                texc = texc_ref[c]
                dx = px[None, :, :] - pc[:, 0:1, :]
                dy = py[None, :, :] - pc[:, 1:2, :]
            else:
                alpha, _, exp_term, sigma, dx, dy = _chunk_terms_blk(
                    pc, px, py, config
                )
                lt = jnp.log1p(-alpha)
                texc = jnp.exp(_dot_tri_blk(lt, tri) - lt)
            raw_alpha = pc[:, 5:6, :] * exp_term
            T = carry_ref[c] * texc                            # exclusive
            live = T > tmin
            w = jnp.where(live, alpha * T, 0.0)

            # dL/dw [b][P, S] = G5 [5, P]^T @ vals [5, S] — per-tile MXU dots
            # (unrolled; Mosaic has no batched dot).
            dldw = jnp.stack([
                jax.lax.dot_general(
                    G5[b], _vals_rows(pc[b]),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                for b in range(B)
            ])                                                 # [B, P, S]
            dw_w = dldw * w
            # Inclusive suffix sum along lanes — split-bf16 MXU matmul.
            sfx_incl = _dot_tri_blk(dw_w, tri_s)
            S_excl = sfx_incl - dw_w + sfx
            dlda = jnp.where(
                live & (alpha > 0.0),
                T * dldw - S_excl / jnp.maximum(1.0 - alpha, 1e-6),
                0.0,
            )

            unclamped = jnp.where(raw_alpha < config.alpha_max, 1.0, 0.0)
            dldraw = dlda * unclamped
            d_op = jnp.sum(dldraw * exp_term, axis=1, keepdims=True)
            dldsigma = -dldraw * raw_alpha * jnp.where(sigma > 0.0, 1.0, 0.0)

            # Direct product+reduce for the position/conic gradients.
            # (A pixel-moment matmul formulation — [6,P]@[P,S] against a
            # polynomial basis — was tried and reverted: measured +1 ms;
            # the kernel is not as VPU-bound as the op count suggests.)
            ca = pc[:, 2:3, :]
            cb = pc[:, 3:4, :]
            cc = pc[:, 4:5, :]
            d_ca = 0.5 * jnp.sum(dldsigma * dx * dx, axis=1, keepdims=True)
            d_cb = jnp.sum(dldsigma * dx * dy, axis=1, keepdims=True)
            d_cc = 0.5 * jnp.sum(dldsigma * dy * dy, axis=1, keepdims=True)
            ddx = dldsigma * (ca * dx + cb * dy)
            ddy = dldsigma * (cc * dy + cb * dx)
            d_mx = -jnp.sum(ddx, axis=1, keepdims=True)
            d_my = -jnp.sum(ddy, axis=1, keepdims=True)

            # d_color rows [3, S] = g_rgb [3, P] @ w [P, S]; d_depth [1, S]
            # likewise — both contract the pixel dim on the MXU with ct's
            # channel-major rows used directly.
            d_color = jnp.stack([
                jax.lax.dot_general(
                    g_rgb[b], w[b],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                for b in range(B)
            ])                                                 # [B, 3, S]
            d_depth = jnp.stack([
                jax.lax.dot_general(
                    g_depth[b], w[b],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                for b in range(B)
            ])                                                 # [B, 1, S]

            # Emit channel-major [B, 10, S] directly (no per-chunk
            # transpose): the gather VJP consumes the cotangent table as ten
            # 1-D COLUMNS (sort operands), each a contiguous [T, K] slab of
            # this layout.
            d_ref[:, :, c * S:(c + 1) * S] = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_color, d_depth],
                axis=1,
            )                                                  # [B, 10, S]
            sfx_ref[...] = sfx + jnp.sum(dw_w, axis=2, keepdims=True)

        @pl.when(jnp.logical_not(pred))
        def _skip(c=c):
            d_ref[:, :, c * S:(c + 1) * S] = jnp.zeros(
                (B, _NCH, S), jnp.float32
            )


# --------------------------------------------------------------------------
# Public op with custom VJP
# --------------------------------------------------------------------------


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def composite_tiles_pallas(
    gT,           # [T, 10, K] channel-major entry params, TILE-LOCAL means
    counts,       # [T, 1] float32 occupied-prefix length per tile
    ts: int,
    config: RasterizeConfig,
):
    """Per-tile front-to-back compositing. Returns (rgb [T,P,3], alpha [T,P],
    depth [T,P], live [T] f32) with P = ts*ts (row-major pixels); `live` is
    each tile's early-termination horizon in entries (chunk-granular) — the
    depth rank past which gradients are identically zero.

    `gT` channels: (mx_local, my_local, conic_a, conic_b, conic_c, opacity,
    r, g, b, depth). The caller produces it as
    transpose(gather(...)) which XLA fuses into the gather — do NOT insert a
    materialized pack/transpose here (it costs ~30 ms at bench scale).
    """
    return _fwd_impl(gT, counts, ts, config)


def _fwd_impl(gT, counts, ts, config):
    T0, nch, K = gT.shape
    assert nch == _NCH, gT.shape
    P = ts * ts
    S = _CHUNK
    K_pad = ((K + S - 1) // S) * S
    n_chunks = K_pad // S
    B = _BLOCK
    T_pad = ((T0 + B - 1) // B) * B

    params = _pad_axis(_pad_axis(gT, K_pad, 2), T_pad, 0)
    cnt_i = _pad_axis(counts, T_pad, 0).astype(jnp.int32)
    kernel = functools.partial(
        _fwd_kernel, ts=ts, n_chunks=n_chunks, block=B, config=config
    )
    out = pl.pallas_call(
        kernel,
        grid=(T_pad // B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, _NCH, K_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, P, 8), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, P, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, P, 1), jnp.float32),                # carry_T
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(cnt_i, params)
    return (out[:T0, :, 0:3], out[:T0, :, 4], out[:T0, :, 3],
            out[:T0, 0, 5])


def _fwd_rule(gT, counts, ts, config):
    # Residuals are only (gT, counts): under pure jax.grad nothing consumes
    # the primal render, so XLA dead-code-eliminates the forward kernel
    # entirely. (Shipping per-chunk transmittance carries as a residual was
    # tried and reverted: it forces the fwd kernel to RUN under grad —
    # +9 ms, more than the bwd forward-sweep recompute it saves.)
    out = _fwd_impl(gT, counts, ts, config)
    return out, (gT, counts)


def _bwd_rule(ts, config, residuals, cotangents):
    gT, counts = residuals
    g_rgb, g_alpha, g_depth, _ = cotangents
    T0, _, K = gT.shape
    P = ts * ts
    S = _CHUNK
    K_pad = ((K + S - 1) // S) * S
    n_chunks = K_pad // S
    B = _BLOCK
    T_pad = ((T0 + B - 1) // B) * B

    params = _pad_axis(_pad_axis(gT, K_pad, 2), T_pad, 0)
    cnt_i = _pad_axis(counts, T_pad, 0).astype(jnp.int32)
    # CHANNEL-on-SUBLANES [T, 8, P] (see _bwd_kernel): fully-packed (8, P)
    # lane-tiles; the moveaxis fuses into the producers (cotangents arrive
    # from row gathers / broadcasts upstream).
    ct = jnp.concatenate(
        [
            jnp.moveaxis(g_rgb, 2, 1),
            g_depth[:, None, :],
            g_alpha[:, None, :],
            jnp.zeros((T0, 3, P), jnp.float32),
        ],
        axis=1,
    )
    ct = _pad_axis(ct, T_pad, 0)

    # Forward-sweep term cache: 4 x [n_chunks, B, P, S] f32 — 12.6 MB at
    # K=384/B=8, which fits the ~16 MB/core VMEM next to the ~0.6 MB of
    # params/cotangents/outputs, but K >= 512 would not. Past the budget,
    # fall back to recomputing chunk terms in the reverse sweep (the
    # pre-cache formulation) instead of failing to compile.
    cache_bytes = 4 * n_chunks * B * P * S * 4
    cache_terms = cache_bytes <= _TERM_CACHE_BUDGET
    cache_shape = (n_chunks, B, P, S) if cache_terms else (1, 1, 8, S)

    kernel = functools.partial(
        _bwd_kernel, ts=ts, n_chunks=n_chunks, block=B, config=config,
        cache_terms=cache_terms,
    )
    d_params = pl.pallas_call(
        kernel,
        grid=(T_pad // B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, _NCH, K_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, _NCH, K_pad), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, _NCH, K_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_chunks + 1, B, P, 1), jnp.float32),  # carries
            pltpu.VMEM((B, P, 1), jnp.float32),                # suffix
            pltpu.VMEM(cache_shape, jnp.float32),              # alpha cache
            pltpu.VMEM(cache_shape, jnp.float32),              # exp_term
            pltpu.VMEM(cache_shape, jnp.float32),              # sigma
            pltpu.VMEM(cache_shape, jnp.float32),              # texc
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(cnt_i, params, ct)

    # Channel-major [T, 10, K] is already the cotangent layout of gT; the
    # caller-side transpose(g) autodiff then presents the gather VJP with a
    # [T, K, 10] VIEW whose per-channel column slices are contiguous slabs.
    d_gT = d_params[:T0, :, :K]
    return d_gT, jnp.zeros_like(counts)


composite_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)
