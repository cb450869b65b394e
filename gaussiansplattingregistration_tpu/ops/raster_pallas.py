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


def _fwd_kernel(cnt_ref, p_ref, out_ref, *, ts: int,
                n_chunks: int, block: int, config: RasterizeConfig):
    dtype = p_ref.dtype
    px, py = _pixel_coords(ts, dtype)
    P = ts * ts
    S = _CHUNK
    tri = _triu(S)

    # `block` tiles per grid step: TPU grid steps run sequentially at ~6us
    # fixed cost each, so batching tiles amortizes the step overhead while
    # keeping per-tile early termination (the b-loop is python-unrolled).
    for b in range(block):
        cnt = cnt_ref[b, 0]            # valid entries are a rank-contiguous
        acc = jnp.zeros((P, 5), jnp.float32)   # prefix of the tile row
        carry_T = jnp.ones((P, 1), jnp.float32)
        live = jnp.zeros((), jnp.float32)      # early-termination horizon

        for c in range(n_chunks):
            def chunk_body(carry, b=b, c=c):
                acc, carry_T = carry
                pc = p_ref[b, :, c * S:(c + 1) * S]            # [16, S] static
                alpha, _, _, _, _, _ = _chunk_terms(pc, px, py, config)
                lt = jnp.log1p(-alpha)                          # <= 0
                cum = _cumsum_lanes(lt, tri)                    # inclusive
                T = carry_T * jnp.exp(cum - lt)                 # exclusive
                w = jnp.where(T > config.transmittance_min, alpha * T, 0.0)
                acc = acc + jax.lax.dot_general(
                    w, _vals_rows(pc),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                carry_T = carry_T * jnp.exp(cum[:, S - 1:S])
                return acc, carry_T

            # Skip the chunk once every pixel saturates (3DGS early
            # termination) or past the tile's occupied prefix (invalid
            # entries have alpha 0, so they can never saturate the scan).
            pred = (jnp.max(carry_T) > config.transmittance_min) & (cnt > c * S)
            acc, carry_T = jax.lax.cond(
                pred,
                chunk_body,
                lambda carry: carry,
                (acc, carry_T),
            )
            live = live + jnp.where(pred, float(S), 0.0)

        out_ref[b, :, 0:5] = acc
        out_ref[b, :, 5:8] = jnp.zeros((P, 3), jnp.float32)
        # Per-tile live horizon (entries processed before every pixel
        # saturated), chunk-granular — consumers cap the backward transport
        # at this rank and count cap violations (RasterizeConfig
        # .max_bwd_splats_per_tile).
        out_ref[b, 0:1, 5:6] = jnp.full((1, 1), live, jnp.float32)


def _bwd_kernel(cnt_ref, p_ref, ct_ref, d_ref, *, ts: int, n_chunks: int,
                block: int, config: RasterizeConfig):
    """Single kernel: unrolled forward sweep keeps per-chunk transmittance
    carries as SSA values; unrolled reverse sweep consumes them while
    accumulating the gradient suffix statistic. `block` tiles per grid step
    amortize the fixed per-step cost (see _fwd_kernel)."""
    dtype = p_ref.dtype
    px, py = _pixel_coords(ts, dtype)
    P = ts * ts
    S = _CHUNK

    for b in range(block):
        _bwd_tile(cnt_ref, p_ref, ct_ref, d_ref, b, px, py, P, S,
                  n_chunks, config)


def _bwd_tile(cnt_ref, p_ref, ct_ref, d_ref, b, px, py, P, S,
              n_chunks, config):
    cnt = cnt_ref[b, 0]
    tri = _triu(S)
    tri_s = _tril(S)
    # ---- forward sweep: per-chunk entry transmittance carries -------------
    carries = []
    carry_T = jnp.ones((P, 1), jnp.float32)
    for c in range(n_chunks):
        carries.append(carry_T)

        def fwd_heavy(cT, c=c):
            pc = p_ref[b, :, c * S:(c + 1) * S]
            alpha, _, _, _, _, _ = _chunk_terms(pc, px, py, config)
            lt = jnp.log1p(-alpha)
            cum = _dot_tri_split(lt, tri)
            return cT * jnp.exp(cum[:, S - 1:S])

        carry_T = jax.lax.cond(
            (jnp.max(carry_T) > config.transmittance_min) & (cnt > c * S),
            fwd_heavy,
            lambda cT: cT,
            carry_T,
        )

    # ---- reverse sweep: suffix statistic + gradients ----------------------
    g_rgb = ct_ref[b, :, 0:3]                                  # [P, 3]
    g_depth = ct_ref[b, :, 3:4]                                # [P, 1]
    G5 = ct_ref[b, :, 0:5]                                     # [P, 5]

    suffix = jnp.zeros((P, 1), jnp.float32)
    for c in reversed(range(n_chunks)):
        carry_T = carries[c]
        pc = p_ref[b, :, c * S:(c + 1) * S]

        def heavy(sfx, pc=pc, carry_T=carry_T):
            alpha, raw_alpha, exp_term, sigma, dx, dy = _chunk_terms(
                pc, px, py, config
            )
            lt = jnp.log1p(-alpha)
            cum = _dot_tri_split(lt, tri)
            T = carry_T * jnp.exp(cum - lt)                    # exclusive
            live = T > config.transmittance_min
            w = jnp.where(live, alpha * T, 0.0)

            # dL/dw [P, S] = G5 [P, 5] @ vals [5, S] — MXU.
            dldw = jax.lax.dot_general(
                G5, _vals_rows(pc),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )
            dw_w = dldw * w
            # Inclusive suffix sum along lanes — split-bf16 MXU matmul.
            sfx_incl = _dot_tri_split(dw_w, tri_s)
            S_excl = sfx_incl - dw_w + sfx
            dlda = jnp.where(
                live & (alpha > 0.0),
                T * dldw - S_excl / jnp.maximum(1.0 - alpha, 1e-6),
                0.0,
            )

            unclamped = jnp.where(raw_alpha < config.alpha_max, 1.0, 0.0)
            dldraw = dlda * unclamped
            d_op = jnp.sum(dldraw * exp_term, axis=0, keepdims=True)  # [1, S]
            dldsigma = -dldraw * raw_alpha * jnp.where(sigma > 0.0, 1.0, 0.0)

            # Direct product+reduce for the position/conic gradients.
            # (A pixel-moment matmul formulation — [6,P]@[P,S] against a
            # polynomial basis — was tried and reverted: measured +1 ms;
            # the kernel is not as VPU-bound as the op count suggests.)
            ca = pc[2:3, :]
            cb = pc[3:4, :]
            cc = pc[4:5, :]
            d_ca = 0.5 * jnp.sum(dldsigma * dx * dx, axis=0, keepdims=True)
            d_cb = jnp.sum(dldsigma * dx * dy, axis=0, keepdims=True)
            d_cc = 0.5 * jnp.sum(dldsigma * dy * dy, axis=0, keepdims=True)
            ddx = dldsigma * (ca * dx + cb * dy)
            ddy = dldsigma * (cc * dy + cb * dx)
            d_mx = -jnp.sum(ddx, axis=0, keepdims=True)
            d_my = -jnp.sum(ddy, axis=0, keepdims=True)

            # d_color rows [3, S] = g_rgb.T @ w — contract P on the MXU.
            d_color = jax.lax.dot_general(
                g_rgb, w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )
            d_depth = jnp.sum(w * g_depth, axis=0, keepdims=True)

            dchunk = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_color, d_depth],
                axis=0,
            )                                                  # [10, S]
            return dchunk, sfx + jnp.sum(dw_w, axis=1, keepdims=True)

        def skip(sfx):
            return jnp.zeros((_NCH, S), jnp.float32), sfx

        dchunk, suffix = jax.lax.cond(
            (jnp.max(carry_T) > config.transmittance_min) & (cnt > c * S),
            heavy, skip, suffix,
        )
        # Emit channel-major [10, S] directly (no per-chunk transpose): the
        # gather VJP now consumes the cotangent table as ten 1-D COLUMNS
        # (sort operands), each a contiguous [T, K] slab of this layout.
        d_ref[b, :, c * S:(c + 1) * S] = dchunk


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
    ct = jnp.concatenate(
        [
            g_rgb,
            g_depth[..., None],
            g_alpha[..., None],
            jnp.zeros((T0, P, 3), jnp.float32),
        ],
        axis=-1,
    )
    ct = _pad_axis(ct, T_pad, 0)

    kernel = functools.partial(
        _bwd_kernel, ts=ts, n_chunks=n_chunks, block=B, config=config
    )
    d_params = pl.pallas_call(
        kernel,
        grid=(T_pad // B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, _NCH, K_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P, 8), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, _NCH, K_pad), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, _NCH, K_pad), jnp.float32),
        interpret=_interpret(),
        compiler_params=_params(),
    )(cnt_i, params, ct)

    # Channel-major [T, 10, K] is already the cotangent layout of gT; the
    # caller-side transpose(g) autodiff then presents the gather VJP with a
    # [T, K, 10] VIEW whose per-channel column slices are contiguous slabs.
    d_gT = d_params[:T0, :, :K]
    return d_gT, jnp.zeros_like(counts)


composite_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)
