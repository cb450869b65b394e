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
  alpha evaluation [P, K] is pure broadcasting (VPU);
* the front-to-back transmittance is a multiplicative Hillis–Steele scan
  along the LANE axis (pltpu.roll shifts lanes — the cheap direction;
  Mosaic has no cumprod primitive, and the log/exp round trip of the XLA
  path is avoided entirely);
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
  sweep consumes them while accumulating the gradient suffix statistic.
  The scatter back to splats is the sort-based VJP of the XLA gather that
  fed the kernel (`rasterize.gather_entries`) — atomics-free by
  construction (SURVEY.md §7 hard part #1).

Key identity for the backward (front-to-back compositing):
  out = sum_k w_k c_k,     w_k = a_k T_k,  T_k = prod_{j<k} (1 - a_j)
  dL/da_k = T_k (dL/dw_k) - S_k / (1 - a_k),
  S_k = sum_{j>k} (dL/dw_j) w_j   (a suffix sum along the depth axis).

All kernels run in interpret mode automatically on CPU (tests), compiled on
TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig

_CHUNK = 128          # K entries streamed per unrolled chunk (lane multiple)
_NCH = 16             # packed param channels (11 used, padded to sublane 16)
_BLOCK = 8            # tiles per grid step (amortizes ~6us/step grid overhead)
_VMEM_LIMIT = 100 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _lane_cumprod(x):
    """Inclusive multiplicative Hillis–Steele scan along lanes (axis 1)."""
    k = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = x * jnp.where(col >= s, shifted, 1.0)
        s *= 2
    return x


def _lane_suffix_sum(x):
    """Inclusive suffix sum along lanes (axis 1)."""
    k = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        # Circular roll by (k - s) == backward shift by s (negative shifts
        # are rejected by pltpu.roll).
        shifted = pltpu.roll(x, shift=k - s, axis=1)
        x = x + jnp.where(col < k - s, shifted, 0.0)
        s *= 2
    return x


def _excl_from_incl(incl):
    """Exclusive from inclusive scan: lane-shift by one, lane 0 = 1."""
    col = jax.lax.broadcasted_iota(jnp.int32, incl.shape, 1)
    return jnp.where(col == 0, 1.0, pltpu.roll(incl, shift=1, axis=1))


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
    valid = pc[10:11, :]

    dx = px - mx                                               # [P, S]
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    exp_term = jnp.exp(-jnp.maximum(sigma, 0.0))
    raw_alpha = op * exp_term
    alpha = jnp.minimum(raw_alpha, config.alpha_max)
    visible = (alpha >= config.alpha_clip) & (sigma >= 0.0) & (valid > 0)
    alpha = jnp.where(visible, alpha, 0.0)
    return alpha, raw_alpha, exp_term, sigma, dx, dy


def _vals_rows(pc):
    """[5, S] value rows (r, g, b, depth, ones) straight from the params."""
    return jnp.concatenate([pc[6:10, :], jnp.ones_like(pc[0:1, :])], axis=0)


def _fwd_kernel(cnt_ref, p_ref, out_ref, *, ts: int, n_chunks: int,
                block: int, config: RasterizeConfig):
    dtype = p_ref.dtype
    px, py = _pixel_coords(ts, dtype)
    P = ts * ts
    S = _CHUNK

    # `block` tiles per grid step: TPU grid steps run sequentially at ~6us
    # fixed cost each, so batching tiles amortizes the step overhead while
    # keeping per-tile early termination (the b-loop is python-unrolled).
    for b in range(block):
        cnt = cnt_ref[b, 0]            # valid entries are a rank-contiguous
        acc = jnp.zeros((P, 5), jnp.float32)   # prefix of the tile row
        carry_T = jnp.ones((P, 1), jnp.float32)

        for c in range(n_chunks):
            def chunk_body(carry, b=b, c=c):
                acc, carry_T = carry
                pc = p_ref[b, :, c * S:(c + 1) * S]            # [16, S] static
                alpha, _, _, _, _, _ = _chunk_terms(pc, px, py, config)
                incl = _lane_cumprod(1.0 - alpha)
                T = carry_T * _excl_from_incl(incl)
                w = jnp.where(T > config.transmittance_min, alpha * T, 0.0)
                acc = acc + jax.lax.dot_general(
                    w, _vals_rows(pc),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                carry_T = carry_T * incl[:, S - 1:S]
                return acc, carry_T

            # Skip the chunk once every pixel saturates (3DGS early
            # termination) or past the tile's occupied prefix (invalid
            # entries have alpha 0, so they can never saturate the scan).
            acc, carry_T = jax.lax.cond(
                (jnp.max(carry_T) > config.transmittance_min)
                & (cnt > c * S),
                chunk_body,
                lambda carry: carry,
                (acc, carry_T),
            )

        out_ref[b, :, 0:5] = acc
        out_ref[b, :, 5:8] = jnp.zeros((P, 3), jnp.float32)


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
        _bwd_tile(cnt_ref, p_ref, ct_ref, d_ref, b, px, py, P, S, n_chunks,
                  config)


def _bwd_tile(cnt_ref, p_ref, ct_ref, d_ref, b, px, py, P, S, n_chunks,
              config):
    cnt = cnt_ref[b, 0]
    # ---- forward sweep: per-chunk entry transmittance carries -------------
    carries = []
    carry_T = jnp.ones((P, 1), jnp.float32)
    for c in range(n_chunks):
        carries.append(carry_T)

        def heavy(cT, c=c):
            pc = p_ref[b, :, c * S:(c + 1) * S]
            alpha, _, _, _, _, _ = _chunk_terms(pc, px, py, config)
            incl = _lane_cumprod(1.0 - alpha)
            return cT * incl[:, S - 1:S]

        carry_T = jax.lax.cond(
            (jnp.max(carry_T) > config.transmittance_min) & (cnt > c * S),
            heavy,
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
            incl = _lane_cumprod(1.0 - alpha)
            T = carry_T * _excl_from_incl(incl)
            live = T > config.transmittance_min
            w = jnp.where(live, alpha * T, 0.0)

            # dL/dw [P, S] = G5 [P, 5] @ vals [5, S] — MXU.
            dldw = jax.lax.dot_general(
                G5, _vals_rows(pc),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_w = dldw * w
            S_excl = _lane_suffix_sum(dw_w) - dw_w + sfx
            dlda = jnp.where(
                live & (alpha > 0.0),
                T * dldw - S_excl / jnp.maximum(1.0 - alpha, 1e-6),
                0.0,
            )

            unclamped = jnp.where(raw_alpha < config.alpha_max, 1.0, 0.0)
            dldraw = dlda * unclamped
            d_op = jnp.sum(dldraw * exp_term, axis=0, keepdims=True)  # [1, S]
            dldsigma = -dldraw * raw_alpha * jnp.where(sigma > 0.0, 1.0, 0.0)

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
                preferred_element_type=jnp.float32,
            )
            d_depth = jnp.sum(w * g_depth, axis=0, keepdims=True)

            dchunk = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_color, d_depth,
                 jnp.zeros((_NCH - 10, S), jnp.float32)],
                axis=0,
            )                                                  # [16, S]
            return dchunk, sfx + jnp.sum(dw_w, axis=1, keepdims=True)

        def skip(sfx):
            return jnp.zeros((_NCH, S), jnp.float32), sfx

        dchunk, suffix = jax.lax.cond(
            (jnp.max(carry_T) > config.transmittance_min) & (cnt > c * S),
            heavy, skip, suffix,
        )
        d_ref[b, :, c * S:(c + 1) * S] = dchunk


# --------------------------------------------------------------------------
# XLA-side packing and the public op with custom VJP
# --------------------------------------------------------------------------


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _tile_counts(valid):
    """[T, 1] int32 occupied-prefix length per tile (ranks are contiguous)."""
    return jnp.sum(valid > 0, axis=1, dtype=jnp.int32)[:, None]


def _pack_params(g, valid, tile_origin, K_pad):
    """[T, K, 10] global-coord entry params -> [T, 16, K_pad] channel-major
    with tile-LOCAL means (small magnitudes keep the quadratic exact)."""
    local_m = g[..., 0:2] - tile_origin[:, None, :]
    rows = jnp.concatenate(
        [local_m, g[..., 2:10], valid[..., None]], axis=-1
    )                                                          # [T, K, 11]
    p = jnp.transpose(rows, (0, 2, 1))                         # [T, 11, K]
    return _pad_axis(_pad_axis(p, _NCH, 1), K_pad, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def composite_tiles_pallas(
    g,            # [T, K, 10] gathered entry params (global coords)
    valid,        # [T, K] float mask
    tile_origin,  # [T, 2] pixel origin of each tile
    ts: int,
    config: RasterizeConfig,
):
    """Per-tile front-to-back compositing. Returns (rgb [T,P,3], alpha [T,P],
    depth [T,P]) with P = ts*ts (row-major pixels)."""
    return _fwd_impl(g, valid, tile_origin, ts, config)


def _fwd_impl(g, valid, tile_origin, ts, config):
    T0, K = valid.shape
    P = ts * ts
    S = _CHUNK
    K_pad = ((K + S - 1) // S) * S
    n_chunks = K_pad // S
    B = _BLOCK
    T_pad = ((T0 + B - 1) // B) * B

    params = _pad_axis(_pack_params(g, valid, tile_origin, K_pad), T_pad, 0)
    counts = _pad_axis(_tile_counts(valid), T_pad, 0)
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
    )(counts, params)
    return out[:T0, :, 0:3], out[:T0, :, 4], out[:T0, :, 3]


def _fwd_rule(g, valid, tile_origin, ts, config):
    out = _fwd_impl(g, valid, tile_origin, ts, config)
    return out, (g, valid, tile_origin)


def _bwd_rule(ts, config, residuals, cotangents):
    g, valid, tile_origin = residuals
    g_rgb, g_alpha, g_depth = cotangents
    T0, K = valid.shape
    P = ts * ts
    S = _CHUNK
    K_pad = ((K + S - 1) // S) * S
    n_chunks = K_pad // S
    B = _BLOCK
    T_pad = ((T0 + B - 1) // B) * B

    params = _pad_axis(_pack_params(g, valid, tile_origin, K_pad), T_pad, 0)
    counts = _pad_axis(_tile_counts(valid), T_pad, 0)
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
    )(counts, params, ct)

    d_rows = jnp.transpose(d_params[:T0, :, :K], (0, 2, 1))    # [T, K, 16]
    # Tile-local means shift by a constant per tile: d(local)/d(global) = 1.
    d_g = d_rows[..., 0:10]
    return d_g, jnp.zeros_like(valid), jnp.zeros_like(tile_origin)


composite_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)
