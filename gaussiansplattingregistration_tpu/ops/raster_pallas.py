"""Pallas TPU kernels for the tile-compositing hot loop.

The XLA reference path (`ops/rasterize.py`) materializes [tiles, K, pixels]
alpha tensors in HBM chunk by chunk; these kernels stream K in chunks of
`_CHUNK` entries through VMEM with a flash-attention-style structure:

* grid = (tile-blocks, K-chunks); each grid step covers `_TILES_PER_STEP`
  tiles (an inner fori_loop) so block DMAs are large enough to amortize
  latency, while only ONE tile's [S, P] working set is live at a time;
* Pallas iterates chunks innermost, so per-tile-block output blocks are
  revisited and accumulated in VMEM while per-tile running
  log-transmittance rows live in scratch;
* alpha evaluation + within-chunk prefix scan (Hillis–Steele via pltpu.roll —
  Mosaic has no cumsum) + weighted color reduction (a [P,S]x[S,3] MXU matmul)
  are fused per chunk;
* the backward is hand-written (gsplat's CUDA backward uses atomics; TPUs
  have none): a first kernel sweeps front-to-back storing per-chunk
  transmittance carries, a second sweeps chunks in REVERSE grid order
  accumulating the suffix statistic, producing per-tile-entry gradients
  [T, K, ...]; the scatter back to splats is the VJP of the XLA gather that
  fed the kernel — atomics-free by construction (SURVEY.md §7 hard part #1).

Key identity for the backward (front-to-back compositing):
  out = sum_k w_k c_k,     w_k = a_k T_k,  T_k = prod_{j<k} (1 - a_j)
  dL/da_k = T_k (dL/dw_k) - S_k / (1 - a_k),
  S_k = sum_{j>k} (dL/dw_j) w_j   (a suffix sum along the depth axis).

All kernels run in interpret mode automatically on CPU (tests), compiled on
TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig

_CHUNK = 128          # K-chunk streamed through VMEM per grid step
_TILES_PER_STEP = 8   # tiles per grid step (DMA amortization)
_CARRY_ROWS = 8       # sublane padding for per-chunk carry rows
_VMEM_LIMIT = 100 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pixel_grid(ts: int, dtype):
    """[P] pixel-center offsets of a ts x ts tile (row-major: y*ts + x)."""
    p = ts * ts
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    px = (idx % ts).astype(dtype) + 0.5
    py = (idx // ts).astype(dtype) + 0.5
    return px, py


def _origin(tile_base, b, ts: int, tiles_x: int, ty_offset: int, dtype):
    """Pixel origin of tile (tile_base + b); tile_base = program_id(0) * B,
    hoisted out of the fori_loop (program_id cannot be staged inside it)."""
    tile_id = tile_base + b
    ox = (tile_id % tiles_x) * ts
    oy = (tile_id // tiles_x + ty_offset) * ts
    return jnp.asarray(ox, dtype), jnp.asarray(oy, dtype)


def _prefix_sum_axis0(x):
    """Inclusive prefix sum along axis 0 via Hillis–Steele doubling."""
    k = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, shift=s, axis=0)
        x = x + jnp.where(row >= s, shifted, 0.0)
        s *= 2
    return x


def _suffix_sum_axis0(x):
    """Inclusive suffix sum along axis 0 (reverse prefix sum)."""
    k = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < k:
        # Circular roll by (k - s) == backward shift by s (negative shifts
        # are rejected by pltpu.roll).
        shifted = pltpu.roll(x, shift=k - s, axis=0)
        x = x + jnp.where(row < k - s, shifted, 0.0)
        s *= 2
    return x


def _chunk_alpha(m2d, conic, op, valid, px, py, ox, oy, config):
    """Alpha [S, P] for one K-chunk of per-entry params (shared fwd/bwd)."""
    dx = (px + ox)[None, :] - m2d[:, 0:1]                # [S, P]
    dy = (py + oy)[None, :] - m2d[:, 1:2]
    sigma = (
        0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
        + conic[:, 1:2] * dx * dy
    )
    exp_term = jnp.exp(-jnp.maximum(sigma, 0.0))
    raw_alpha = op[:, None] * exp_term
    alpha = jnp.minimum(raw_alpha, config.alpha_max)
    visible = (alpha >= config.alpha_clip) & (sigma >= 0.0) & (valid[:, None] > 0)
    alpha = jnp.where(visible, alpha, 0.0)
    return alpha, raw_alpha, exp_term, sigma, dx, dy, visible


def _row1(ref, b):
    """Dynamic leading-dim read: ref[b] with traced b, keeping rank."""
    return ref[pl.ds(b, 1)]


def _fwd_kernel(m2d_ref, conic_ref, op_ref, color_ref, depth_ref, valid_ref,
                rgb_ref, alpha_ref, depth_out_ref, carry_ref,
                *, ts: int, tiles_x: int, ty_offset: int,
                config: RasterizeConfig):
    c = pl.program_id(1)
    tile_base = pl.program_id(0) * _TILES_PER_STEP
    dtype = m2d_ref.dtype
    px, py = _pixel_grid(ts, dtype)

    @pl.when(c == 0)
    def _():
        rgb_ref[...] = jnp.zeros_like(rgb_ref)
        alpha_ref[...] = jnp.zeros_like(alpha_ref)
        depth_out_ref[...] = jnp.zeros_like(depth_out_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)

    def tile_body(b, _):
        ox, oy = _origin(tile_base, b, ts, tiles_x, ty_offset, dtype)
        alpha, _, _, _, _, _, _ = _chunk_alpha(
            _row1(m2d_ref, b)[0], _row1(conic_ref, b)[0],
            _row1(op_ref, b)[0, :, 0], _row1(valid_ref, b)[0, :, 0],
            px, py, ox, oy, config,
        )
        log_t = jnp.log1p(-alpha)
        incl = _prefix_sum_axis0(log_t)
        S = alpha.shape[0]
        T = jnp.exp(carry_ref[pl.ds(b, 1)] + incl - log_t)   # exclusive
        w = jnp.where(T > config.transmittance_min, alpha * T, 0.0)

        rgb_ref[pl.ds(b, 1)] += jnp.dot(
            w.T, _row1(color_ref, b)[0], preferred_element_type=jnp.float32
        )[None]
        alpha_ref[pl.ds(b, 1), :, 0] += jnp.sum(w, axis=0)[None]
        depth_out_ref[pl.ds(b, 1), :, 0] += jnp.sum(
            w * _row1(depth_ref, b)[0, :, 0][:, None], axis=0
        )[None]
        carry_ref[pl.ds(b, 1)] += incl[S - 1:S]
        return 0

    jax.lax.fori_loop(0, m2d_ref.shape[0], tile_body, 0)


def _carry_kernel(m2d_ref, conic_ref, op_ref, valid_ref, carries_ref, carry_ref,
                  *, ts: int, tiles_x: int, ty_offset: int,
                  config: RasterizeConfig):
    """Pass 1 of the backward: store the EXCLUSIVE per-chunk transmittance
    carry (log-T at the start of chunk c) into carries[tile, c]."""
    c = pl.program_id(1)
    tile_base = pl.program_id(0) * _TILES_PER_STEP
    dtype = m2d_ref.dtype
    px, py = _pixel_grid(ts, dtype)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)
        carries_ref[...] = jnp.zeros_like(carries_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, carries_ref.shape[1:], 0)

    def tile_body(b, _):
        ox, oy = _origin(tile_base, b, ts, tiles_x, ty_offset, dtype)
        # One-hot masked accumulate instead of a dynamic sublane store.
        carries_ref[pl.ds(b, 1)] += jnp.where(
            rows == c, carry_ref[pl.ds(b, 1)], 0.0
        )[None]
        alpha, _, _, _, _, _, _ = _chunk_alpha(
            _row1(m2d_ref, b)[0], _row1(conic_ref, b)[0],
            _row1(op_ref, b)[0, :, 0], _row1(valid_ref, b)[0, :, 0],
            px, py, ox, oy, config,
        )
        log_t = jnp.log1p(-alpha)
        incl = _prefix_sum_axis0(log_t)
        S = alpha.shape[0]
        carry_ref[pl.ds(b, 1)] += incl[S - 1:S]
        return 0

    jax.lax.fori_loop(0, m2d_ref.shape[0], tile_body, 0)


def _bwd_kernel(m2d_ref, conic_ref, op_ref, color_ref, depth_ref, valid_ref,
                g_rgb_ref, g_alpha_ref, g_depth_ref, carries_ref,
                d_m2d_ref, d_conic_ref, d_op_ref, d_color_ref, d_depth_ref,
                carry_s_ref,
                *, ts: int, tiles_x: int, ty_offset: int, n_chunks: int,
                config: RasterizeConfig):
    """Pass 2: chunks arrive in REVERSE order (index maps flip c), the suffix
    statistic accumulates in scratch."""
    c_rev = pl.program_id(1)             # processing chunk n_chunks-1-c_rev
    tile_base = pl.program_id(0) * _TILES_PER_STEP
    chunk = n_chunks - 1 - c_rev
    dtype = m2d_ref.dtype
    px, py = _pixel_grid(ts, dtype)

    @pl.when(c_rev == 0)
    def _():
        carry_s_ref[...] = jnp.zeros_like(carry_s_ref)

    def tile_body(b, _):
        ox, oy = _origin(tile_base, b, ts, tiles_x, ty_offset, dtype)
        m2d = _row1(m2d_ref, b)[0]
        conic = _row1(conic_ref, b)[0]
        alpha, raw_alpha, exp_term, sigma, dx, dy, visible = _chunk_alpha(
            m2d, conic, _row1(op_ref, b)[0, :, 0],
            _row1(valid_ref, b)[0, :, 0], px, py, ox, oy, config,
        )
        log_t = jnp.log1p(-alpha)
        incl = _prefix_sum_axis0(log_t)
        crows = jax.lax.broadcasted_iota(
            jnp.int32, carries_ref.shape[1:], 0
        )
        carry_in = jnp.sum(
            jnp.where(crows == chunk, carries_ref[pl.ds(b, 1)][0], 0.0),
            axis=0, keepdims=True,
        )
        T = jnp.exp(carry_in + incl - log_t)
        w = jnp.where(T > config.transmittance_min, alpha * T, 0.0)
        live = jnp.where((T > config.transmittance_min) & visible, 1.0, 0.0)

        g_rgb = _row1(g_rgb_ref, b)[0]          # [P, 3]
        g_alpha = _row1(g_alpha_ref, b)[0, :, 0]
        g_depth = _row1(g_depth_ref, b)[0, :, 0]
        dldw = (
            jnp.dot(_row1(color_ref, b)[0], g_rgb.T,
                    preferred_element_type=jnp.float32)
            + g_alpha[None, :]
            + _row1(depth_ref, b)[0, :, 0][:, None] * g_depth[None, :]
        )
        dw_w = dldw * w
        S_within = _suffix_sum_axis0(dw_w) - dw_w
        S_total = S_within + carry_s_ref[pl.ds(b, 1)]
        dlda = live * (T * dldw - S_total / jnp.maximum(1.0 - alpha, 1e-6))
        carry_s_ref[pl.ds(b, 1)] += jnp.sum(dw_w, axis=0, keepdims=True)

        unclamped = jnp.where(raw_alpha < config.alpha_max, 1.0, 0.0)
        dldraw = dlda * unclamped
        d_op_ref[pl.ds(b, 1), :, 0] = jnp.sum(dldraw * exp_term, axis=1)[None]
        dldsigma = -dldraw * raw_alpha * jnp.where(sigma > 0.0, 1.0, 0.0)

        d_conic_ref[pl.ds(b, 1)] = jnp.stack(
            [
                0.5 * jnp.sum(dldsigma * dx * dx, axis=1),
                jnp.sum(dldsigma * dx * dy, axis=1),
                0.5 * jnp.sum(dldsigma * dy * dy, axis=1),
            ],
            axis=-1,
        )[None]
        ddx = dldsigma * (conic[:, 0:1] * dx + conic[:, 1:2] * dy)
        ddy = dldsigma * (conic[:, 2:3] * dy + conic[:, 1:2] * dx)
        d_m2d_ref[pl.ds(b, 1)] = jnp.stack(
            [-jnp.sum(ddx, axis=1), -jnp.sum(ddy, axis=1)], axis=-1
        )[None]
        d_color_ref[pl.ds(b, 1)] = jnp.dot(
            w, g_rgb, preferred_element_type=jnp.float32
        )[None]
        d_depth_ref[pl.ds(b, 1), :, 0] = jnp.sum(
            w * g_depth[None, :], axis=1
        )[None]
        return 0

    jax.lax.fori_loop(0, m2d_ref.shape[0], tile_body, 0)


# --------------------------------------------------------------------------
# Block-spec helpers
# --------------------------------------------------------------------------

def _entry_spec(S: int, c: int, reverse_chunks: int = 0):
    """Block over [T, K, c]: one K-chunk of _TILES_PER_STEP tiles per step."""
    B = _TILES_PER_STEP
    if reverse_chunks:
        C = reverse_chunks
        return pl.BlockSpec((B, S, c), lambda t, j: (t, C - 1 - j, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((B, S, c), lambda t, j: (t, j, 0),
                        memory_space=pltpu.VMEM)


def _tile_spec(shape):
    """Per-tile-block output revisited across the chunk axis."""
    B = _TILES_PER_STEP
    return pl.BlockSpec((B,) + shape, lambda t, j: (t,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# --------------------------------------------------------------------------
# Public op with custom VJP
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def composite_tiles_pallas(
    m2d,       # [T, K, 2]
    conic,     # [T, K, 3]
    op,        # [T, K]
    color,     # [T, K, 3]
    depth,     # [T, K]
    valid,     # [T, K] float mask
    ts: int,
    tiles_x: int,
    ty_offset: int,
    config: RasterizeConfig,
):
    """Per-tile front-to-back compositing. Tile i of the grid covers pixel
    origin ((i % tiles_x) * ts, (i // tiles_x + ty_offset) * ts). Returns
    (rgb [T,P,3], alpha [T,P], depth [T,P]) with P = ts*ts."""
    return _fwd_impl(m2d, conic, op, color, depth, valid, ts, tiles_x,
                     ty_offset, config)


def _prepare(m2d, conic, op, color, depth, valid):
    T0, K = op.shape
    S = min(_CHUNK, K)
    K_pad = ((K + S - 1) // S) * S
    B = _TILES_PER_STEP
    T_pad = ((T0 + B - 1) // B) * B
    args = (m2d, conic, op[..., None], color, depth[..., None], valid[..., None])
    args = tuple(
        _pad_axis(_pad_axis(a, K_pad, 1), T_pad, 0) for a in args
    )
    return args, T0, T_pad, K, K_pad, S


def _fwd_impl(m2d, conic, op, color, depth, valid, ts, tiles_x, ty_offset, config):
    (m2d, conic, op3, color, depth3, valid3), T0, T_pad, K, K_pad, S = _prepare(
        m2d, conic, op, color, depth, valid
    )
    P = ts * ts
    n_chunks = K_pad // S
    B = _TILES_PER_STEP

    kernel = functools.partial(
        _fwd_kernel, ts=ts, tiles_x=tiles_x, ty_offset=ty_offset, config=config
    )
    rgb, alpha, dep = pl.pallas_call(
        kernel,
        grid=(T_pad // B, n_chunks),
        in_specs=[
            _entry_spec(S, 2), _entry_spec(S, 3), _entry_spec(S, 1),
            _entry_spec(S, 3), _entry_spec(S, 1), _entry_spec(S, 1),
        ],
        out_specs=(_tile_spec((P, 3)), _tile_spec((P, 1)), _tile_spec((P, 1))),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, P, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, P), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_params(),
    )(m2d, conic, op3, color, depth3, valid3)
    return rgb[:T0], alpha[:T0, :, 0], dep[:T0, :, 0]


def _fwd_rule(m2d, conic, op, color, depth, valid, ts, tiles_x, ty_offset, config):
    out = _fwd_impl(m2d, conic, op, color, depth, valid, ts, tiles_x, ty_offset, config)
    return out, (m2d, conic, op, color, depth, valid)


def _bwd_rule(ts, tiles_x, ty_offset, config, residuals, cotangents):
    m2d_r, conic_r, op_r, color_r, depth_r, valid_r = residuals
    g_rgb, g_alpha, g_depth = cotangents
    (m2d, conic, op3, color, depth3, valid3), T0, T_pad, K, K_pad, S = _prepare(
        m2d_r, conic_r, op_r, color_r, depth_r, valid_r
    )
    P = ts * ts
    n_chunks = K_pad // S
    chunk_rows = max(n_chunks, _CARRY_ROWS)
    B = _TILES_PER_STEP

    g_rgb = _pad_axis(g_rgb, T_pad, 0)
    g_alpha3 = _pad_axis(g_alpha[..., None], T_pad, 0)
    g_depth3 = _pad_axis(g_depth[..., None], T_pad, 0)

    # Pass 1: per-chunk exclusive transmittance carries [T, chunk_rows, P].
    carry_kernel = functools.partial(
        _carry_kernel, ts=ts, tiles_x=tiles_x, ty_offset=ty_offset, config=config
    )
    carries = pl.pallas_call(
        carry_kernel,
        grid=(T_pad // B, n_chunks),
        in_specs=[
            _entry_spec(S, 2), _entry_spec(S, 3), _entry_spec(S, 1),
            _entry_spec(S, 1),
        ],
        out_specs=_tile_spec((chunk_rows, P)),
        out_shape=jax.ShapeDtypeStruct((T_pad, chunk_rows, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, P), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_params(),
    )(m2d, conic, op3, valid3)

    # Pass 2: reversed chunk order, suffix carry in scratch.
    bwd_kernel = functools.partial(
        _bwd_kernel, ts=ts, tiles_x=tiles_x, ty_offset=ty_offset,
        n_chunks=n_chunks, config=config,
    )
    rev = n_chunks
    d_m2d, d_conic, d_op, d_color, d_depth = pl.pallas_call(
        bwd_kernel,
        grid=(T_pad // B, n_chunks),
        in_specs=[
            _entry_spec(S, 2, rev), _entry_spec(S, 3, rev), _entry_spec(S, 1, rev),
            _entry_spec(S, 3, rev), _entry_spec(S, 1, rev), _entry_spec(S, 1, rev),
            _tile_spec((P, 3)), _tile_spec((P, 1)), _tile_spec((P, 1)),
            _tile_spec((chunk_rows, P)),
        ],
        out_specs=(
            _entry_spec(S, 2, rev), _entry_spec(S, 3, rev), _entry_spec(S, 1, rev),
            _entry_spec(S, 3, rev), _entry_spec(S, 1, rev),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, K_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, K_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, K_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, K_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, K_pad, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, P), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_params(),
    )(m2d, conic, op3, color, depth3, valid3,
      g_rgb, g_alpha3, g_depth3, carries)

    return (
        d_m2d[:T0, :K], d_conic[:T0, :K], d_op[:T0, :K, 0],
        d_color[:T0, :K], d_depth[:T0, :K, 0], None,
    )


composite_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)
