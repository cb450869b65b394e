"""Differentiable tile-based 3DGS rasterizer (JAX/XLA reference pipeline).

Replaces the gsplat CUDA rasterizer the reference wraps
(`/root/reference/src/utils/rasterization_util.py:10-31`) with a TPU-first
design. Matches the gsplat configuration the reference uses: explicit 3D
covariances, RGB render mode, SH-based view-dependent color, background
blending, `radius_clip=3` culling.

Pipeline (all static shapes, jit/grad/shard-friendly):

1. projection: EWA splatting Σ2D = J W Σ Wᵀ Jᵀ (+0.3 px low-pass as 3DGS);
2. tile binning: each splat emits up to `max_tiles_per_splat` (tile, depth)
   entries (bounded coverage instead of CUDA's dynamic duplication);
3. ONE `lax.sort` over a fused u32 key (tile id | order-preserving
   float-bit depth) replaces the CUDA 64-bit radix sort; per-tile ranks come
   from a cummax over run boundaries and land in a dense [tiles, K] entry
   table via a unique-index scatter (`_build_tile_table`) — no per-tile
   binary search, and truncation keeps the front-most K splats per tile;
4. a single wide gather pulls per-entry params into the table layout
   (`gather_entries`); its custom VJP inverts the table with one more sort
   and GATHERS cotangents — XLA's duplicate-index scatter-add (~100 ns/row,
   serialized on TPU) never appears in the backward;
5. compositing: instead of a sequential front-to-back loop with early exit,
   per-tile transmittance is an exclusive cumulative sum of log(1 - alpha)
   along the depth axis — a parallel scan the VPU eats — followed by a
   weighted reduction. Alpha compositing is associative in log-transmittance,
   which is also what makes the multi-chip ppermute merge possible
   (see parallel/sharded_raster.py).

The whole forward is differentiable by construction (sort indices are
integer-only, gradients flow through the gathers), so `jax.grad` provides the
backward pass; hand-written Pallas kernels for the hot composite stage live
in ops/raster_pallas.py (backend="pallas").
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops import math3d, sh as sh_ops


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterization configuration (hashable, used as jit static arg)."""

    tile_size: int = 16
    max_tiles_per_splat: int = 16     # bounded tile coverage per splat
    max_splats_per_tile: int = 256    # top-K front-most splats composited
    tile_chunk: int = 16              # tiles composited per lax.map step
    radius_clip: float = 3.0          # cull tiny splats (gsplat radius_clip=3)
    near: float = 0.01                # near-plane cull
    eps2d: float = 0.3                # 2D low-pass (3DGS convention)
    alpha_clip: float = 1.0 / 255.0   # minimum visible alpha (3DGS)
    alpha_max: float = 0.999          # saturating alpha (3DGS)
    transmittance_min: float = 1e-4   # early-termination threshold (3DGS)
    backend: str = "xla"              # "xla" (lax.map chunks) | "pallas" (fused kernels)
    # Backward-transport cap: only the first `max_bwd_splats_per_tile` depth
    # ranks of each tile carry gradients back to splats. EXACT whenever every
    # tile's early-termination horizon (the rank at which all of its pixels
    # saturate, T <= transmittance_min) is <= the cap — gradients past the
    # horizon are identically zero. None = max_splats_per_tile (always
    # exact). When a tile's horizon exceeds the cap its tail gradients are
    # dropped; `rasterize_arrays_with_stats` counts such tiles
    # (`bwd_cap_violations`).
    max_bwd_splats_per_tile: Optional[int] = None
    # Static cap on PROCESSED tile rows (pallas backend): with occupancy-
    # ordered table rows, all-empty tiles sort to the tail; rows past
    # `max_live_tiles` are skipped by the gather, the transport sort, and
    # the kernels and composite to exact background. EXACT whenever the
    # scene/view has <= max_live_tiles non-empty tiles; violations (a live
    # tile beyond the cap) are counted in `live_tile_overflow`
    # (rasterize_arrays_with_stats) — the bounded-coverage idiom. None = all
    # tiles. Bench-scale measurement: ~35% of the headline scene's tiles are
    # empty yet paid full transport (~6 ns/row gather on dead slots).
    max_live_tiles: Optional[int] = None
    # Round per-entry cotangents to bf16 for the backward gradient transport
    # (the 11-operand sort's bytes halve AND the landing's run-selector dots
    # become exact single-pass bf16 MXU dots instead of 6-pass HIGHEST —
    # summing bf16 values in the f32 accumulator is exact). Gradients gain
    # <= 2^-9 relative rounding per entry BEFORE the <= C-row landing sum;
    # the f32-vs-bf16 equivalence is pinned in
    # tests/test_rasterize.py::test_bf16_cotangent_transport_close_to_f32.
    bwd_sort_bf16: bool = False


DEFAULT_CONFIG = RasterizeConfig()


def project_gaussians(
    means: jax.Array,        # [N, 3]
    cov3d: jax.Array,        # [N, 6] packed
    viewmat: jax.Array,      # [4, 4]
    intrinsics: jax.Array,   # [3, 3]
    width: int,
    height: int,
    config: RasterizeConfig = DEFAULT_CONFIG,
):
    """EWA projection of 3D Gaussians to screen space.

    Returns dict with means2d [N,2], conic [N,3] (a,b,c of the inverse 2D
    covariance), depth [N], radius [N], valid [N].
    """
    W = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_view = means @ W.T + t                      # [N, 3]
    z = p_view[:, 2]

    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]

    zc = jnp.maximum(z, config.near)              # guarded z for the math
    x, y = p_view[:, 0], p_view[:, 1]
    means2d = jnp.stack([fx * x / zc + cx, fy * y / zc + cy], axis=-1)

    # 3DGS clamps the tangent-plane extent to 1.3 * fov before the Jacobian.
    lim_x = 1.3 * (width / 2.0) / fx
    lim_y = 1.3 * (height / 2.0) / fy
    tx = zc * jnp.clip(x / zc, -lim_x, lim_x)
    ty = zc * jnp.clip(y / zc, -lim_y, lim_y)

    # Camera-frame covariance: conjugation by W is LINEAR in the packed
    # covariance, so M6 = cov6 @ A(W) is one [N,6]x[6,6] matmul (MXU) instead
    # of N tiny 3x3 products (which XLA lowers to slow per-splat loops).
    basis = jnp.zeros((6, 3, 3), cov3d.dtype)
    iu = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for s, (i, j) in enumerate(iu):
        basis = basis.at[s, i, j].set(1.0).at[s, j, i].set(1.0)
    conj = W[None] @ basis @ W.T[None]             # [6, 3, 3]
    A = jnp.stack([math3d.pack_symmetric(conj[s]) for s in range(6)])  # [6, 6]
    M = cov3d @ A                                  # [N, 6] packed W Σ Wᵀ
    m00, m01, m02, m11, m12, m22 = (M[:, i] for i in range(6))

    # cov2d = J M Jᵀ with J = [[a1, 0, b1], [0, a2, b2]] — pure VPU math.
    a1 = fx / zc
    b1 = -fx * tx / (zc * zc)
    a2 = fy / zc
    b2 = -fy * ty / (zc * zc)
    a = a1 * a1 * m00 + 2.0 * a1 * b1 * m02 + b1 * b1 * m22 + config.eps2d
    b = a1 * a2 * m01 + a1 * b2 * m02 + a2 * b1 * m12 + b1 * b2 * m22
    c = a2 * a2 * m11 + 2.0 * a2 * b2 * m12 + b2 * b2 * m22 + config.eps2d
    det = a * c - b * b
    det = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Radius: 3 sigma of the larger eigenvalue (3DGS formula).
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    inside = (
        (means2d[:, 0] + radius > 0)
        & (means2d[:, 0] - radius < width)
        & (means2d[:, 1] + radius > 0)
        & (means2d[:, 1] - radius < height)
    )
    valid = (z > config.near) & (radius > config.radius_clip) & inside

    return {
        "means2d": means2d,
        "conic": conic,
        "depth": z,
        "radius": jnp.where(valid, radius, 0.0),
        "valid": valid,
    }


def compute_view_colors(
    features: jax.Array,     # [N, K, 3]
    means: jax.Array,        # [N, 3]
    cam_center: jax.Array,   # [3]
    sh_degree: int,
) -> jax.Array:
    """View-dependent RGB from SH (3DGS: eval + 0.5, clamped at 0)."""
    dirs = math3d.normalize(means - cam_center[None, :])
    rgb = sh_ops.eval_sh(sh_degree, features, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def _align_runs_conv(vals: jax.Array, starts: jax.Array, counts: jax.Array,
                     num_tiles: int, K: int) -> jax.Array:
    """[T, K] table[t, k] = vals[starts[t] + k], masked to -1 past counts[t].

    The per-tile runs are CONTIGUOUS in the depth-sorted order, so each row
    is a K-slice at an arbitrary offset. A direct XLA gather lowers to 1.84M
    serialized scalar loads (~13 ms at bench scale); instead this gathers
    whole 128-wide ROWS covering each window (fast: row gathers run near HBM
    bandwidth) and aligns within the window with ONE exact bf16 convolution
    on the MXU (~1 ms): out[t, k] = sum_s onehot[t, s] * win[t, s + k], a
    per-tile-kernel conv via batch_group_count. Exactness: vals are split
    into three byte planes scaled by (1, 2^8, 2^16) — every bf16 operand is
    an integer < 256 or a power of two, products and the single-nonzero sums
    are exact in the f32 accumulator (requires vals < 2^24 — entry ids;
    checked in `_build_tile_table`).
    """
    R = 128
    E = vals.shape[0]
    E_pad = ((E + R - 1) // R) * R
    if E_pad != E:
        vals = jnp.pad(vals, (0, E_pad - E))   # pad rows are masked by counts
    n_wrows = (K + R - 1) // R + 1             # covers offset (<R) + K
    W = n_wrows * R
    v2 = vals.reshape(E_pad // R, R)
    r0 = starts // R
    rows = v2[jnp.minimum(
        r0[:, None] + jnp.arange(n_wrows, dtype=jnp.int32)[None, :],
        E_pad // R - 1,
    )]                                                      # [T, W/R, R]
    win = rows.reshape(num_tiles, W)
    b0 = (win & 255).astype(jnp.bfloat16)
    b1 = ((win >> 8) & 255).astype(jnp.bfloat16)
    b2 = ((win >> 16) & 255).astype(jnp.bfloat16)
    lhs = jnp.stack([b0, b1, b2], axis=1)                   # [T, 3, W]
    onehot = (
        jnp.arange(R, dtype=jnp.int32)[None, :] == (starts % R)[:, None]
    ).astype(jnp.bfloat16)
    scale = jnp.array([1.0, 256.0, 65536.0], jnp.bfloat16)
    rhs = onehot[:, None, :] * scale[None, :, None]         # [T, 3, R]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        batch_group_count=num_tiles,
        preferred_element_type=jnp.float32,
    )                                                       # [1, T, K+1]
    ids = jnp.round(out[0, :, :K]).astype(jnp.int32)
    kcol = jnp.arange(K, dtype=jnp.int32)[None, :]
    return jnp.where(kcol < counts[:, None], ids, -1)


def _cumsum_flat_mxu(bits: jax.Array) -> jax.Array:
    """Inclusive cumsum of a 0/1 vector [E] -> int32 [E], MXU-based.

    `jnp.cumsum`/`lax.cummax` over a 4M flat axis lower to a log-pass
    reduce-window (~1.5 ms at bench scale); this reshapes to [E/512, 512],
    does the within-row inclusive scan as ONE [R,512]@[512,512] triangular
    matmul, and adds exclusive row offsets from a tiny [R] cumsum. Exact in
    the f32 accumulator: products are 0/1 and row sums <= 512 << 2^24
    (total count must stay < 2^24 — entry counts are, guarded upstream).
    """
    S = 512
    E = bits.shape[0]
    Ep = -(-E // S) * S
    x2 = jnp.pad(bits.astype(jnp.float32), (0, Ep - E)).reshape(Ep // S, S)
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    tri = (r <= c).astype(jnp.float32)
    within = jax.lax.dot_general(
        x2, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                       # [R, S]
    totals = within[:, S - 1]
    offs = jnp.cumsum(totals) - totals                      # exclusive [R]
    return (within + offs[:, None]).astype(jnp.int32).reshape(-1)[:E]


def _gather_rows_flat(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Row-permute with the trailing dims FLATTENED first: a gather of
    [T, P, ch] slices reads (P, ch)-tiled lane-tiles at ch/128 utilization
    (profiled 2.07 ms for ch=8 at bench scale); as [T, P*ch] wide rows the
    same permutation is a plain row gather (~0.05 ms)."""
    flat = x.reshape(x.shape[0], -1)
    return flat[perm].reshape(x.shape)


@jax.custom_vjp
def _permute_rows(x: jax.Array, perm: jax.Array, inv_perm: jax.Array):
    """x[perm] with a gather-only VJP: the cotangent of a PERMUTATION gather
    is the inverse-permutation gather (autodiff's generic transpose would
    emit a serialized XLA scatter instead)."""
    return _gather_rows_flat(x, perm)


def _permute_rows_fwd(x, perm, inv_perm):
    return _gather_rows_flat(x, perm), inv_perm


def _permute_rows_bwd(inv_perm, ct):
    return _gather_rows_flat(ct, inv_perm), None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _build_tile_table(
    means2d: jax.Array,
    radius: jax.Array,
    depth: jax.Array,
    valid: jax.Array,
    tiles_x: int,
    tiles_y: int,
    config: RasterizeConfig,
    ty_offset: int = 0,
    tiles_y_window: Optional[int] = None,
    with_stats: bool = False,
):
    """Build the per-tile table [num_tiles, K] of depth-sorted SPLAT ids.

    Each splat emits up to C = max_tiles_per_splat entries (entry id
    = splat_id * C + c); entries are sorted ONCE by a fused u32 key
    (tile_id in the high bits, monotonically quantized depth in the low
    bits — the float-bit trick: for positive f32, bit pattern order equals
    value order), then each entry's rank within its tile run is derived from
    a cummax over run boundaries and the entry's SPLAT id lands in
    table[tile, rank] — via a unique-index scatter (xla backend) or via
    run-contiguity + the conv-align row gather (`_align_runs_conv`, pallas
    backend, ~12x faster at bench scale). Replaces CUDA-style 64-bit radix
    sort + per-tile range binary search with one 32-bit sort + O(E) vector
    ops.

    Invalid entries get tile_id = num_tiles and are dropped. Coverage beyond
    C tiles and tile occupancy beyond K are truncated (bounded-coverage
    contract; truncation keeps the FRONT-most K because the sort is by
    depth).

    `ty_offset`/`tiles_y_window` restrict binning to a horizontal tile slab
    (rows [ty_offset, ty_offset + tiles_y_window)) with tile ids local to
    the slab — the unit of tile-sharding across devices
    (parallel/sharded_raster.py).

    Returns (table [num_tiles, K] int32 ENTRY ids (splat_id * C + c) with -1
    for empty slots, sorted_entry, live [E] bool (entry present in the
    table and within the first KB backward ranks), counts [num_tiles] int32
    post-truncation occupancy, order, build_stats). On the pallas backend
    the table/counts ROWS are permuted into descending-occupancy order and
    `order` is that permutation ([T] int32, table row r = tile order[r]) —
    kernel blocks then have homogeneous occupancy and chunk-skipping does
    occupancy-proportional work; consumers restore image order with one
    [T]-row gather (`order=None` on the xla backend: identity order).
    build_stats is None unless `with_stats`, else a dict of truncation
    counters (see `rasterize_arrays_with_stats`). Consumers derive splat ids
    as `table // C`; the entry ids are what the gradient transport needs
    (`gather_entries`' VJP sorts cotangent rows by entry id).
    """
    n = means2d.shape[0]
    ts = float(config.tile_size)
    if tiles_y_window is None:
        tiles_y_window = tiles_y
    num_tiles = tiles_x * tiles_y_window
    if config.backend == "pallas" and n * config.max_tiles_per_splat > (1 << 24):
        raise ValueError(
            "entry ids exceed the exact-bf16-conv range (2^24); "
            "shard the splat axis (parallel/sharded_raster.py) instead"
        )

    tx0 = jnp.clip(jnp.floor((means2d[:, 0] - radius) / ts), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((means2d[:, 1] - radius) / ts), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((means2d[:, 0] + radius) / ts), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((means2d[:, 1] + radius) / ts), 0, tiles_y - 1).astype(jnp.int32)
    w = tx1 - tx0 + 1
    h = ty1 - ty0 + 1

    C = config.max_tiles_per_splat
    c = jnp.arange(C, dtype=jnp.int32)[None, :]          # [1, C]
    # Coverage clipping: when a splat touches more than C tiles, keep the
    # w_eff x h_eff sub-window CENTERED on the tile containing its
    # projected mean — not the row-major first C (which loses the BOTTOM
    # rows wholesale: measured 40.3 dB vs a C=8 oracle at bench scale,
    # where the centered window keeps the tiles that actually carry the
    # splat's mass).
    s_eff = max(1, int(math.isqrt(C)))
    w_eff = jnp.minimum(w, s_eff)
    h_eff = jnp.minimum(h, C // jnp.maximum(w_eff, 1))
    clipped = (w * h) > C
    mtx = jnp.clip(
        jnp.floor(means2d[:, 0] / ts), 0, tiles_x - 1
    ).astype(jnp.int32)
    mty = jnp.clip(
        jnp.floor(means2d[:, 1] / ts), 0, tiles_y - 1
    ).astype(jnp.int32)
    ox = jnp.clip(mtx - tx0 - (w_eff - 1) // 2, 0, w - w_eff)
    oy = jnp.clip(mty - ty0 - (h_eff - 1) // 2, 0, h - h_eff)
    w_use = jnp.where(clipped, w_eff, w)
    h_use = jnp.where(clipped, h_eff, h)
    ox = jnp.where(clipped, ox, 0)
    oy = jnp.where(clipped, oy, 0)
    dx = c % w_use[:, None] + ox[:, None]
    dy = c // w_use[:, None] + oy[:, None]
    local_ty = ty0[:, None] + dy - ty_offset
    entry_valid = (
        (c < (w_use * h_use)[:, None]) & valid[:, None]
        & (local_ty >= 0) & (local_ty < tiles_y_window)
    )
    tile_id = local_ty * tiles_x + (tx0[:, None] + dx)
    tile_id = jnp.where(entry_valid, tile_id, num_tiles).astype(jnp.int32)

    # Fused sort key: tile id (high bits) | quantized depth (low bits).
    # Depth keeps the top `depth_bits` bits of the f32 pattern (8-bit exponent
    # + the top depth_bits-9 mantissa bits): at 8k tiles that is ~9 mantissa
    # bits, i.e. depths within a relative ~2^-10 of each other may collide.
    # Colliding entries composite in entry-id order — DETERMINISTIC because
    # the entry iota is the second sort key — a bounded, documented deviation from an exact
    # 64-bit (tile, depth) sort; alpha blending of near-equal-depth splats is
    # insensitive to their relative order at this granularity.
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    if depth_bits < 8:
        raise ValueError(f"too many tiles for fused sort key: {num_tiles}")
    # Positive-float bit trick: keep the top `depth_bits` bits of the f32
    # pattern (sign 0 for depth > near) — order-preserving quantization.
    dq = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 0.0).astype(jnp.float32), jnp.uint32
    ) >> (32 - depth_bits)
    key = (tile_id.astype(jnp.uint32) << depth_bits) | dq[:, None]

    # Materialize the fused key ONCE before flattening: without the barrier
    # XLA's reshape-mover pushes the [N,C]->[E] reshape up through the key
    # arithmetic, splitting it into ~6 broadcast+relayout pairs of [N,C]
    # intermediates (profiled ~8 ms at bench scale vs ~1.5 ms for one
    # materialize + one relayout).
    key = jax.lax.optimization_barrier(key)
    # Flatten the key COLUMN-major: XLA lays the materialized [N, C] key out
    # column-major ({0,1}), so the n-major flatten costs a full relayout
    # copy (~1.5 ms at bench scale) while the c-major flatten is free. The
    # sort is input-order-agnostic — the explicit entry-id column (still
    # the n-major id n*C + c) rides along and ties still break by entry id
    # (it is the second sort key by VALUE).
    flat_key = key.T.reshape(-1)
    E = n * C
    j = jnp.arange(E, dtype=jnp.int32)
    flat_entry = (j % n) * C + (j // n)

    # num_keys=2: the entry iota doubles as the tie-breaking key, giving
    # exactly stable-sort order without XLA's hidden stability iota (a third
    # 4M column, measured 2.5 ms at bench scale).
    sorted_key, sorted_entry = jax.lax.sort(
        (flat_key, flat_entry), num_keys=2, is_stable=False
    )
    sorted_tiles = (sorted_key >> depth_bits).astype(jnp.int32)

    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tiles[1:] != sorted_tiles[:-1]]
    )
    K = config.max_splats_per_tile
    KB = K
    if config.max_bwd_splats_per_tile is not None:
        KB = min(config.max_bwd_splats_per_tile, K)
    if config.backend == "pallas":
        # Per-entry table liveness (rank < KB, valid tile) WITHOUT the rank
        # itself: rank(i) < KB iff a run boundary falls in (i-KB, i], i.e.
        # B(i) - B(i-KB) >= 1 with B = inclusive boundary cumsum — one MXU
        # triangular matmul (_cumsum_flat_mxu) instead of the flat-axis
        # cummax reduce-window (~1.5 ms at bench scale).
        Bc = _cumsum_flat_mxu(boundary)
        if KB >= E:
            in_window = jnp.ones((E,), bool)    # every rank < E <= KB
        else:
            Bs = jnp.concatenate(
                [jnp.zeros((KB,), jnp.int32), Bc[:-KB]]
            )
            in_window = (Bc - Bs) >= 1
        live = in_window & (sorted_tiles < num_tiles)
        # Tile runs are contiguous in the sorted order: recover each run's
        # start with a binary search (22 gathers over [T] queries) and slice
        # each run out with the row-gather + exact-conv alignment
        # (_align_runs_conv) — neither an XLA scatter (serializes per row)
        # nor an XLA element gather (1.84M scalar loads, ~13 ms) appears.
        bounds = jnp.searchsorted(
            sorted_tiles, jnp.arange(num_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        runs = bounds[1:] - bounds[:-1]
        counts = jnp.minimum(runs, K)
        # OCCUPANCY ORDER: emit table rows sorted by descending tile
        # occupancy. The Pallas kernels chunk-skip at BLOCK granularity
        # (gated on the block's max count, raster_pallas._BLOCK tiles per
        # grid step); in image order a block's max tracks a high quantile
        # of the count distribution, so nearly every block pays for K. With
        # homogeneous blocks the per-block max tracks the per-block MEAN —
        # the kernels do occupancy-proportional work. The permutation is a
        # [T]-element sort + [T]-row gathers here, and ONE [T]-row gather
        # per output to restore image order (tiles_to_image); the gradient
        # transport is order-blind (it sorts by entry id globally).
        order = jnp.argsort(-counts).astype(jnp.int32)
        counts = counts[order]
        table = _align_runs_conv(sorted_entry, bounds[:-1][order], counts,
                                 num_tiles, K)
    else:
        # XLA path: the scatter build needs per-entry ranks/slots anyway, so
        # derive liveness from them (the cummax cost is irrelevant here).
        idx = jnp.arange(E, dtype=jnp.int32)
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        rank = idx - seg_start
        dest = jnp.where(
            (rank < K) & (sorted_tiles < num_tiles),
            sorted_tiles * K + rank,
            # Dropped entries get GENUINELY unique out-of-bounds slots
            # (num_tiles*K + position): XLA's unique_indices promise makes
            # duplicate indices undefined behavior even in drop mode.
            num_tiles * K + idx,
        )
        live = (rank < KB) & (sorted_tiles < num_tiles)
        table = jnp.full(num_tiles * K, -1, jnp.int32).at[dest].set(
            sorted_entry, unique_indices=True, mode="drop"
        ).reshape(num_tiles, K)
        counts = jnp.sum(table >= 0, axis=1, dtype=jnp.int32)
        runs = None
        order = None
    build_stats = None
    if with_stats:
        if runs is None:  # xla path: recover pre-truncation run lengths
            bounds = jnp.searchsorted(
                sorted_tiles, jnp.arange(num_tiles + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            runs = bounds[1:] - bounds[:-1]
        build_stats = {
            # valid splats whose tile coverage exceeds C: their trailing
            # tiles are skipped (bounded-coverage contract)
            "coverage_clipped_splats": jnp.sum(
                valid & ((w * h) > C)
            ).astype(jnp.int32),
            # tiles whose occupancy exceeded K: their back-most splats were
            # dropped (front-most kept — the sort is by depth)
            "overflow_tiles": jnp.sum(runs > K).astype(jnp.int32),
            "dropped_entries": jnp.sum(
                jnp.maximum(runs - K, 0)
            ).astype(jnp.int32),
            "total_entries": jnp.sum(runs).astype(jnp.int32),
            # largest pre-truncation tile run: the K an exact (untruncated)
            # render of this scene/view needs
            "max_run": jnp.max(runs).astype(jnp.int32),
        }
    return table, sorted_entry, live, counts, order, build_stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gather_entries(
    packed: jax.Array,        # [N, F]
    table: jax.Array,         # [T, K] ENTRY ids (splat * C + c) or -1
    sorted_entry: jax.Array,  # [N*C] entry ids in sorted-key order
    live: jax.Array,          # [N*C] bool per sorted entry: in table & < KB
    C: int,
    k_bwd: Optional[int] = None,
    sort_bf16: bool = False,
) -> jax.Array:
    """Gather per-splat rows [N, F] into the CHANNEL-MAJOR tile table layout
    [T, F, K] — the layout the Pallas composite kernels consume and emit, so
    the custom-VJP boundary sits exactly at the kernel's cotangent: no
    [T,K,F] <-> [T,F,K] transpose ever materializes in the backward (profiled
    30 ms as an XLA transpose custom-call at bench scale; the forward's
    transpose fuses INTO the gather).

    The backward is the hard part on TPU (SURVEY.md §7 hard part #1): CUDA
    accumulates per-splat gradients with atomics; XLA's scatter runs ~100
    ns/row serialized (profiled 46 ms for 0.46M rows) and a plain inverse-
    permutation gather costs ~12 ns/row with no locality to exploit
    (profiled 46-77 ms at bench scale). The VJP here lands cotangents with
    sorts + one MXU matmul instead — no scatter, no big random gather:

    1. (optionally) cap the cotangent table at the first `k_bwd` depth ranks
       per tile — exact whenever every tile's early-termination horizon
       <= k_bwd (gradients past the horizon are identically zero; see
       RasterizeConfig.max_bwd_splats_per_tile);
    2. sort the [T*KB] cotangent rows by their ENTRY id (table carries entry
       ids), an 11-operand 1-pass value sort — cotangent rows land grouped
       by splat, depth-major within splat;
    3. recover each entry's position in that sorted stream: a 2-column sort
       of (sorted_entry, live-bit) gives per-entry liveness in dense entry
       order, and its exclusive cumsum is exactly the position (entries of
       one splat are consecutive ids, so positions are window-local);
    4. land with ONE batched one-hot matmul per 128-splat block
       ([128, C*128+128] selector x [window, F] rows, MXU, HIGHEST): the
       selector folds the <=C live entries of each splat in the same
       contraction — the [N, C, F] reshape-sum never materializes.
    """
    splat = jnp.where(table >= 0, table // C, 0)
    g = packed[splat] * (table >= 0).astype(packed.dtype)[..., None]
    return jnp.transpose(g, (0, 2, 1))


def _gather_entries_fwd(packed, table, sorted_entry, live, C, k_bwd,
                        sort_bf16):
    out = gather_entries(packed, table, sorted_entry, live, C, k_bwd,
                         sort_bf16)
    return out, (table, sorted_entry, live, packed.shape[0])


def _land_rows(R2, pos0, cnt, n, C, F, block=64):
    """d_packed[n] = sum of rows [pos0[n], pos0[n] + cnt[n]) — each splat's
    live cotangent rows are CONSECUTIVE in the sorted stream — via windowed
    multi-hot MXU dots (the run selector folds the <= C rows of one splat in
    the same contraction; no separate shift-add fold pass).

    `pos0` is non-decreasing with increments <= C, so the `block` output
    rows' source runs lie in a window of C*(block+1) + 128 rows — gather
    whole 128-row panels per block and select with an exact 0/1 operand
    (HIGHEST keeps the selected f32 values f32-grade; each output sums
    <= C rows, like the f32 fold it replaces). A plain XLA row gather costs
    ~12 ns/row (~12 ms for 1M rows) with no locality to exploit; this runs
    at the memory cost of the [nb, block, W] selector."""
    n_panel_rows = R2.shape[0]
    # The block's source runs end before pos0[block_start] + block*C, and
    # pos0[block_start] - base < 128, so W = C*block + 128 rows (rounded up
    # to whole 128-row panels) covers every run. Extra panel rows are
    # clamped in-range and never selected (the run mask matches only
    # positions in the panel's range).
    W = -(-(C * block + 128) // 128) * 128
    nb = -(-n // block)
    pos0 = jnp.pad(pos0, (0, nb * block - n))
    cnt = jnp.pad(cnt, (0, nb * block - n))
    posb = pos0.reshape(nb, block)
    cntb = cnt.reshape(nb, block)
    base = (posb[:, 0] // 128) * 128                          # [nb] aligned
    loc = posb - base[:, None]                                # [nb, block]
    end = loc + cntb                                          # exclusive
    iota = jnp.arange(128, dtype=jnp.int32)
    out = jnp.zeros((nb, block, F), jnp.float32)
    # bf16 rows: the 0/1 selector and the values are both exactly
    # representable, and the MXU accumulates in f32 — ONE pass is exact
    # w.r.t. the (already-rounded) bf16 rows. f32 rows need HIGHEST to stay
    # f32-grade (Mosaic/XLA bf16x6).
    bf16_rows = R2.dtype == jnp.bfloat16
    prec = None if bf16_rows else jax.lax.Precision.HIGHEST
    for p in range(W // 128):
        rows_p = jnp.minimum(base // 128 + p, n_panel_rows - 1)
        win_p = R2[rows_p].reshape(nb, 128, F)
        pi = iota[None, None, :] + p * 128
        runmask = (
            (pi >= loc[:, :, None]) & (pi < end[:, :, None])
        ).astype(R2.dtype)
        out = out + jax.lax.dot_general(
            runmask, win_p,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    return out.reshape(nb * block, F)[:n]


def _gather_entries_bwd(C, k_bwd, sort_bf16, residuals, ct):
    table, sorted_entry, live_s, n = residuals
    T, K = table.shape
    F = ct.shape[1]   # ct is channel-major [T, F, K]
    KB = K if k_bwd is None else min(k_bwd, K)
    # `live_s` is computed at table-build time against the FULL tile count
    # (regression guard: under `max_live_tiles` the table rows are an
    # occupancy-ordered PREFIX, so no slot-id arithmetic against
    # table.shape[0] can decide liveness — a live tile with a high image id
    # would be miscounted dead and the whole landing would misalign, every
    # splat after the first miss getting another splat's cotangents; the
    # cap contract (live_tile_overflow == 0, hard-gated in bench.py)
    # guarantees every live entry's tile is present in the capped table).
    M = T * KB
    M_pad = ((M + 127) // 128) * 128

    # 2. Sort cotangent rows by entry id (dead slots last via the sentinel).
    # The [T, F, K] cotangent arrives channel-major straight from the Pallas
    # bwd kernel; each sort operand is a contiguous per-channel [T, KB] slab.
    # With sort_bf16 the value columns are rounded to bf16 and PAIRED into
    # u32 operands (bit-exact pack/unpack): the TPU variadic sort's cost is
    # per-OPERAND, not per-byte (measured 7.7 ms for key + 10 bf16 columns
    # vs key + 10 f32 — identical), so 11 operands -> 6 is the lever.
    eid = table[:, :KB].reshape(-1)
    key = jnp.where(eid >= 0, eid.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    if sort_bf16:
        cols_bf = [
            jax.lax.bitcast_convert_type(
                ct[:, f, :KB].reshape(-1).astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            for f in range(F)
        ]
        if F % 2:
            cols_bf.append(jnp.zeros((M,), jnp.uint32))
        cols = tuple(
            cols_bf[i] | (cols_bf[i + 1] << 16)
            for i in range(0, len(cols_bf), 2)
        )
    else:
        cols = tuple(ct[:, f, :KB].reshape(-1) for f in range(F))
    # is_stable=False: live keys are unique entry ids and dead-sentinel rows
    # are all-zero, so order among equals is irrelevant — a stable sort makes
    # XLA carry a hidden iota tiebreaker column (~2 ms at bench scale).
    sorted_all = jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)
    if sort_bf16:
        unpacked = []
        for c32 in sorted_all[1:]:
            unpacked.append(jax.lax.bitcast_convert_type(
                (c32 & 0xFFFF).astype(jnp.uint16), jnp.bfloat16))
            unpacked.append(jax.lax.bitcast_convert_type(
                (c32 >> 16).astype(jnp.uint16), jnp.bfloat16))
        R_rows = jnp.stack(unpacked[:F], axis=-1)            # [M, F] bf16
    else:
        R_rows = jnp.stack(sorted_all[1:], axis=-1)          # [M, F]
    if M_pad != M:
        R_rows = jnp.pad(R_rows, ((0, M_pad - M), (0, 0)))

    # 4. Per-entry liveness in dense entry order -> per-splat live count
    # (strided windows, NOT strided slices: pos[::C] lowers to a ~18
    # ns/element gather, ~18 ms at bench scale) -> position of each splat's
    # first live row by exclusive cumsum over splats.
    # Single-operand u32 sort: entry ids are a PERMUTATION of [0, N*C), so
    # sorting (entry_id << 1 | live) orders by entry id with the live bit
    # riding in the LSB — one 4M u32 column instead of key + value column
    # (~3.5 ms cheaper at bench scale). Entry ids < 2^24 (guarded in
    # _build_tile_table), so the shift never overflows.
    packed_k = (
        (sorted_entry.astype(jnp.uint32) << 1) | live_s.astype(jnp.uint32)
    )
    live_dense = (
        jax.lax.sort((packed_k,), num_keys=1, is_stable=False)[0] & 1
    ).astype(jnp.int32)
    E = live_dense.shape[0]
    if C <= 128 and 128 % C == 0 and E % 128 == 0:
        # Lane-group reduction on the MXU: view [E] as [E/128, 128] (lane-
        # aligned retiling, cheap) and fold each group of C consecutive
        # lanes with one [128, 128/C] 0/1 matmul — the [E] -> [N, C]
        # reshape-sum relayout alone profiled 1.5 + 0.7 ms at bench scale.
        live2 = live_dense.reshape(E // 128, 128).astype(jnp.bfloat16)
        G = (
            (jnp.arange(128)[:, None] // C)
            == jnp.arange(128 // C)[None, :]
        ).astype(jnp.bfloat16)
        cnt = jnp.dot(
            live2, G, preferred_element_type=jnp.float32
        ).reshape(-1).astype(jnp.int32)                      # [N]
    else:
        # Reshape-sum, NOT reduce_window: the strided window lowers with a
        # [E,1]{0,1:T(1,128)} layout (1-sublane tiles, profiled 1.78 ms at
        # bench scale); the [N, C] row reduction fuses at bandwidth.
        cnt = jnp.sum(live_dense.reshape(-1, C), axis=1)     # [N]
    pos0 = (jnp.cumsum(cnt) - cnt).astype(jnp.int32)         # exclusive

    # 5. Windowed RUN-selector landing: each splat's <= C live rows are
    # consecutive in the sorted stream starting at pos0; the multi-hot
    # selector folds them inside the same MXU contraction (no separate
    # shift-add fold pass).
    return (
        _land_rows(R_rows.reshape(M_pad // 128, 128 * F), pos0, cnt,
                   n, C, F).astype(ct.dtype),
        None, None, None,
    )


gather_entries.defvjp(_gather_entries_fwd, _gather_entries_bwd)


def _composite_chunk(
    tile_origin: jax.Array,   # [B, 2] pixel origin of each tile
    g: jax.Array,             # [B, K, 10] gathered entry params
    entry_valid: jax.Array,   # [B, K]
    config: RasterizeConfig,
):
    """Front-to-back alpha compositing of K depth-sorted splats over a chunk
    of B tiles (tile_size² pixels each) via exclusive log-transmittance cumsum.

    `g` packs (means2d 2, conic 3, opacity 1, color 3, depth 1) per entry.
    Returns (rgb [B, P, 3], alpha [B, P], depth [B, P]) with P = tile_size².
    """
    ts = config.tile_size
    B, K = entry_valid.shape
    m = g[..., 0:2]                 # [B, K, 2]
    co = g[..., 2:5]                # [B, K, 3]
    op = g[..., 5]                  # [B, K]
    col = g[..., 6:9]               # [B, K, 3]
    dep = g[..., 9]                 # [B, K]

    # Pixel centers of the tile, [P, 2].
    py, px = jnp.meshgrid(
        jnp.arange(ts, dtype=m.dtype) + 0.5,
        jnp.arange(ts, dtype=m.dtype) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # [P, 2]
    pix = tile_origin[:, None, :] + pix[None, :, :]             # [B, P, 2]

    d = pix[:, None, :, :] - m[:, :, None, :]                   # [B, K, P, 2]
    dx2 = d[..., 0] * d[..., 0]
    dy2 = d[..., 1] * d[..., 1]
    dxdy = d[..., 0] * d[..., 1]
    sigma = (
        0.5 * (co[:, :, None, 0] * dx2 + co[:, :, None, 2] * dy2)
        + co[:, :, None, 1] * dxdy
    )                                                            # [B, K, P]
    alpha = op[:, :, None] * jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(alpha, config.alpha_max)
    visible = (alpha >= config.alpha_clip) & entry_valid[:, :, None] & (sigma >= 0.0)
    alpha = jnp.where(visible, alpha, 0.0)

    # Exclusive cumulative log-transmittance along the (depth-sorted) K axis.
    log_t = jnp.log1p(-alpha)
    log_T_incl = jnp.cumsum(log_t, axis=1)
    log_T_excl = log_T_incl - log_t                              # exclusive
    T = jnp.exp(log_T_excl)
    # 3DGS early termination: stop once transmittance falls below 1e-4.
    w = jnp.where(T > config.transmittance_min, alpha * T, 0.0)  # [B, K, P]

    rgb = jnp.einsum("bkp,bkc->bpc", w, col)
    acc_alpha = jnp.sum(w, axis=1)                               # [B, P]
    acc_depth = jnp.einsum("bkp,bk->bp", w, dep)
    return rgb, acc_alpha, acc_depth


def rasterize_tile_slab(
    means2d: jax.Array,
    conic: jax.Array,
    depth: jax.Array,
    radius: jax.Array,
    valid: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    tiles_x: int,
    tiles_y: int,
    config: RasterizeConfig,
    ty_offset: int = 0,
    tiles_y_window: Optional[int] = None,
    with_stats: bool = False,
):
    """Bin + sort + composite projected splats over a horizontal tile slab.

    Returns (rgb [win_h, W, 3], alpha [win_h, W], depth [win_h, W]) where
    win_h = tiles_y_window * tile_size and W = tiles_x * tile_size (callers
    crop to the true image width/height). This is the per-device unit of the
    tile-sharded multi-chip rasterizer. With `with_stats`, returns a fourth
    element: the truncation-counter dict of `rasterize_arrays_with_stats`.
    """
    ts = config.tile_size
    if tiles_y_window is None:
        tiles_y_window = tiles_y
    num_tiles = tiles_x * tiles_y_window

    op = opacity * valid.astype(opacity.dtype)
    table, sorted_entry, entry_live, counts, order, build_stats = _build_tile_table(
        means2d, radius, depth, valid, tiles_x, tiles_y, config,
        ty_offset=ty_offset, tiles_y_window=tiles_y_window,
        with_stats=with_stats,
    )                                                         # [T, K]
    tile_entry_valid = table >= 0

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_origin = jnp.stack(
        [(tile_ids % tiles_x) * ts, (tile_ids // tiles_x + ty_offset) * ts],
        axis=-1,
    ).astype(means2d.dtype)
    if order is not None:
        # Table rows are in descending-occupancy order (see
        # _build_tile_table): use matching origins, and restore image order
        # on the composited outputs with one [T]-row gather.
        tile_origin = tile_origin[order]

    P = ts * ts
    K = config.max_splats_per_tile
    if config.backend == "pallas":
        from gaussiansplattingregistration_tpu.ops import raster_pallas

        # One wide packed gather emitting channel-major [T,10,K] (the fwd
        # transpose fuses INTO the gather; the custom-VJP boundary is in the
        # kernel's native layout so the backward has no transpose at all —
        # a materialized transpose custom-call costs ~30 ms at bench scale).
        # No valid channel: the gather's mask multiply zeroes opacity for
        # empty slots, which kills alpha in the kernel.
        packed = jnp.concatenate(
            [means2d, conic, op[:, None], colors, depth[:, None]], axis=-1
        )                                                     # [N, 10]
        # Occupancy-ordered rows put all-empty tiles at the tail: the cap
        # (config.max_live_tiles) drops them from the gather, the kernels,
        # and the whole gradient transport; their pixels are exact
        # background. Violations are counted below.
        T_live = num_tiles
        if config.max_live_tiles is not None:
            T_live = min(num_tiles, -(-config.max_live_tiles // 8) * 8)
        table_l = table[:T_live]
        counts_l = counts[:T_live]
        gT = gather_entries(
            packed, table_l, sorted_entry, entry_live,
            config.max_tiles_per_splat,
            config.max_bwd_splats_per_tile, config.bwd_sort_bf16,
        )                                                     # [T_live, 10, K]
        # Tile-LOCAL means keep the quadratic form exact in f32.
        origin10 = jnp.zeros((T_live, 10), means2d.dtype)
        origin10 = origin10.at[:, 0].set(tile_origin[:T_live, 0])
        origin10 = origin10.at[:, 1].set(tile_origin[:T_live, 1])
        gT = gT - origin10[:, :, None]
        rgb, alpha, depthmap, live = raster_pallas.composite_tiles_pallas(
            gT, counts_l[:, None].astype(means2d.dtype), ts, config
        )
        if T_live < num_tiles:
            padr = num_tiles - T_live
            rgb = jnp.pad(rgb, ((0, padr), (0, 0), (0, 0)))
            alpha = jnp.pad(alpha, ((0, padr), (0, 0)))
            depthmap = jnp.pad(depthmap, ((0, padr), (0, 0)))
            live = jnp.pad(live, ((0, padr),))
        # Restore image (tile-id) order: one [T]-row gather per output.
        # custom-vjp because the autodiff transpose of a gather is an XLA
        # scatter (serialized, ~2 ms here); the inverse of a permutation
        # gather is just the forward permutation's gather.
        inv_order = jnp.argsort(order)
        rgb = _permute_rows(rgb, inv_order, order)
        alpha = _permute_rows(alpha, inv_order, order)
        depthmap = _permute_rows(depthmap, inv_order, order)
    else:
        # One wide packed gather instead of six row gathers — TPU gathers
        # are per-row latency-bound, so fusing the columns is ~6x cheaper.
        packed = jnp.concatenate(
            [means2d, conic, op[:, None], colors, depth[:, None]], axis=-1
        )                                                     # [N, 10]
        g = jnp.transpose(gather_entries(
            packed, table, sorted_entry, entry_live,
            config.max_tiles_per_splat,
            config.max_bwd_splats_per_tile, config.bwd_sort_bf16,
        ), (0, 2, 1))                                         # [T, K, 10]
        B = config.tile_chunk
        pad = (-num_tiles) % B
        tile_origin_p = jnp.pad(tile_origin, ((0, pad), (0, 0)))
        g_p = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
        tile_valid_p = jnp.pad(tile_entry_valid, ((0, pad), (0, 0)))

        # Remat: recompute the per-chunk compositing in the backward pass
        # instead of storing [B, K, P] residuals for every chunk — trades one
        # recompute for O(T*K*P) HBM, which is what makes 1M-splat backward fit.
        @jax.checkpoint
        def chunk_fn(args):
            origin, gc, svalid = args
            return _composite_chunk(origin, gc, svalid, config)

        n_chunks = (num_tiles + pad) // B
        rgb, alpha, depthmap = jax.lax.map(
            chunk_fn,
            (
                tile_origin_p.reshape(n_chunks, B, 2),
                g_p.reshape(n_chunks, B, K, 10),
                tile_valid_p.reshape(n_chunks, B, K),
            ),
        )
        rgb = rgb.reshape(num_tiles + pad, P, 3)[:num_tiles]
        alpha = alpha.reshape(num_tiles + pad, P)[:num_tiles]
        depthmap = depthmap.reshape(num_tiles + pad, P)[:num_tiles]
        live = None   # xla path composites every occupied slot

    if with_stats:
        KB = config.max_bwd_splats_per_tile
        KB = K if KB is None else min(KB, K)
        if live is not None:
            live_i = jax.lax.stop_gradient(live).astype(jnp.int32)
            effective = jnp.minimum(counts, live_i)
            live_stats = {
                # tiles whose early-termination horizon exceeds the backward
                # cap: their tail gradients are dropped (see RasterizeConfig
                # .max_bwd_splats_per_tile)
                "bwd_cap_violations": jnp.sum(effective > KB).astype(jnp.int32),
                "max_live": jnp.max(effective).astype(jnp.int32),
                "mean_live": jnp.mean(effective.astype(jnp.float32)),
            }
        else:
            # xla backend has no per-tile horizon output; report the
            # conservative bound (occupancy).
            live_stats = {
                "bwd_cap_violations": jnp.sum(counts > KB).astype(jnp.int32),
                "max_live": jnp.max(counts).astype(jnp.int32),
                "mean_live": jnp.mean(counts.astype(jnp.float32)),
            }
        stats = dict(build_stats or {})
        stats.update(live_stats)
        stats["max_count"] = jnp.max(counts).astype(jnp.int32)
        if config.backend == "pallas":
            T_cap = num_tiles
            if config.max_live_tiles is not None:
                T_cap = min(num_tiles, -(-config.max_live_tiles // 8) * 8)
            # live tiles past the processed-row cap: their pixels rendered
            # as background (raise max_live_tiles if nonzero)
            stats["live_tile_overflow"] = jnp.sum(
                counts[T_cap:] > 0
            ).astype(jnp.int32)

    def tiles_to_image(tiles, ch):
        img = tiles.reshape(tiles_y_window, tiles_x, ts, ts, ch)
        return img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y_window * ts, tiles_x * ts, ch
        )

    out = (
        tiles_to_image(rgb, 3),
        tiles_to_image(alpha[..., None], 1)[..., 0],
        tiles_to_image(depthmap[..., None], 1)[..., 0],
    )
    return out + (stats,) if with_stats else out


@functools.partial(
    jax.jit, static_argnames=("width", "height", "sh_degree", "config")
)
def rasterize_arrays(
    means: jax.Array,
    cov3d: jax.Array,
    opacity: jax.Array,       # [N] activated (sigmoid applied)
    features: jax.Array,      # [N, K, 3] SH stack (DC first)
    viewmat: jax.Array,
    intrinsics: jax.Array,
    width: int,
    height: int,
    sh_degree: int,
    background: jax.Array,    # [3]
    config: RasterizeConfig = DEFAULT_CONFIG,
):
    """Core functional rasterizer over raw arrays.

    Returns (rgb [H, W, 3], alpha [H, W], depth [H, W]).
    """
    ts = config.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)

    proj = project_gaussians(means, cov3d, viewmat, intrinsics, width, height, config)

    cam_center = -(viewmat[:3, :3].T @ viewmat[:3, 3])
    colors = compute_view_colors(features, means, cam_center, sh_degree)

    img_rgb, img_alpha, img_depth = rasterize_tile_slab(
        proj["means2d"], proj["conic"], proj["depth"], proj["radius"],
        proj["valid"], colors, opacity, tiles_x, tiles_y, config,
    )
    img_rgb = img_rgb[:height, :width]
    img_alpha = img_alpha[:height, :width]
    img_depth = img_depth[:height, :width]

    img_rgb = img_rgb + (1.0 - img_alpha[..., None]) * background[None, None, :]
    return img_rgb, img_alpha, img_depth


@functools.partial(
    jax.jit, static_argnames=("width", "height", "sh_degree", "config")
)
def rasterize_arrays_with_stats(
    means: jax.Array,
    cov3d: jax.Array,
    opacity: jax.Array,
    features: jax.Array,
    viewmat: jax.Array,
    intrinsics: jax.Array,
    width: int,
    height: int,
    sh_degree: int,
    background: jax.Array,
    config: RasterizeConfig = DEFAULT_CONFIG,
):
    """`rasterize_arrays` plus the truncation/termination counters.

    The rasterizer trades CUDA's dynamic allocation for static bounds
    (SURVEY.md §7 hard part #2); this is the observability contract for
    those bounds. Returns (rgb, alpha, depth, stats) with stats a dict of
    scalars:

    - coverage_clipped_splats: valid splats covering more than
      `max_tiles_per_splat` tiles — their trailing tiles are skipped.
    - overflow_tiles / dropped_entries / total_entries: tiles whose
      occupancy exceeded `max_splats_per_tile`; the back-most (deepest)
      entries are dropped, front-most kept.
    - bwd_cap_violations: tiles whose early-termination horizon exceeds
      `max_bwd_splats_per_tile` — their gradient tails are dropped
      (pallas backend; the xla backend reports the conservative occupancy
      bound).
    - max_live / mean_live: per-tile early-termination horizon (entries
      composited before every pixel saturated; chunk-granular).
    - max_count: maximum post-truncation tile occupancy.

    Zero counters == the static bounds were exact for this scene/view.
    """
    ts = config.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)

    proj = project_gaussians(means, cov3d, viewmat, intrinsics, width, height, config)
    cam_center = -(viewmat[:3, :3].T @ viewmat[:3, 3])
    colors = compute_view_colors(features, means, cam_center, sh_degree)

    img_rgb, img_alpha, img_depth, stats = rasterize_tile_slab(
        proj["means2d"], proj["conic"], proj["depth"], proj["radius"],
        proj["valid"], colors, opacity, tiles_x, tiles_y, config,
        with_stats=True,
    )
    img_rgb = img_rgb[:height, :width]
    img_alpha = img_alpha[:height, :width]
    img_depth = img_depth[:height, :width]
    img_rgb = img_rgb + (1.0 - img_alpha[..., None]) * background[None, None, :]
    return img_rgb, img_alpha, img_depth, stats


def rasterize(
    cloud,
    camera,
    background=(0.0, 0.0, 0.0),
    scaling_modifier: float = 1.0,
    config: RasterizeConfig = DEFAULT_CONFIG,
):
    """Render a GaussianCloud from a Camera.

    Counterpart of `rasterize_image`
    (`/root/reference/src/utils/rasterization_util.py:10-31`): explicit
    scale-modified covariances, sigmoid opacity, SH features, background
    color. Returns (rgb [H, W, 3], alpha [H, W], depth [H, W]).
    """
    bg = jnp.asarray(background, jnp.float32)
    return rasterize_arrays(
        cloud.xyz,
        cloud.get_covariance(scaling_modifier),
        cloud.get_opacity[:, 0],
        cloud.get_features,
        camera.viewmat,
        camera.intrinsics,
        camera.width,
        camera.height,
        cloud.sh_degree,
        bg,
        config,
    )
