"""Nearest-neighbor search, TPU-style: static shapes, MXU-friendly distances.

The reference delegates neighbor search to Open3D KD-trees and a C++ spatial
hash grid (`/root/reference/src/cpp_ext/src/pointindex.cpp:55-143`). Neither
maps to TPUs: instead distances are computed as blocked Gram matrices
(|q|^2 + |d|^2 - 2 q·d — a matmul, which XLA tiles onto the MXU) with top-k
selection, everything static-shaped and jittable. For the sizes registration
runs at after downsampling (1e4-1e6 points), a blocked dense sweep at HBM
bandwidth beats a pointer-chasing tree; the block size bounds memory at
O(block * N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pairwise_sqdist(q: jax.Array, d: jax.Array) -> jax.Array:
    """[Bq, D] x [N, D] -> [Bq, N] squared distances.

    Computed per-coordinate as (q_i - d_j)^2 sums on the VPU, NOT via the
    Gram-matrix trick: a K=3 matmul wastes the MXU anyway (K padded to 128)
    and — worse — TPU matmuls default to bf16, whose ~0.8% relative error
    swamps the distance between close points (observed: nearest-neighbor
    RMSE 0.065 on exactly-overlapping clouds). The difference form is exact
    in f32 and fully fusable.

    High-dimensional queries (FPFH descriptors, D=33) do use the MXU via the
    Gram trick, but at Precision.HIGHEST (f32-accurate multi-pass)."""
    if q.shape[-1] <= 4:
        acc = None
        for c in range(q.shape[-1]):
            diff = q[:, c:c + 1] - d[None, :, c]
            term = diff * diff
            acc = term if acc is None else acc + term
        return acc
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    d2 = jnp.sum(d * d, axis=-1)[None, :]
    cross = jnp.dot(q, d.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(q2 + d2 - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "block_size", "approx"))
def knn(
    query: jax.Array,
    data: jax.Array,
    k: int,
    block_size: int = 1024,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each query point in `data`.

    Returns (sq_distances [Q, k], indices [Q, k]), sorted ascending by
    distance. Both shapes are static; queries are processed in blocks of
    `block_size` via `lax.map` to bound the [block, N] distance tile.

    `approx=True` selects with `lax.approx_max_k` (TPU PartialReduce,
    recall_target 0.95) instead of exact `lax.top_k` — profiled 2.5 vs
    24.5 ms per [1024, 200k] k=32 block on v5e, measured recall 0.975.
    Engaged only on TPU at large N (the exact path is fine elsewhere);
    callers whose K-neighborhood is already a documented truncation (HEM's
    fixed-K candidate lists) opt in.
    """
    n_query = query.shape[0]
    pad = (-n_query) % block_size
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, block_size, query.shape[1])
    use_approx = (
        approx and data.shape[0] >= 32_768
        and jax.default_backend() == "tpu"
    )

    def one_block(qb):
        # MATERIALIZE the distance tile before top_k: XLA otherwise fuses
        # the distance expression INTO its multi-pass top-k selection and
        # re-evaluates it ~k times (profiled 23 ms/block at [1024, 200k]
        # k=32 fused vs ~2 ms materialized — 4.6 of HEM's 5.6 s/level).
        d2 = jax.lax.optimization_barrier(_pairwise_sqdist(qb, data))
        if use_approx:
            neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
        else:
            neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2s, idxs = jax.lax.map(one_block, blocks)
    d2s = d2s.reshape(-1, k)[:n_query]
    idxs = idxs.reshape(-1, k)[:n_query]
    return d2s, idxs


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def hybrid_search(
    query: jax.Array,
    data: jax.Array,
    radius: float,
    k: int,
    block_size: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """KDTreeSearchParamHybrid analogue: k nearest within `radius`.

    Returns (sq_distances [Q, k], indices [Q, k], valid_mask [Q, k]).
    Matches the semantics Open3D's hybrid search gives the reference
    (`/root/reference/src/utils/global_registration_util.py:87-94`): at most k
    neighbors, all within radius; invalid slots are masked.
    """
    d2, idx = knn(query, data, k=k, block_size=block_size)
    valid = d2 <= radius * radius
    return d2, idx, valid


@functools.partial(jax.jit, static_argnames=("block_size",))
def nearest_neighbor(
    query: jax.Array, data: jax.Array, block_size: int = 1024
) -> tuple[jax.Array, jax.Array]:
    """Single nearest neighbor: (sq_distance [Q], index [Q]).

    NOT knn(k=1): lax.top_k is a sort-based custom call whose input cannot
    fuse, so the whole [block, N] distance tile materializes in HBM
    (~40 GB of traffic at 100k x 100k). min/argmin are plain reduces — XLA
    fuses the elementwise distance computation straight into them and the
    tile never exists in memory."""
    n_query = query.shape[0]
    pad = (-n_query) % block_size
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, block_size, query.shape[1])

    def one_block(qb):
        d2 = _pairwise_sqdist(qb, data)
        return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1).astype(jnp.int32)

    d2s, idxs = jax.lax.map(one_block, blocks)
    return d2s.reshape(-1)[:n_query], idxs.reshape(-1)[:n_query]


# --------------------------------------------------------------------------
# Grid-pruned gated nearest neighbor (the TPU counterpart of the reference's
# spatial hash grid, /root/reference/src/cpp_ext/src/pointindex.cpp:55-143,
# and of Open3D's KD-tree in local_registration_util.py:88-98).
#
# ICP only needs the nearest neighbor WITHIN max_correspondence: any true
# match lies in the query's 3x3x3 cell neighborhood once cell >= gate. The
# TPU formulation precomputes, per cell, ONE padded row holding every point
# of its 27-cell neighborhood as (x, y, z, index) — so the per-iteration
# correspondence step is ONE wide row gather [Q rows] plus a [Q, W] masked
# min/argmin, instead of a [Q, N] brute-force sweep. 100k x 100k drops from
# O(1e10) distance lanes (VPU-bound, ~37 ms) to O(Q * W) with W ~ 100.
#
# The plan is computed HOST-side (numpy, once per target/gate): it is all
# shape logic — grid dims, the neighborhood width W, memory guards — and
# produces static shapes for jit. Exactness: every in-gate candidate is in
# the table (cell >= gate, out-of-grid neighbors are empty, clipped query
# cells still cover the gate ball since out-of-grid queries have no in-gate
# match beyond the border cells). Degenerate densities (W or the table
# exceeding the memory cap) return None -> callers keep the brute path.
# --------------------------------------------------------------------------

_GRID_PAD_COORD = 1.0e9   # empty-slot coordinate: d2 ~ 1e18, never in gate


def grid_nn_plan(
    target_np,
    gate: float,
    max_table_mb: float = 512.0,
    max_cells: int = 1_000_000,
    max_w: int = 8192,
):
    """Host-side PLANNING ONLY (shape logic — microseconds): returns
    (origin [3] f32, inv_cell f32, dims (nx, ny, nz), max_occ) or None.
    The table itself is built ON DEVICE by `build_grid_table` (inside the
    caller's jit): a host-built table at 100k points is ~100 MB whose
    host->device transfer through the tunnel dwarfs the search it saves.

    Cell size: smallest power-of-2 multiple of the gate whose table
    (n_cells x 27 * max_occ slots x 16 B) fits the memory cap — coarser
    cells trade table rows for per-query candidate width, which the VPU
    eats for free up to ~10^3 candidates."""
    import numpy as np

    pts = np.asarray(target_np, np.float32)
    m = pts.shape[0]
    if m == 0 or m >= (1 << 24) or not np.isfinite(pts).all() or gate <= 0:
        return None
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo
    cell = float(gate)
    for _ in range(40):
        dims = np.minimum(np.floor(span / cell).astype(np.int64) + 1, 1 << 20)
        n_cells = int(dims.prod())
        # Average occupancy lower-bounds W; coarsening only increases it, so
        # once the average alone busts the cap no cell size can work (e.g.
        # surface scenes with a gate comparable to the bbox).
        if 27 * m / max(n_cells, 1) > max_w:
            return None
        if n_cells <= max_cells:
            c = np.floor((pts - lo) / np.float32(cell)).astype(np.int64)
            cx = np.clip(c[:, 0], 0, int(dims[0]) - 1)
            cy = np.clip(c[:, 1], 0, int(dims[1]) - 1)
            cz = np.clip(c[:, 2], 0, int(dims[2]) - 1)
            cid = (cz * dims[1] + cy) * dims[0] + cx
            max_occ = int(np.bincount(cid, minlength=n_cells).max())
            max_occ = -(-max_occ // 8) * 8
            w = 27 * max_occ
            if (
                w <= max_w
                and n_cells * w * 16 <= max_table_mb * 1e6
            ):
                return (
                    lo.astype(np.float32),
                    np.float32(1.0 / cell),
                    (int(dims[0]), int(dims[1]), int(dims[2])),
                    max_occ,
                )
        cell *= 2.0
    return None


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "nz", "max_occ")
)
def build_grid_table(
    points: jax.Array,      # [M, 3] (may include padding/dead rows)
    valid: jax.Array,       # [M] bool: rows to index (padding/dead = False)
    origin: jax.Array,
    inv_cell: jax.Array,
    nx: int, ny: int, nz: int, max_occ: int,
) -> jax.Array:
    """Device-side 27-cell candidate table [n_cells, 27 * max_occ * 4].

    Sort points by cell id, slice each cell's run out with the exact-conv
    row alignment (the rasterizer's `_align_runs_conv` — no scatters, no
    element gathers), then assemble each cell's 3x3x3 neighborhood with 27
    wide row gathers. Slot layout per cell: 27 blocks of max_occ entries of
    (x, y, z, index); empty slots carry far-away coords and index -1."""
    from gaussiansplattingregistration_tpu.ops.rasterize import (
        _align_runs_conv,
    )

    m = points.shape[0]
    n_cells = nx * ny * nz
    c = jnp.floor((points - origin[None, :]) * inv_cell).astype(jnp.int32)
    cx = jnp.clip(c[:, 0], 0, nx - 1)
    cy = jnp.clip(c[:, 1], 0, ny - 1)
    cz = jnp.clip(c[:, 2], 0, nz - 1)
    cid = (cz * ny + cy) * nx + cx
    # Invalid rows -> sentinel cell n_cells: they sort past every real run.
    cid = jnp.where(valid, cid, n_cells)
    sorted_cid, order = jax.lax.sort(
        (cid, jnp.arange(m, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    starts = jnp.searchsorted(
        sorted_cid, jnp.arange(n_cells + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    occ = jnp.minimum(starts[1:] - starts[:-1], max_occ)
    if jax.default_backend() == "tpu":
        idx_cell = _align_runs_conv(order, starts[:-1], occ, n_cells, max_occ)
    else:
        # XLA-CPU lowers the batch-grouped conv densely (~n_cells^2 work:
        # 380 GB at 19k cells); a unique-index scatter is fast there and
        # only serializes on TPU.
        idx = jnp.arange(m, dtype=jnp.int32)
        seg_start = jax.lax.cummax(
            jnp.where(
                jnp.concatenate(
                    [jnp.ones((1,), bool), sorted_cid[1:] != sorted_cid[:-1]]
                ),
                idx, 0,
            )
        )
        rank = idx - seg_start
        in_slot = (rank < max_occ) & (sorted_cid < n_cells)
        dest = jnp.where(
            in_slot, sorted_cid * max_occ + rank, n_cells * max_occ + idx
        )
        idx_cell = (
            jnp.full(n_cells * max_occ, -1, jnp.int32)
            .at[dest]
            .set(order, unique_indices=True, mode="drop")
            .reshape(n_cells, max_occ)
        )

    # Per-cell rows [n_cells + 1, max_occ * 4]; the extra row is the
    # all-empty sentinel that out-of-grid neighbors gather.
    safe = jnp.maximum(idx_cell, 0)
    rows = points[safe.reshape(-1)]                    # [n_cells*max_occ, 3]
    pts4 = jnp.concatenate(
        [rows, safe.reshape(-1, 1).astype(jnp.float32)], axis=-1
    )
    dead = (idx_cell < 0).reshape(-1, 1)
    pad_row = jnp.asarray(
        [_GRID_PAD_COORD, _GRID_PAD_COORD, _GRID_PAD_COORD, -1.0], jnp.float32
    )
    pts4 = jnp.where(dead, pad_row[None, :], pts4)
    cell_rows = jnp.concatenate(
        [
            pts4.reshape(n_cells, max_occ * 4),
            jnp.tile(pad_row, (1, max_occ)),
        ],
        axis=0,
    )                                                  # [n_cells+1, max_occ*4]

    gx = jnp.arange(nx, dtype=jnp.int32)
    gy = jnp.arange(ny, dtype=jnp.int32)
    gz = jnp.arange(nz, dtype=jnp.int32)
    CZ, CY, CX = jnp.meshgrid(gz, gy, gx, indexing="ij")
    CZ, CY, CX = CZ.reshape(-1), CY.reshape(-1), CX.reshape(-1)
    blocks = []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nzc, nyc, nxc = CZ + dz, CY + dy, CX + dx
                ok = (
                    (nzc >= 0) & (nzc < nz) & (nyc >= 0) & (nyc < ny)
                    & (nxc >= 0) & (nxc < nx)
                )
                ncell = jnp.where(ok, (nzc * ny + nyc) * nx + nxc, n_cells)
                blocks.append(cell_rows[ncell])        # wide row gather
    return jnp.concatenate(blocks, axis=-1)           # [n_cells, 27*occ*4]


@functools.partial(jax.jit, static_argnames=("nx", "ny", "nz", "w"))
def grid_nearest_neighbor(
    query: jax.Array,       # [Q, 3]
    table: jax.Array,       # [n_cells, W*4] from build_grid_table
    origin: jax.Array,      # [3]
    inv_cell: jax.Array,    # scalar
    nx: int, ny: int, nz: int, w: int,
) -> tuple[jax.Array, jax.Array]:
    """Gated nearest neighbor via the 27-cell candidate table: ONE row
    gather + [Q, W] min/argmin per query block. Returns (sq_distance [Q],
    index [Q]) where sq_distance is exact for every neighbor within the
    plan's gate and ~1e18 when the neighborhood is empty (callers gate
    with d2 <= gate^2, so the distinction never matters). Queries stream
    in blocks sized so the gathered candidate slab stays ~256 MB (at 300k
    queries x W=1728 an unblocked gather materializes 8+ GB)."""
    n_query = query.shape[0]
    cap = max(1024, ((256 << 20) // (w * 16)) // 1024 * 1024)
    n_blocks = -(-n_query // cap)
    # Even split (padding <= 1023 rows) instead of cap-sized blocks whose
    # last block is mostly padding.
    block = max(1024, -(-(-(-n_query // n_blocks)) // 1024) * 1024)
    pad = (-n_query) % block
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, block, 3)

    def one_block(qb):
        c = jnp.floor((qb - origin[None, :]) * inv_cell).astype(jnp.int32)
        cx = jnp.clip(c[:, 0], 0, nx - 1)
        cy = jnp.clip(c[:, 1], 0, ny - 1)
        cz = jnp.clip(c[:, 2], 0, nz - 1)
        cid = (cz * ny + cy) * nx + cx
        rows = table[cid]                              # [B, W*4] row gather
        cand = rows.reshape(qb.shape[0], w, 4)
        diff = cand[:, :, 0:3] - qb[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)             # [B, W]
        j = jnp.argmin(d2, axis=1)
        dmin = jnp.min(d2, axis=1)
        onehot = (
            jnp.arange(w, dtype=jnp.int32)[None, :] == j[:, None]
        )
        idx = jnp.sum(
            jnp.where(onehot, cand[:, :, 3], 0.0), axis=1
        ).astype(jnp.int32)
        return dmin, jnp.maximum(idx, 0)

    d2s, idxs = jax.lax.map(one_block, blocks)
    return d2s.reshape(-1)[:n_query], idxs.reshape(-1)[:n_query]


@functools.partial(jax.jit, static_argnames=("k",))
def grid_topk(
    query: jax.Array,       # [Q, 3]
    table: jax.Array,       # [n_cells(+pad), W*4] from build_grid_table
    origin: jax.Array,      # [3]
    inv_cell: jax.Array,    # scalar
    dims: jax.Array,        # [3] i32 (nx, ny, nz) — TRACED: callers whose
                            # table SHAPES match share one executable (the
                            # HEM pyramid recompile killer)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """k nearest candidates from each query's 27-cell neighborhood.

    Returns (sq_distances [Q, k], indices [Q, k]), both ordered nearest
    first. Exact for every neighbor within the plan's cell size: slots past
    a window's population carry d2 ~ 1e18 and index 0 — callers gate by
    radius (`d2 <= r^2`), which masks them. The counterpart of
    `PointIndex::annSearch` (/root/reference/src/cpp_ext/src/pointindex.cpp
    :110-118): radius search + sort + truncate to k."""
    n_query = query.shape[0]
    w = table.shape[1] // 4
    nx = dims[0]
    ny = dims[1]
    nz = dims[2]
    cap = max(1024, ((256 << 20) // (w * 16)) // 1024 * 1024)
    n_blocks = -(-n_query // cap)
    block = max(1024, -(-(-(-n_query // n_blocks)) // 1024) * 1024)
    pad = (-n_query) % block
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, block, 3)

    def one_block(qb):
        c = jnp.floor((qb - origin[None, :]) * inv_cell).astype(jnp.int32)
        cx = jnp.clip(c[:, 0], 0, nx - 1)
        cy = jnp.clip(c[:, 1], 0, ny - 1)
        cz = jnp.clip(c[:, 2], 0, nz - 1)
        cid = (cz * ny + cy) * nx + cx
        rows = table[cid]                              # [B, W*4] row gather
        cand = rows.reshape(qb.shape[0], w, 4)
        diff = cand[:, :, 0:3] - qb[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)             # [B, W]
        neg, j = jax.lax.top_k(-d2, k)                 # nearest first
        idx = jnp.take_along_axis(cand[:, :, 3], j, axis=1)
        return -neg, jnp.maximum(idx, 0.0).astype(jnp.int32)

    d2s, idxs = jax.lax.map(one_block, blocks)
    return (
        d2s.reshape(-1, k)[:n_query],
        idxs.reshape(-1, k)[:n_query],
    )
