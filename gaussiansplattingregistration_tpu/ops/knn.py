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


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def knn(
    query: jax.Array,
    data: jax.Array,
    k: int,
    block_size: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each query point in `data`.

    Returns (sq_distances [Q, k], indices [Q, k]), sorted ascending by
    distance. Both shapes are static; queries are processed in blocks of
    `block_size` via `lax.map` to bound the [block, N] distance tile.
    """
    n_query = query.shape[0]
    pad = (-n_query) % block_size
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, block_size, query.shape[1])

    def one_block(qb):
        d2 = _pairwise_sqdist(qb, data)
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
    max_table_mb: float = 384.0,
    max_cells: int = 4_000_000,
):
    """Host-side planning + table build. Returns (table [n_cells, W*4] f32,
    origin [3], inv_cell, dims (nx, ny, nz), W) or None when the scene's
    density makes the table uneconomical (fallback: brute force)."""
    import numpy as np

    pts = np.asarray(target_np, np.float32)
    m = pts.shape[0]
    if m == 0 or m >= (1 << 24) or not np.isfinite(pts).all() or gate <= 0:
        return None
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo
    cell = float(gate)
    dims = np.minimum(np.floor(span / cell).astype(np.int64) + 1, 1 << 20)
    while int(dims.prod()) > max_cells:
        cell *= 2.0
        dims = np.floor(span / cell).astype(np.int64) + 1
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    n_cells = nx * ny * nz

    inv_cell = np.float32(1.0 / cell)
    c = np.floor((pts - lo) * inv_cell).astype(np.int64)
    cx = np.clip(c[:, 0], 0, nx - 1)
    cy = np.clip(c[:, 1], 0, ny - 1)
    cz = np.clip(c[:, 2], 0, nz - 1)
    cid = (cz * ny + cy) * nx + cx
    order = np.argsort(cid, kind="stable").astype(np.int64)
    sorted_cid = cid[order]
    starts = np.searchsorted(sorted_cid, np.arange(n_cells + 1))
    occ = (starts[1:] - starts[:-1]).astype(np.int64)

    # W = max 27-neighborhood occupancy; computed by summing occ over the
    # 3x3x3 stencil (zero beyond the grid).
    occ3 = occ.reshape(nz, ny, nx)
    acc = np.zeros_like(occ3)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sl = occ3[
                    max(dz, 0): nz + min(dz, 0),
                    max(dy, 0): ny + min(dy, 0),
                    max(dx, 0): nx + min(dx, 0),
                ]
                acc[
                    max(-dz, 0): nz + min(-dz, 0),
                    max(-dy, 0): ny + min(-dy, 0),
                    max(-dx, 0): nx + min(-dx, 0),
                ] += sl
    w = int(acc.max())
    if w == 0:
        return None
    w = -(-w // 8) * 8
    table_bytes = n_cells * w * 4 * 4
    if table_bytes > max_table_mb * 1e6:
        return None

    table = np.full((n_cells, w, 4), 0.0, np.float32)
    table[:, :, 0:3] = _GRID_PAD_COORD
    table[:, :, 3] = -1.0
    col = np.zeros(n_cells, np.int64)
    max_occ = int(occ.max())
    J = np.arange(max_occ)
    cz_all, cy_all, cx_all = np.meshgrid(
        np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij"
    )
    cz_all = cz_all.ravel(); cy_all = cy_all.ravel(); cx_all = cx_all.ravel()
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nzc = cz_all + dz
                nyc = cy_all + dy
                nxc = cx_all + dx
                ok = (
                    (nzc >= 0) & (nzc < nz) & (nyc >= 0) & (nyc < ny)
                    & (nxc >= 0) & (nxc < nx)
                )
                ncell = np.where(ok, (nzc * ny + nyc) * nx + nxc, 0)
                L = np.where(ok, occ[ncell], 0)
                rows_c, rows_j = np.nonzero(J[None, :] < L[:, None])
                src_pos = starts[ncell[rows_c]] + rows_j
                pidx = order[src_pos]
                table[rows_c, col[rows_c] + rows_j, 0:3] = pts[pidx]
                table[rows_c, col[rows_c] + rows_j, 3] = pidx.astype(np.float32)
                col += L
    return (
        table.reshape(n_cells, w * 4),
        lo.astype(np.float32),
        inv_cell,
        (nx, ny, nz),
        w,
    )


@functools.partial(jax.jit, static_argnames=("nx", "ny", "nz", "w"))
def grid_nearest_neighbor(
    query: jax.Array,       # [Q, 3]
    table: jax.Array,       # [n_cells, W*4] from grid_nn_plan
    origin: jax.Array,      # [3]
    inv_cell: jax.Array,    # scalar
    nx: int, ny: int, nz: int, w: int,
) -> tuple[jax.Array, jax.Array]:
    """Gated nearest neighbor via the 27-cell candidate table: ONE row
    gather + [Q, W] min/argmin. Returns (sq_distance [Q], index [Q]) where
    sq_distance is exact for every neighbor within the plan's gate and
    ~1e18 when the neighborhood is empty (callers gate with d2 <= gate^2,
    so the distinction never matters)."""
    c = jnp.floor((query - origin[None, :]) * inv_cell).astype(jnp.int32)
    cx = jnp.clip(c[:, 0], 0, nx - 1)
    cy = jnp.clip(c[:, 1], 0, ny - 1)
    cz = jnp.clip(c[:, 2], 0, nz - 1)
    cid = (cz * ny + cy) * nx + cx
    rows = table[cid]                                  # [Q, W*4] row gather
    cand = rows.reshape(query.shape[0], w, 4)
    diff = cand[:, :, 0:3] - query[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)                 # [Q, W]
    j = jnp.argmin(d2, axis=1)
    dmin = jnp.min(d2, axis=1)
    onehot = (
        jnp.arange(w, dtype=jnp.int32)[None, :] == j[:, None]
    )
    idx = jnp.sum(
        jnp.where(onehot, cand[:, :, 3], 0.0), axis=1
    ).astype(jnp.int32)
    return dmin, jnp.maximum(idx, 0)
