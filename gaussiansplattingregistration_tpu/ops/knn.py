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
