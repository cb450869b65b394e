"""Fine-grained ablation of the tile-table build at bench shapes."""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig, project_gaussians,
)

WIDTH, HEIGHT = 1280, 720
N = 1_000_000


def timed(name, fn, *args, iters=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.006, size=(N, 3)).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    cov = np.asarray(
        math3d.covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    f = WIDTH / (2 * math.tan(math.radians(70) / 2))
    cam = Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, WIDTH, HEIGHT)
    config = RasterizeConfig(max_tiles_per_splat=4, max_splats_per_tile=512)
    ts = config.tile_size
    tiles_x = -(-WIDTH // ts)
    tiles_y = -(-HEIGHT // ts)
    num_tiles = tiles_x * tiles_y
    viewmat, intr = cam.viewmat, cam.intrinsics
    means_d, cov_d = jnp.asarray(xyz), jnp.asarray(cov)

    C = config.max_tiles_per_splat
    K = config.max_splats_per_tile
    tsf = float(ts)

    def keys_only(means, cov3d):
        proj = project_gaussians(means, cov3d, viewmat, intr, WIDTH, HEIGHT, config)
        m2d, radius, depth, valid = (
            proj["means2d"], proj["radius"], proj["depth"], proj["valid"])
        tx0 = jnp.clip(jnp.floor((m2d[:, 0] - radius) / tsf), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((m2d[:, 1] - radius) / tsf), 0, tiles_y - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((m2d[:, 0] + radius) / tsf), 0, tiles_x - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((m2d[:, 1] + radius) / tsf), 0, tiles_y - 1).astype(jnp.int32)
        w = tx1 - tx0 + 1
        h = ty1 - ty0 + 1
        c = jnp.arange(C, dtype=jnp.int32)[None, :]
        dx = c % w[:, None]
        dy = c // w[:, None]
        entry_valid = (c < (w * h)[:, None]) & valid[:, None]
        tile_id = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        tile_id = jnp.where(entry_valid, tile_id, num_tiles).astype(jnp.int32)
        tile_bits = int(num_tiles + 1).bit_length()
        depth_bits = 32 - tile_bits
        dq = jax.lax.bitcast_convert_type(
            jnp.maximum(depth, 0.0).astype(jnp.float32), jnp.uint32
        ) >> (32 - depth_bits)
        key = (tile_id.astype(jnp.uint32) << depth_bits) | dq[:, None]
        return key.reshape(-1), depth_bits

    def upto_keys(means, cov3d):
        key, _ = keys_only(means, cov3d)
        return jnp.sum(key)

    def upto_sort(means, cov3d):
        key, _ = keys_only(means, cov3d)
        E = key.shape[0]
        entry = jnp.arange(E, dtype=jnp.int32)
        sk, se = jax.lax.sort((key, entry), num_keys=1)
        return jnp.sum(sk) + jnp.sum(se)

    def upto_rank(means, cov3d):
        key, depth_bits = keys_only(means, cov3d)
        E = key.shape[0]
        entry = jnp.arange(E, dtype=jnp.int32)
        sk, se = jax.lax.sort((key, entry), num_keys=1)
        st = (sk >> depth_bits).astype(jnp.int32)
        idx = jnp.arange(E, dtype=jnp.int32)
        boundary = jnp.concatenate([jnp.ones((1,), bool), st[1:] != st[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        rank = idx - seg_start
        return jnp.sum(rank) + jnp.sum(se)

    def upto_scatter(means, cov3d):
        key, depth_bits = keys_only(means, cov3d)
        E = key.shape[0]
        entry = jnp.arange(E, dtype=jnp.int32)
        sk, se = jax.lax.sort((key, entry), num_keys=1)
        st = (sk >> depth_bits).astype(jnp.int32)
        idx = jnp.arange(E, dtype=jnp.int32)
        boundary = jnp.concatenate([jnp.ones((1,), bool), st[1:] != st[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        rank = idx - seg_start
        dest = jnp.where((rank < K) & (st < num_tiles), st * K + rank,
                         num_tiles * K)
        table = (jnp.full(num_tiles * K, -1, jnp.int32)
                 .at[dest].set(se, unique_indices=True, mode="drop"))
        return jnp.sum(table)

    def upto_scatter_params(means, cov3d):
        proj = project_gaussians(means, cov3d, viewmat, intr, WIDTH, HEIGHT, config)
        key, depth_bits = keys_only(means, cov3d)
        E = key.shape[0]
        entry = jnp.arange(E, dtype=jnp.int32)
        sk, se = jax.lax.sort((key, entry), num_keys=1)
        st = (sk >> depth_bits).astype(jnp.int32)
        idx = jnp.arange(E, dtype=jnp.int32)
        boundary = jnp.concatenate([jnp.ones((1,), bool), st[1:] != st[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        rank = idx - seg_start
        dest = jnp.where((rank < K) & (st < num_tiles), st * K + rank,
                         num_tiles * K)
        packed = jnp.concatenate(
            [proj["means2d"], proj["conic"],
             (proj["valid"].astype(jnp.float32))[:, None],
             jnp.zeros((N, 3), jnp.float32), proj["depth"][:, None],
             jnp.ones((N, 1), jnp.float32)], axis=-1)  # 11 ch incl valid flag
        rows = packed[se // C]                           # [E, 11] gather
        g = (jnp.zeros((num_tiles * K, 11), jnp.float32)
             .at[dest].set(rows, unique_indices=True, mode="drop"))
        return jnp.sum(g)

    def upto_hist_gather(means, cov3d):
        key, depth_bits = keys_only(means, cov3d)
        E = key.shape[0]
        entry = jnp.arange(E, dtype=jnp.int32)
        sk, se = jax.lax.sort((key, entry), num_keys=1)
        st = (sk >> depth_bits).astype(jnp.int32)
        counts = jnp.zeros(num_tiles + 1, jnp.int32).at[st].add(
            1, indices_are_sorted=True)
        ends = jnp.cumsum(counts[:num_tiles])
        starts = ends - counts[:num_tiles]
        offs = jnp.arange(K, dtype=jnp.int32)[None, :]
        gidx = jnp.minimum(starts[:, None] + offs, E - 1)
        tbl = se[gidx]
        return jnp.sum(tbl)

    timed("proj+keys", upto_keys, means_d, cov_d)
    timed("proj+keys+sort", upto_sort, means_d, cov_d)
    timed("proj+keys+sort+rank", upto_rank, means_d, cov_d)
    timed("proj+keys+sort+rank+scatter", upto_scatter, means_d, cov_d)
    timed("proj+sort+rank+scatterPARAMS(E rows)", upto_scatter_params, means_d, cov_d)
    timed("proj+sort+hist+gatherIDs(TK rows)", upto_hist_gather, means_d, cov_d)


if __name__ == "__main__":
    main()
