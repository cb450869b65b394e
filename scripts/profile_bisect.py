"""Bisect: real imported ops vs inline twins on identical synthetic inputs."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops.rasterize import (
    RasterizeConfig, _build_tile_table, gather_entries,
)

N = 1_000_000
C = 4
TILES_X, TILES_Y = 80, 45
T = TILES_X * TILES_Y
K = 512
config = RasterizeConfig(max_tiles_per_splat=C, max_splats_per_tile=K)


def timed(name, fn, *args, iters=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    m2d = jnp.asarray(
        np.stack([rng.uniform(0, 1280, N), rng.uniform(0, 720, N)], -1).astype(np.float32))
    radius = jnp.asarray(rng.uniform(2, 8, N).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, N).astype(np.float32))
    valid = jnp.asarray(rng.random(N) < 0.8)

    def build(m2d, radius, depth, valid):
        return _build_tile_table(m2d, radius, depth, valid, TILES_X, TILES_Y, config)

    table = timed("real _build_tile_table", build, m2d, radius, depth, valid)

    packed = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))

    def gath(packed, table):
        return gather_entries(packed, table, C)

    g = timed("real gather_entries fwd", gath, packed, table)

    def gath_bwd(packed, table, ct):
        _, vjp = jax.vjp(lambda p: gather_entries(p, table, C), packed)
        return vjp(ct)[0]

    timed("real gather_entries fwd+bwd", gath_bwd, packed, table, g)

    # plain gather on the same table
    def plain_gather(packed, table):
        return packed[jnp.maximum(table, 0) // C]

    timed("plain gather (same table)", plain_gather, packed, table)

    def plain_gather_mask(packed, table):
        return packed[jnp.maximum(table, 0) // C] * (
            table >= 0).astype(packed.dtype)[..., None]

    timed("plain gather + mask", plain_gather_mask, packed, table)

    # bwd pieces standalone
    def bwd_piece(ct, table):
        dest = jnp.where(table >= 0, table, N * C).reshape(-1)
        acc = jnp.zeros((N * C, 10), ct.dtype).at[dest].add(
            ct.reshape(-1, 10), unique_indices=True, mode="drop")
        return acc.reshape(N, C, 10).sum(axis=1)

    timed("bwd scatter piece (same table)", bwd_piece, g, table)

    # sort alone on real-sized keys
    key = jnp.asarray(rng.integers(0, 2**32, size=N * C, dtype=np.uint64).astype(np.uint32))
    entry = jnp.arange(N * C, dtype=jnp.int32)

    def just_sort(k, e):
        return jax.lax.sort((k, e), num_keys=1)

    timed("sort 4M (u32,i32) again", just_sort, key, entry)


if __name__ == "__main__":
    main()
