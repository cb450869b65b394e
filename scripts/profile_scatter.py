"""Microbenchmarks for the binning data-movement alternatives on TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_000_000
C = 4
E = N * C
T = 3600
K = 512


def timed(name, fn, *args, iters=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    # Simulated sorted tile ids (with overflow bucket T at the end).
    tiles = np.sort(rng.integers(0, T + 1, size=E)).astype(np.int32)
    splats = rng.integers(0, N, size=E).astype(np.int32)
    tiles_d = jnp.asarray(tiles)
    splats_d = jnp.asarray(splats)

    def hist_plain(st):
        counts = jnp.zeros(T + 1, jnp.int32).at[st].add(1)
        counts = counts[:T]
        ends = jnp.cumsum(counts)
        return ends - counts, ends

    timed("histogram scatter-add (current)", hist_plain, tiles_d)

    def hist_sorted(st):
        counts = jnp.zeros(T + 1, jnp.int32).at[st].add(
            1, indices_are_sorted=True
        )
        counts = counts[:T]
        ends = jnp.cumsum(counts)
        return ends - counts, ends

    timed("histogram scatter-add sorted-hint", hist_sorted, tiles_d)

    def rank_table(st, sp):
        # rank within tile run, for sorted tile ids
        idx = jnp.arange(E, dtype=jnp.int32)
        boundary = jnp.concatenate(
            [jnp.ones(1, bool), st[1:] != st[:-1]]
        )
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        rank = idx - seg_start
        dest = jnp.where((rank < K) & (st < T), st * K + rank, T * K)
        table = jnp.full(T * K + 1, -1, jnp.int32).at[dest].set(
            sp, indices_are_sorted=True, unique_indices=True, mode="drop"
        )
        return table[: T * K].reshape(T, K)

    tbl = timed("rank-scatter into [T,K] table", rank_table, tiles_d, splats_d)

    def rank_table_then_gather(st, sp, packed):
        table = rank_table(st, sp)
        valid = table >= 0
        g = packed[jnp.maximum(table, 0)]
        return g, valid

    packed = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    timed("rank-scatter + packed gather", rank_table_then_gather,
          tiles_d, splats_d, packed)

    # VJP of the [T,K] gather (scatter-add of grads back to splats).
    table = np.maximum(np.asarray(tbl), 0)
    table_d = jnp.asarray(table)

    def gath(p):
        return p[table_d]

    g = jnp.asarray(rng.normal(size=(T, K, 10)).astype(np.float32))

    def gather_vjp(p, ct):
        _, vjp = jax.vjp(gath, p)
        return vjp(ct)[0]

    timed("gather VJP (scatter-add back to splats)", gather_vjp, packed, g)

    # Sort comparisons
    key = (tiles.astype(np.uint32) << 19) | rng.integers(
        0, 1 << 19, size=E
    ).astype(np.uint32)
    key_d = jnp.asarray(rng.permutation(key))

    def sort1(k, s):
        return jax.lax.sort((k, s), num_keys=1)

    timed("sort 4M u32 key + i32 payload", sort1, key_d, splats_d)

    def sort_f32(k, s):
        return jax.lax.sort((k, s), num_keys=1)

    keyf = jnp.asarray(rng.normal(size=E).astype(np.float32))
    timed("sort 4M f32 key + i32 payload", sort_f32, keyf, splats_d)


if __name__ == "__main__":
    main()
