"""Scatter variant microbenchmarks: which modes hit the TPU fast path?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_000_000
C = 4
T = 3600
K = 512
F = 10


def timed(name, fn, *args, iters=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:9.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    # table: unique entry ids or -1 (~50% fill), unsorted within rows
    ids = rng.permutation(N * C)[: T * K]
    mask = rng.random(T * K) < 0.5
    table = np.where(mask, ids, -1).astype(np.int32).reshape(T, K)
    table_d = jnp.asarray(table)
    ct = jnp.asarray(rng.normal(size=(T, K, F)).astype(np.float32))

    def bwd_add_unique(table, ct):
        dest = jnp.where(table >= 0, table, N * C).reshape(-1)
        acc = jnp.zeros((N * C, F), ct.dtype).at[dest].add(
            ct.reshape(-1, F), unique_indices=True, mode="drop")
        return acc.reshape(N, C, F).sum(axis=1)

    timed("bwd scatter .add unique drop", bwd_add_unique, table_d, ct)

    def bwd_set_unique(table, ct):
        dest = jnp.where(table >= 0, table, N * C).reshape(-1)
        acc = jnp.zeros((N * C, F), ct.dtype).at[dest].set(
            ct.reshape(-1, F), unique_indices=True, mode="drop")
        return acc.reshape(N, C, F).sum(axis=1)

    timed("bwd scatter .set unique drop", bwd_set_unique, table_d, ct)

    def bwd_sorted(table, ct):
        # sort (dest, flatten idx of ct) then set with sorted+unique
        dest = jnp.where(table >= 0, table, N * C).reshape(-1)
        order = jnp.argsort(dest)
        dest_s = dest[order]
        ct_s = ct.reshape(-1, F)[order]
        acc = jnp.zeros((N * C, F), ct.dtype).at[dest_s].set(
            ct_s, indices_are_sorted=True, unique_indices=True, mode="drop")
        return acc.reshape(N, C, F).sum(axis=1)

    timed("bwd sort then scatter .set sorted unique", bwd_sorted, table_d, ct)

    # one-hot matmul alternative: per tile-row K -> segment? skip.

    # table build pieces
    E = N * C
    key = jnp.asarray(rng.integers(0, 2**31, size=E, dtype=np.int64).astype(np.uint32))
    entry = jnp.arange(E, dtype=jnp.int32)

    def just_sort(k, e):
        return jax.lax.sort((k, e), num_keys=1)

    sk, se = timed("sort 4M (u32, i32)", just_sort, key, entry)

    def rank_part(sorted_tiles):
        idx = jnp.arange(E, dtype=jnp.int32)
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_tiles[1:] != sorted_tiles[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
        return idx - seg_start

    st = jnp.asarray(np.sort(rng.integers(0, T + 1, size=E)).astype(np.int32))
    timed("boundary+cummax rank (4M)", rank_part, st)

    def table_scatter(st, rank, se):
        dest = jnp.where((rank < K) & (st < T), st * K + rank, T * K)
        return jnp.full(T * K, -1, jnp.int32).at[dest].set(
            se, indices_are_sorted=True, unique_indices=True, mode="drop")

    rk = rank_part(st)
    timed("table scatter .set sorted unique drop", table_scatter, st, rk, se)


if __name__ == "__main__":
    main()
