"""On-chip micro-benchmarks for the backward transport redesign.

Questions answered (PERF.md round-2 follow-up):
  1. Is HBM minor-dim padding to 128 lanes real for [N, 10] f32 arrays?
     (sum/fill throughput tells.)
  2. What does a unique-index row scatter of ~0.5M rows cost, and which
     landing layout is cheapest:
       V1: scatter [M,10] rows into [E,10] then reshape [N,C,10].sum(1)
       V2: scatter [M,10] rows into [N,128] at (splat, c*32) column offsets
       V3: C masked scatters into C separate [N,10] buffers, then add
  3. How chunky is early termination at bench shapes: distribution of
     per-tile live counts (horizon) vs counts (occupancy).

Usage: PYTHONPATH=/root/repo python scripts/profile_transport.py
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.devtime import device_time  # noqa: E402

N = 1_000_000
C = 4
E = N * C
T = 3600            # 80 x 45 tiles at 1280x720
K = 512
KB = 128            # backward cap candidate
M = T * KB          # scatter rows (live-capped)


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(M, 10)).astype(np.float32))
    # Unique entry ids for the scatter (simulating table[:, :KB] entries).
    ids = jnp.asarray(
        rng.choice(E, size=M, replace=False).astype(np.int32)
    )

    print("== 1. padding reality check ==")
    x10 = jnp.asarray(rng.normal(size=(E, 10)).astype(np.float32))
    x128 = jnp.asarray(rng.normal(size=(E // 8, 128)).astype(np.float32))

    device_time(lambda a: jnp.sum(a), (x10,), iters=8)   # 160 MB logical
    device_time(lambda a: jnp.sum(a), (x128,), iters=8)  # 256 MB logical

    print("== 2a. V1 scatter into [E,10] + fold ==")

    def v1(r, i):
        buf = jnp.zeros((E, 10), jnp.float32).at[i].set(
            r, unique_indices=True, mode="drop"
        )
        return buf.reshape(N, C, 10).sum(axis=1)

    device_time(v1, (rows, ids), iters=4)

    print("== 2b. V1 scatter alone (no fold) ==")

    def v1s(r, i):
        return jnp.zeros((E, 10), jnp.float32).at[i].set(
            r, unique_indices=True, mode="drop"
        )

    device_time(v1s, (rows, ids), iters=4)

    print("== 2c. V2 scatter into [N,128] at (splat, c*32) ==")

    def v2(r, i):
        splat = i // C
        col = (i % C) * 32
        buf = jnp.zeros((N, 128), jnp.float32)
        buf = buf.at[splat[:, None], col[:, None] + jnp.arange(10)[None, :]].set(
            r, unique_indices=True, mode="drop"
        )
        return (buf[:, 0:10] + buf[:, 32:42] + buf[:, 64:74] + buf[:, 96:106])

    device_time(v2, (rows, ids), iters=4)

    print("== 2d. V3 C masked scatters into C [N,10] buffers ==")

    def v3(r, i):
        splat = i // C
        c = i % C
        out = jnp.zeros((N, 10), jnp.float32)
        for j in range(C):
            idx = jnp.where(c == j, splat, N)  # OOB -> dropped
            # make dropped unique
            idx = jnp.where(c == j, splat, N + jnp.arange(M, dtype=jnp.int32))
            out = out + jnp.zeros((N, 10), jnp.float32).at[idx].set(
                r, unique_indices=True, mode="drop"
            )
        return out

    device_time(v3, (rows, ids), iters=4)

    print("== 2e. current path: invert-sort + gather + fold (reference) ==")
    dest = jnp.asarray(rng.permutation(E).astype(np.int32))
    sorted_entry = jnp.asarray(rng.permutation(E).astype(np.int32))
    ct_flat = jnp.asarray(rng.normal(size=(T * K, 10)).astype(np.float32))

    def cur(ct, se, d):
        _, slot_by_entry = jax.lax.sort((se, d), num_keys=1)
        safe = jnp.minimum(slot_by_entry, T * K - 1)
        d_entry = ct[safe] * (slot_by_entry < T * K).astype(ct.dtype)[:, None]
        return d_entry.reshape(N, C, 10).sum(axis=1)

    device_time(cur, (ct_flat, sorted_entry, dest), iters=2)


if __name__ == "__main__":
    main()
