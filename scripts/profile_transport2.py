"""Round 2 transport micro-benchmarks: gather source-size scaling and
sort-carry column costs, to choose the backward transport design.

PYTHONPATH=/root/repo python scripts/profile_transport2.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.devtime import device_time  # noqa: E402

N = 1_000_000
C = 4
E = N * C
T = 3600
K = 512


def main():
    rng = np.random.default_rng(0)

    print("== gather: 4M rows, varying SOURCE size ==")
    for src_rows in (T * 32, T * 128, T * 512, E):
        src = jnp.asarray(rng.normal(size=(src_rows, 10)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, src_rows, size=E).astype(np.int32))
        ms, _ = device_time(lambda s, i: s[i], (src, idx), iters=3,
                            verbose=False)
        print(f"  src [{src_rows:>8},10]: {ms:8.2f} ms  "
              f"({ms*1e6/E:5.1f} ns/row)")

    print("== gather: varying OUTPUT rows from [T*K,10] source ==")
    src = jnp.asarray(rng.normal(size=(T * K, 10)).astype(np.float32))
    for out_rows in (T * 128, T * 256, T * 512, E):
        idx = jnp.asarray(
            rng.integers(0, T * K, size=out_rows).astype(np.int32)
        )
        ms, _ = device_time(lambda s, i: s[i], (src, idx), iters=3,
                            verbose=False)
        print(f"  out {out_rows:>8} rows: {ms:8.2f} ms  "
              f"({ms*1e6/out_rows:5.1f} ns/row)")

    print("== sort-carry: E=4M rows, varying value columns ==")
    key = jnp.asarray(rng.integers(0, E, size=E).astype(np.uint32))
    for ncols, label in ((1, "2-op (key+id)"), (5, "6-op"),
                         (10, "11-op (f32 cols)")):
        vals = [jnp.asarray(rng.normal(size=E).astype(np.float32))
                for _ in range(ncols)]

        def f(key, *vals):
            out = jax.lax.sort((key,) + vals, num_keys=1)
            return out[1]

        ms, _ = device_time(f, (key, *vals), iters=3, verbose=False)
        print(f"  {label:20s}: {ms:8.2f} ms")

    print("== sort-carry at T*KB=460k rows, 11 value cols ==")
    M = T * 128
    key = jnp.asarray(rng.integers(0, E, size=M).astype(np.uint32))
    vals = [jnp.asarray(rng.normal(size=M).astype(np.float32))
            for _ in range(10)]

    def f(key, *vals):
        out = jax.lax.sort((key,) + vals, num_keys=1)
        return out[1]

    ms, _ = device_time(f, (key, *vals), iters=3, verbose=False)
    print(f"  460k 11-op: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
