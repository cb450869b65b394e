"""Verify whether block_until_ready actually blocks under axon.

Times the same 4M sort with (a) block_until_ready sync, (b) host readback
sync, (c) N repeated chained iterations then readback (amortized).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

E = 4_000_000


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, size=E, dtype=np.uint64).astype(np.uint32))
    entry = jnp.arange(E, dtype=jnp.int32)

    sort = jax.jit(lambda k, e: jax.lax.sort((k, e), num_keys=1))
    out = sort(key, entry)
    jax.block_until_ready(out)
    np.asarray(out[0][:8])

    t0 = time.perf_counter()
    for _ in range(5):
        out = sort(key, entry)
    jax.block_until_ready(out)
    print(f"block_until_ready sync: {(time.perf_counter()-t0)/5*1e3:9.2f} ms")

    t0 = time.perf_counter()
    for _ in range(5):
        out = sort(key, entry)
        np.asarray(out[0][:8])
    print(f"readback sync:          {(time.perf_counter()-t0)/5*1e3:9.2f} ms")

    # chained: output feeds next input, one readback at the end
    t0 = time.perf_counter()
    k = key
    for _ in range(5):
        k, e2 = sort(k, entry)
    np.asarray(k[:8])
    print(f"chained + one readback: {(time.perf_counter()-t0)/5*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
