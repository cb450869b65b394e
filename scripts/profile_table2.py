"""Fine-grained decomposition of the table-build + gather stages on TPU."""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.ops import math3d, raster_pallas
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
    print(f"{name:46s} {dt:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    scales = rng.uniform(0.002, 0.006, size=(N, 3)).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    cov = np.asarray(math3d.covariance_from_scaling_rotation(
        jnp.asarray(scales), jnp.asarray(quats)))
    f = WIDTH / (2 * math.tan(math.radians(70) / 2))
    cam = Camera.create(np.eye(3), [0.0, 0.0, 3.0], f, f, WIDTH, HEIGHT)
    config = RasterizeConfig(max_tiles_per_splat=4, max_splats_per_tile=512,
                             backend="pallas")
    ts = config.tile_size
    tiles_x, tiles_y = -(-WIDTH // ts), -(-HEIGHT // ts)
    num_tiles = tiles_x * tiles_y
    C, K = config.max_tiles_per_splat, config.max_splats_per_tile
    E = N * C

    proj = jax.jit(lambda m, c: project_gaussians(
        m, c, cam.viewmat, cam.intrinsics, WIDTH, HEIGHT, config))(
        jnp.asarray(xyz), jnp.asarray(cov))
    jax.block_until_ready(proj)
    means2d, radius = proj["means2d"], proj["radius"]
    depth, valid = proj["depth"], proj["valid"]

    def keys(means2d, radius, depth, valid):
        tsf = float(ts)
        tx0 = jnp.clip(jnp.floor((means2d[:, 0] - radius) / tsf), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((means2d[:, 1] - radius) / tsf), 0, tiles_y - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((means2d[:, 0] + radius) / tsf), 0, tiles_x - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((means2d[:, 1] + radius) / tsf), 0, tiles_y - 1).astype(jnp.int32)
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
        return ((tile_id.astype(jnp.uint32) << depth_bits) | dq[:, None]).reshape(-1), depth_bits

    key, depth_bits = timed("keys", lambda *a: keys(*a)[0], means2d, radius, depth, valid), None
    flat_entry = jnp.arange(E, dtype=jnp.int32)

    timed("sort 4M (key,entry)", lambda k, e: jax.lax.sort((k, e), num_keys=1), key, flat_entry)
    sorted_key, sorted_entry = jax.jit(lambda k, e: jax.lax.sort((k, e), num_keys=1))(key, flat_entry)
    tile_bits = int(num_tiles + 1).bit_length()
    db = 32 - tile_bits
    sorted_tiles = (sorted_key >> db).astype(jnp.int32)

    timed("sort 4M key-only", lambda k: jax.lax.sort((k,), num_keys=1), key)
    timed("searchsorted bounds", lambda st: jnp.searchsorted(
        st, jnp.arange(num_tiles + 1, dtype=jnp.int32)), sorted_tiles)
    bounds = jax.jit(lambda st: jnp.searchsorted(
        st, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32))(sorted_tiles)

    kcol = jnp.arange(K, dtype=jnp.int32)[None, :]

    def table_gather(se, b):
        counts = jnp.minimum(b[1:] - b[:-1], K)
        src = jnp.minimum(b[:-1, None] + kcol, E - 1)
        return jnp.where(kcol < counts[:, None], se[src], -1)

    table = timed("table gather [T,K] elems", table_gather, sorted_entry, bounds)

    packed = jnp.concatenate(
        [means2d, proj["conic"], jnp.ones((N, 1), jnp.float32),
         jnp.zeros((N, 3), jnp.float32), depth[:, None]], axis=-1)

    def row_gather(pk, tb):
        splat = jnp.maximum(tb, 0) // C
        return pk[splat] * (tb >= 0).astype(pk.dtype)[..., None]

    g = timed("row gather [T,K,10]", row_gather, packed, table)

    def fused_gather(pk, se, b):
        counts = jnp.minimum(b[1:] - b[:-1], K)
        src = jnp.minimum(b[:-1, None] + kcol, E - 1)
        ent = se[src]
        mask = kcol < counts[:, None]
        return pk[ent // C] * mask[..., None].astype(pk.dtype)

    timed("FUSED table+row gather", fused_gather, packed, sorted_entry, bounds)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_origin = jnp.stack(
        [(tile_ids % tiles_x) * ts, (tile_ids // tiles_x) * ts], axis=-1
    ).astype(jnp.float32)
    valid_f = (table >= 0).astype(jnp.float32)

    timed("pack_params (transpose to [T,16,K])",
          lambda gg, vv: raster_pallas._pack_params(gg, vv, tile_origin, 512),
          g, valid_f)

    # inverse permutation: sort vs unique scatter
    dest = jnp.where(kcol < 99999, 0, 0)  # placeholder no-op
    perm = sorted_entry
    vals = jnp.arange(E, dtype=jnp.int32)
    timed("invert perm via sort", lambda p, v: jax.lax.sort((p, v), num_keys=1), perm, vals)
    timed("invert perm via unique scatter",
          lambda p, v: jnp.zeros((E,), jnp.int32).at[p].set(v, unique_indices=True),
          perm, vals)


if __name__ == "__main__":
    main()
