"""Device-mesh construction helpers.

The canonical mesh has two axes:
* `data` — cameras / photometric-loss batches (pure data parallelism);
* `splat` — the N-gaussians axis (projection/binning local, per-tile
  composites combined across devices).

Pipeline parallelism is deliberately absent (SURVEY.md §2.9: "not a natural
fit, likely skip").
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    splat: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, splat) mesh; `splat` defaults to the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if splat is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        splat = n // data
    if data * splat != n:
        raise ValueError(f"mesh {data}x{splat} != {n} devices")
    arr = np.asarray(devices).reshape(data, splat)
    return Mesh(arr, axis_names=("data", "splat"))


def splat_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (N-splats) axis over the `splat` mesh axis."""
    return NamedSharding(mesh, P("splat"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
