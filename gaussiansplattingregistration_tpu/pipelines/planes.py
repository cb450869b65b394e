"""Plane-inlier flows: registration on plane subsets + per-plane HEM merging.

Counterparts of the reference's two plane-consuming features:

* `execute_{local,ransac,fgr}_registration_inlier`
  (`/root/reference/src/controllers/registration_controller.py:30-91`):
  concatenate each cloud's plane-inlier index lists, `select_by_index` on the
  LEVEL-0 clouds, then run the chosen registration on the subsets —
  `select_plane_inliers` here, composed by the CLI's
  `register --plane-inliers-first/--plane-inliers-second` and by
  `Workspace.inlier_pair`.
* `PlaneInlierMergingWorker`
  (`/root/reference/src/gui/workers/downsampling/qt_plane_merging.py:44-120`,
  dispatched by `downsampler_controller.py:43-69`): per level, the points NOT
  on any plane pass through unchanged while each plane's inliers are
  HEM-downsampled independently; the level-d result is the concatenation
  unselected + plane-1 HEM level d + plane-2 HEM level d + ... —
  `merge_plane_inliers` here (CLI: `merge-planes`).
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

import numpy as np

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.parameters import GaussianMixtureParams
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud


def load_plane_indices(path: str) -> List[np.ndarray]:
    """Read the per-plane inlier index lists from a `fit-planes --output`
    JSON ({"planes": ..., "inlier_indices": [[...], ...]})."""
    with open(path) as f:
        data = json.load(f)
    if "inlier_indices" not in data:
        raise ValueError(
            f"{path} has no 'inlier_indices' — produce it with "
            "`fit-planes --output`"
        )
    return [np.asarray(ix, np.int64) for ix in data["inlier_indices"]]


def select_plane_inliers(pc: PointCloud, plane_indices: Sequence[np.ndarray]) -> PointCloud:
    """The level-0 cloud restricted to the union of its plane inliers
    (`np.concatenate(indices)` + `select_by_index`,
    `registration_controller.py:31-34` semantics)."""
    if not plane_indices:
        raise ValueError("no plane-inlier index lists")
    import jax.numpy as jnp

    joined = np.concatenate([np.asarray(ix, np.int64) for ix in plane_indices])
    return pc.select(jnp.asarray(joined))


def merge_plane_inliers(
    cloud: GaussianCloud,
    plane_indices: Sequence[np.ndarray],
    params: GaussianMixtureParams,
    seed: int = 0,
    backend: str = "jax",
) -> List[GaussianCloud]:
    """Per-plane HEM merging of one Gaussian cloud.

    For each level d in 1..cluster_level the result is
    `unselected points (unchanged) + concat(HEM level d of each plane's
    inliers)` — exactly `create_mixtures_from_indices`
    (`qt_plane_merging.py:160-182`: the unselected SoA is extended into
    every level first, then each plane's mixture levels are appended).
    Returns `cluster_level` GaussianClouds (level 0 — the input — is
    dropped, as the reference's `CreateMixture` does).
    """
    from gaussiansplattingregistration_tpu.ops import hem as hem_ops

    if not plane_indices:
        raise ValueError("no plane-inlier index lists")
    import jax.numpy as jnp

    n = cloud.num_points
    selected = np.concatenate([np.asarray(ix, np.int64) for ix in plane_indices])
    unselected = np.setdiff1d(np.arange(n), selected)
    base = cloud.select(jnp.asarray(unselected)) if unselected.size else None

    # Per-plane HEM pyramids (levels 1..cluster_level each).
    per_plane: List[List[GaussianCloud]] = []
    for p, ix in enumerate(plane_indices):
        sub = cloud.select(jnp.asarray(np.asarray(ix, np.int64)))
        levels = hem_ops.create_mixture(
            sub, params, seed=seed + p, backend=backend
        )
        per_plane.append(
            hem_ops.mixture_levels_to_clouds(levels, cloud.sh_degree)
        )

    out: List[GaussianCloud] = []
    for d in range(params.cluster_level):
        level: Optional[GaussianCloud] = base
        for clouds in per_plane:
            part = clouds[d]
            level = part if level is None else level.merge(part)
        assert level is not None
        out.append(level)
    return out
