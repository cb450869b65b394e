"""Merging and saving aligned clouds.

Counterpart of `/root/reference/src/gui/workers/io/qt_gaussian_saver.py:14-66`:
`merge_and_save` works on in-memory clouds (GaussianSaverNormal), and
`merge_from_paths` re-loads from disk, validating both files are Gaussian
clouds (GaussianSaverUseCorresponding) — used when the registration ran on
different (e.g. downsampled) clouds than the ones to merge.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.utils import io as gio


def merge_and_save(
    first: GaussianCloud,
    second: GaussianCloud,
    transformation,
    output_path: str,
) -> GaussianCloud:
    """Transform `first`, concatenate with `second`, write the 3DGS PLY.

    Raises ValueError on SH-degree mismatch (the reference's guard at
    `qt_gaussian_saver.py:15-19`).
    """
    merged = first.merge(second, jnp.asarray(transformation, jnp.float32))
    gio.save_gaussian_cloud(merged, output_path)
    return merged


def merge_from_paths(
    first_path: str,
    second_path: str,
    transformation,
    output_path: str,
) -> GaussianCloud:
    """Load both PLYs (must be Gaussian clouds), merge under the transform,
    save (`qt_gaussian_saver.py:43-66` semantics)."""
    first = gio.load_gaussian_cloud(first_path)
    second = gio.load_gaussian_cloud(second_path)
    return merge_and_save(first, second, transformation, output_path)
