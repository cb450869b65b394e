"""Checkpoint/resume of registration state.

The reference's only persistence is artifact-level (merged PLY, conversion
cache, evaluation JSON — SURVEY.md §5.4). Here any registration run can be
checkpointed mid-stream and resumed deterministically: {pose/twist, optimizer
state, loss history, HEM mixture levels} go into an .npz + JSON manifest.
PLY import/export (utils/io.py) stays the interchange format with the 3DGS
ecosystem.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}.{i}"] = np.asarray(leaf)
    out[f"{prefix}.__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    return out


def save_checkpoint(
    path: str,
    transformation: np.ndarray,
    *,
    twist: Optional[np.ndarray] = None,
    opt_state: Any = None,
    loss_history: Optional[List[float]] = None,
    mixture_levels: Optional[list] = None,
    metadata: Optional[dict] = None,
) -> None:
    """Write <path>.npz (arrays) + <path>.json (manifest)."""
    arrays: Dict[str, np.ndarray] = {"transformation": np.asarray(transformation)}
    if twist is not None:
        arrays["twist"] = np.asarray(twist)
    if opt_state is not None:
        arrays.update(_flatten("opt_state", opt_state))
    if loss_history:
        arrays["loss_history"] = np.asarray(loss_history, np.float64)
    if mixture_levels:
        for i, lvl in enumerate(mixture_levels):
            arrays[f"mix{i}.xyz"] = np.asarray(lvl.xyz)
            arrays[f"mix{i}.colors"] = np.asarray(lvl.colors)
            arrays[f"mix{i}.opacities"] = np.asarray(lvl.opacities)
            arrays[f"mix{i}.covariance"] = np.asarray(lvl.covariance)
            arrays[f"mix{i}.features"] = np.asarray(lvl.features)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path + ".npz", **arrays)
    manifest = {
        "keys": sorted(arrays.keys()),
        "num_mixture_levels": len(mixture_levels or []),
        "metadata": metadata or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)


def load_checkpoint(path: str, opt_state_template: Any = None) -> dict:
    """Load a checkpoint; returns dict with transformation, twist,
    loss_history, mixture_levels, metadata, and (if a template pytree is
    given) the restored opt_state."""
    with np.load(path + ".npz") as data:
        arrays = {k: data[k] for k in data.files}
    with open(path + ".json") as f:
        manifest = json.load(f)

    out: dict = {
        "transformation": arrays["transformation"],
        "twist": arrays.get("twist"),
        "loss_history": arrays.get("loss_history", np.zeros(0)).tolist(),
        "metadata": manifest.get("metadata", {}),
        "mixture_levels": [],
    }
    from gaussiansplattingregistration_tpu.ops.hem import MixtureLevel

    for i in range(manifest.get("num_mixture_levels", 0)):
        out["mixture_levels"].append(
            MixtureLevel(
                xyz=arrays[f"mix{i}.xyz"],
                colors=arrays[f"mix{i}.colors"],
                opacities=arrays[f"mix{i}.opacities"],
                covariance=arrays[f"mix{i}.covariance"],
                features=arrays[f"mix{i}.features"],
            )
        )
    if opt_state_template is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
        restored = [
            arrays[f"opt_state.{i}"] for i in range(len(leaves))
        ]
        out["opt_state"] = jax.tree_util.tree_unflatten(treedef, restored)
    return out
