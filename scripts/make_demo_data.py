"""Generate the committed demo Gaussian PLY pair (tests/data/).

Deterministic: two overlapping views of one synthetic colored surface, the
source offset from the target by a known SE(3) transform stored alongside.
This is the repo's analogue of the demo clouds the reference loads at viewer
startup (`/root/reference/src/gui/windows/visualization/open3d_window.py:49-59`)
— committed data so the end-to-end CLI test and the README quickstart run on
a fresh clone with no downloads.

Run from the repo root: python scripts/make_demo_data.py
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud  # noqa: E402
from gaussiansplattingregistration_tpu.ops import se3  # noqa: E402
from gaussiansplattingregistration_tpu.utils import io as gio  # noqa: E402

N = 1200
SEED = 2024
# The known offset: a few degrees + a few cm, the regime local ICP handles.
XI_TRUE = [0.04, -0.03, 0.02, 0.05, -0.04, 0.03]


def make_target(rng) -> GaussianCloud:
    n = N
    xyz = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    # Structured, colorful surface (not noise) so every registration flavor
    # (geometric, colored, photometric) has signal.
    xyz[:, 2] = (
        0.35 * np.sin(2.5 * xyz[:, 0]) + 0.25 * np.cos(1.8 * xyz[:, 1])
        + 0.02 * rng.normal(size=n)
    ).astype(np.float32)
    rgb = np.stack(
        [
            0.5 + 0.4 * np.sin(3.0 * xyz[:, 0]),
            0.5 + 0.4 * np.cos(2.0 * xyz[:, 1]),
            0.5 + 0.4 * np.sin(2.0 * (xyz[:, 0] + xyz[:, 1])),
        ],
        axis=-1,
    ).astype(np.float32)
    C0 = 0.28209479177387814
    features_dc = ((rgb - 0.5) / C0)[:, None, :]
    return GaussianCloud.create(
        xyz=xyz,
        features_dc=features_dc.astype(np.float32),
        features_rest=np.zeros((n, 3, 3), np.float32),
        opacity=np.full((n, 1), 2.0, np.float32),
        scaling=np.log(rng.uniform(0.03, 0.08, size=(n, 3))).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        sh_degree=1,
    )


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    target = make_target(rng)
    T_off = se3.se3_exp(jnp.asarray(XI_TRUE, jnp.float32))
    source = target.transform(T_off)
    gio.save_gaussian_cloud(target, os.path.join(out_dir, "demo_target.ply"))
    gio.save_gaussian_cloud(source, os.path.join(out_dir, "demo_source.ply"))
    with open(os.path.join(out_dir, "demo_transform.json"), "w") as f:
        json.dump(
            {
                "xi_true": XI_TRUE,
                "T_offset": np.asarray(T_off, np.float64).tolist(),
                "note": "source = T_offset applied to target; registering "
                        "source onto target must recover inv(T_offset)",
                "seed": SEED,
                "n": N,
            },
            f, indent=2,
        )
    print(f"wrote demo pair ({N} splats) to {out_dir}")


if __name__ == "__main__":
    main()
