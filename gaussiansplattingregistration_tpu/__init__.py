"""TPU-native Gaussian Splatting registration framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
erikszasz/GaussianSplattingRegistration: Gaussian splat IO and conversion,
global (FPFH+RANSAC / FGR) and local (ICP family) registration, coarse-to-fine
multiscale registration, HEM Gaussian-mixture downsampling, differentiable
tile-based 3DGS rasterization, photometric evaluation, plane fitting, and
merging/saving of aligned clouds — as a library + CLI, sharded over TPU meshes.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU matmuls default to bf16 inputs; for a registration library the ~0.4%
# relative error corrupts point transforms (p @ Rᵀ), normal equations and
# projection math far above the 1e-3 accuracy contract. This workload has no
# large-K f32 matmul on its hot paths (neighbor distances are computed on the
# VPU, ops/knn.py), so full-f32 multi-pass matmuls cost little here.
# Override with GSR_TPU_MATMUL_PRECISION=bfloat16|tensorfloat32|float32.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("GSR_TPU_MATMUL_PRECISION", "float32"),
)

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.camera import Camera

__all__ = ["GaussianCloud", "Camera", "__version__"]
