"""TPU-native Gaussian Splatting registration framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
erikszasz/GaussianSplattingRegistration: Gaussian splat IO and conversion,
global (FPFH+RANSAC / FGR) and local (ICP family) registration, coarse-to-fine
multiscale registration, HEM Gaussian-mixture downsampling, differentiable
tile-based 3DGS rasterization, photometric evaluation, plane fitting, and
merging/saving of aligned clouds — as a library + CLI, sharded over TPU meshes.
"""

__version__ = "0.1.0"

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.camera import Camera

__all__ = ["GaussianCloud", "Camera", "__version__"]
