"""Data models: GaussianCloud pytree, Camera, parameter dataclasses, results."""

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.camera import Camera

__all__ = ["GaussianCloud", "Camera"]
