"""File loading/saving: Gaussian PLYs, sparse PLYs, caching, conversion.

Counterpart of `/root/reference/src/utils/file_loader.py` and
`point_cloud_converter.py`, without the torch/Open3D round-trips: parsing
stays host-side numpy, arrays go to device once.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional, Tuple

import numpy as np

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.ops import sh as sh_ops
from gaussiansplattingregistration_tpu.utils import ply as ply_io


def load_gaussian_cloud(path: str) -> GaussianCloud:
    """Load a 3DGS Gaussian PLY (counterpart of `load_gaussian_pc`,
    `/root/reference/src/utils/file_loader.py:53-66`)."""
    data = ply_io.read_ply(path)
    if ply_io.check_point_cloud_type(data) is not ply_io.PointCloudType.GAUSSIAN:
        raise ValueError(f"{path} is not a Gaussian splat PLY")
    arrays = ply_io.gaussian_arrays_from_ply(data)
    sh_degree = arrays.pop("sh_degree")
    return GaussianCloud.create(sh_degree=sh_degree, **arrays)


def save_gaussian_cloud(cloud: GaussianCloud, path: str) -> None:
    """Save in the 3DGS PLY layout (counterpart of `save_ply`,
    `/root/reference/src/models/gaussian_model.py:169-185`)."""
    d = cloud.to_numpy_dict()
    cols = ply_io.gaussian_arrays_to_ply_columns(
        d["xyz"], d["features_dc"], d["features_rest"],
        d["opacity"], d["scaling"], d["rotation"],
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ply_io.write_ply(path, cols)


def load_sparse_cloud(path: str) -> PointCloud:
    """Load a sparse/SfM PLY with RGB colors (counterpart of `load_sparse_pc`,
    `/root/reference/src/utils/file_loader.py:20-30`)."""
    data = ply_io.read_ply(path)
    if ply_io.check_point_cloud_type(data) is not ply_io.PointCloudType.SPARSE:
        raise ValueError(f"{path} is not a sparse (SfM) PLY")
    xyz, rgb, normals = ply_io.sparse_arrays_from_ply(data)
    return PointCloud(points=xyz, colors=rgb, normals=normals)


def load_point_cloud_any(path: str):
    """Type-sniffing loader (counterpart of the GUI's three load paths,
    `/root/reference/src/utils/file_loader.py:40-50`). Returns either a
    GaussianCloud or a PointCloud."""
    data = ply_io.read_ply(path)
    kind = ply_io.check_point_cloud_type(data)
    if kind is ply_io.PointCloudType.GAUSSIAN:
        arrays = ply_io.gaussian_arrays_from_ply(data)
        sh_degree = arrays.pop("sh_degree")
        return GaussianCloud.create(sh_degree=sh_degree, **arrays)
    if kind is ply_io.PointCloudType.SPARSE:
        xyz, rgb, normals = ply_io.sparse_arrays_from_ply(data)
        return PointCloud(points=xyz, colors=rgb, normals=normals)
    raise ValueError(f"unrecognized point cloud type in {path}")


def gaussian_to_point_cloud(
    cloud: GaussianCloud, estimate_missing_normals: bool = False
) -> PointCloud:
    """GaussianCloud -> registration PointCloud.

    Counterpart of `convert_gs_to_open3d_pc`
    (`/root/reference/src/utils/point_cloud_converter.py:31-49`): positions,
    sh2rgb colors clipped to [0,1], packed covariances attached. Normal
    estimation is optional and delegated to ops.normals (the reference used
    Open3D's kNN-plane estimation).
    """
    import jax.numpy as jnp

    colors = jnp.clip(cloud.get_rgb, 0.0, 1.0)
    pc = PointCloud(
        points=cloud.xyz, colors=colors, covariances=cloud.get_covariance()
    )
    if estimate_missing_normals:
        from gaussiansplattingregistration_tpu.ops import normals as normals_ops

        pc = normals_ops.with_estimated_normals(pc)
    return pc


def save_point_cloud(pc: PointCloud, path: str) -> None:
    """Save a sparse point cloud as PLY (colors in 0-255 uchar)."""
    n = pc.num_points
    cols = {
        "x": np.asarray(pc.points[:, 0], np.float32),
        "y": np.asarray(pc.points[:, 1], np.float32),
        "z": np.asarray(pc.points[:, 2], np.float32),
    }
    if pc.normals is not None:
        for i, name in enumerate(("nx", "ny", "nz")):
            cols[name] = np.asarray(pc.normals[:, i], np.float32)
    colors = pc.colors
    if colors is None:
        colors = np.zeros((n, 3), np.float32)
    rgb255 = np.clip(np.asarray(colors) * 255.0, 0, 255).astype(np.uint8)
    for i, name in enumerate(("red", "green", "blue")):
        cols[name] = rgb255[:, i]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ply_io.write_ply(path, cols)


def get_cache_paths(cache_dir: str) -> Tuple[str, str]:
    """Timestamped cache file names (counterpart of `file_loader.py:88-99`,
    portable instead of the Windows-only `cache\\` join)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    return (
        os.path.join(cache_dir, f"point_cloud_first_{stamp}.ply"),
        os.path.join(cache_dir, f"point_cloud_second_{stamp}.ply"),
    )
