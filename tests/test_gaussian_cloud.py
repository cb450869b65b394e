"""Tests for the GaussianCloud pytree: transforms, merge, PLY round-trips.

Oracles per SURVEY.md §4: SE(3) transform semantics vs
/root/reference/src/models/gaussian_model.py:210-222, PLY field layout vs
:98-185.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.ops import math3d, se3, sh
from gaussiansplattingregistration_tpu.utils import io as io_utils
from tests.conftest import make_random_cloud


def random_se3(rng):
    xi = rng.normal(size=6).astype(np.float32)
    return np.asarray(se3.se3_exp(jnp.asarray(xi)))


def test_cloud_is_pytree(random_cloud):
    leaves = jax.tree_util.tree_leaves(random_cloud)
    assert len(leaves) == 7
    mapped = jax.tree_util.tree_map(lambda a: a * 1.0, random_cloud)
    assert isinstance(mapped, GaussianCloud)
    assert mapped.sh_degree == random_cloud.sh_degree


def test_transform_means_covs_quats(rng, random_cloud):
    T = random_se3(rng)
    out = random_cloud.transform(jnp.asarray(T))
    R, t = T[:3, :3], T[:3, 3]

    np.testing.assert_allclose(
        np.asarray(out.xyz), np.asarray(random_cloud.xyz) @ R.T + t, atol=1e-5
    )
    full = np.asarray(random_cloud.get_full_covariance())
    np.testing.assert_allclose(
        np.asarray(out.get_full_covariance()),
        np.einsum("ij,njk,lk->nil", R, full, R),
        atol=1e-5,
    )
    # Quaternion update must be consistent with rotating the principal axes.
    R_old = np.asarray(math3d.quat_to_rotmat(random_cloud.get_rotation))
    R_new = np.asarray(math3d.quat_to_rotmat(out.get_rotation))
    np.testing.assert_allclose(R_new, np.einsum("ij,njk->nik", R, R_old), atol=1e-4)


def test_transform_rotates_sh(rng, random_cloud):
    """The rendered radiance of a rotated cloud, viewed from a rotated
    direction, must match the original cloud from the original direction."""
    T = np.eye(4, dtype=np.float32)
    R = np.asarray(
        math3d.axis_angle_to_rotmat(jnp.asarray(rng.normal(size=3)), jnp.asarray(0.8))
    )
    T[:3, :3] = R
    out = random_cloud.transform(jnp.asarray(T))

    dirs = rng.normal(size=(len(random_cloud), 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs.astype(np.float32)

    deg = random_cloud.sh_degree
    lhs = sh.eval_sh(deg, out.get_features, jnp.asarray(dirs))
    rhs = sh.eval_sh(deg, random_cloud.get_features, jnp.asarray(dirs @ R))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-3, atol=1e-4)


def test_transform_identity_is_noop(random_cloud):
    out = random_cloud.transform(jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(random_cloud.xyz), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.features_rest), np.asarray(random_cloud.features_rest), atol=1e-5
    )


def test_transform_composition(rng, random_cloud):
    T1, T2 = random_se3(rng), random_se3(rng)
    seq = random_cloud.transform(jnp.asarray(T1)).transform(jnp.asarray(T2))
    direct = random_cloud.transform(jnp.asarray(T2 @ T1))
    np.testing.assert_allclose(np.asarray(seq.xyz), np.asarray(direct.xyz), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(seq.covariance), np.asarray(direct.covariance), atol=1e-4
    )


def test_merge(rng, random_cloud):
    other = make_random_cloud(rng, n=32, sh_degree=random_cloud.sh_degree)
    T = random_se3(rng)
    merged = random_cloud.merge(other, jnp.asarray(T))
    assert merged.num_points == random_cloud.num_points + other.num_points
    np.testing.assert_allclose(
        np.asarray(merged.xyz[-32:]), np.asarray(other.xyz), atol=1e-6
    )
    transformed = random_cloud.transform(jnp.asarray(T))
    np.testing.assert_allclose(
        np.asarray(merged.xyz[: random_cloud.num_points]),
        np.asarray(transformed.xyz),
        atol=1e-6,
    )


def test_merge_degree_mismatch_raises(rng, random_cloud):
    other = make_random_cloud(rng, n=8, sh_degree=1)
    try:
        random_cloud.merge(other)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_pad_to(random_cloud):
    padded = random_cloud.pad_to(100)
    assert padded.num_points == 100
    # Padded splats must be invisible.
    op = np.asarray(padded.get_opacity)[random_cloud.num_points:]
    assert np.all(op < 1e-8)


def test_ply_roundtrip(tmp_path, rng, random_cloud):
    path = str(tmp_path / "cloud.ply")
    io_utils.save_gaussian_cloud(random_cloud, path)
    loaded = io_utils.load_gaussian_cloud(path)
    assert loaded.sh_degree == random_cloud.sh_degree
    for name in ("xyz", "features_dc", "features_rest", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(
            np.asarray(getattr(loaded, name)),
            np.asarray(getattr(random_cloud, name)),
            atol=1e-6,
            err_msg=name,
        )


def test_ply_header_layout(tmp_path, random_cloud):
    """Field names and order must match the 3DGS/reference layout exactly."""
    path = str(tmp_path / "cloud.ply")
    io_utils.save_gaussian_cloud(random_cloud, path)
    header = []
    with open(path, "rb") as f:
        for line in f:
            header.append(line.decode().strip())
            if line.startswith(b"end_header"):
                break
    props = [l.split()[-1] for l in header if l.startswith("property")]
    k_rest = (random_cloud.sh_degree + 1) ** 2 - 1
    expected = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * k_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    assert props == expected


def test_sparse_ply_roundtrip(tmp_path, rng):
    from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud

    pc = PointCloud(
        points=jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(0, 1, size=(20, 3)).astype(np.float32)),
    )
    path = str(tmp_path / "sparse.ply")
    io_utils.save_point_cloud(pc, path)
    loaded = io_utils.load_sparse_cloud(path)
    np.testing.assert_allclose(np.asarray(loaded.points), np.asarray(pc.points), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.colors), np.asarray(pc.colors), atol=1.0 / 255)


def test_type_sniffing(tmp_path, rng, random_cloud):
    from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud

    gpath = str(tmp_path / "g.ply")
    io_utils.save_gaussian_cloud(random_cloud, gpath)
    spath = str(tmp_path / "s.ply")
    io_utils.save_point_cloud(
        PointCloud(points=jnp.zeros((4, 3)), colors=jnp.zeros((4, 3))), spath
    )
    assert isinstance(io_utils.load_point_cloud_any(gpath), GaussianCloud)
    from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud as PC

    assert isinstance(io_utils.load_point_cloud_any(spath), PC)


def test_gaussian_to_point_cloud(random_cloud):
    pc = io_utils.gaussian_to_point_cloud(random_cloud)
    assert pc.num_points == random_cloud.num_points
    assert pc.covariances is not None
    cols = np.asarray(pc.colors)
    assert cols.min() >= 0.0 and cols.max() <= 1.0
