"""Unit tests for ops.math3d: quaternion/rotation/covariance semantics.

Oracles per SURVEY.md §4: reference semantics from
/root/reference/src/utils/general_utils.py and scipy-free identities.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.ops import math3d


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_pack_unpack_roundtrip(rng):
    v = rng.normal(size=(10, 6)).astype(np.float32)
    m = math3d.unpack_symmetric(jnp.asarray(v))
    assert np.allclose(np.asarray(m), np.swapaxes(np.asarray(m), -1, -2))
    v2 = math3d.pack_symmetric(m)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-7)


def test_quat_to_rotmat_orthonormal(rng):
    q = random_quats(rng, 50)
    R = np.asarray(math3d.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 100)
    # Canonicalize sign: w >= 0
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    R = math3d.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(math3d.rotmat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_rotmat_to_quat_180_degrees():
    # Trace-formula failure case the reference has; ours must handle it.
    R = np.diag([1.0, -1.0, -1.0])  # 180 deg about x
    q = np.asarray(math3d.rotmat_to_quat(jnp.asarray(R)))
    R2 = np.asarray(math3d.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_multiply_matches_matrix_product(rng):
    a = random_quats(rng, 20)
    b = random_quats(rng, 20)
    q_ab = math3d.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    R_ab = np.asarray(math3d.quat_to_rotmat(q_ab))
    R_a = np.asarray(math3d.quat_to_rotmat(jnp.asarray(a)))
    R_b = np.asarray(math3d.quat_to_rotmat(jnp.asarray(b)))
    np.testing.assert_allclose(R_ab, np.einsum("nij,njk->nik", R_a, R_b), atol=1e-5)


def test_covariance_from_scaling_rotation(rng):
    n = 30
    s = rng.uniform(0.1, 2.0, size=(n, 3)).astype(np.float32)
    q = random_quats(rng, n).astype(np.float32)
    cov6 = np.asarray(math3d.covariance_from_scaling_rotation(jnp.asarray(s), jnp.asarray(q)))
    # Oracle: R diag(s^2) R^T
    R = np.asarray(math3d.quat_to_rotmat(jnp.asarray(q)))
    full = np.einsum("nij,nj,nkj->nik", R, s**2, R)
    np.testing.assert_allclose(
        np.asarray(math3d.unpack_symmetric(jnp.asarray(cov6))), full, rtol=1e-4, atol=1e-5
    )


def test_covariance_modifier_scales_quadratically(rng):
    s = rng.uniform(0.1, 1.0, size=(5, 3)).astype(np.float32)
    q = random_quats(rng, 5).astype(np.float32)
    c1 = np.asarray(math3d.covariance_from_scaling_rotation(jnp.asarray(s), jnp.asarray(q), 1.0))
    c2 = np.asarray(math3d.covariance_from_scaling_rotation(jnp.asarray(s), jnp.asarray(q), 2.0))
    np.testing.assert_allclose(c2, 4.0 * c1, rtol=1e-4)


def test_transform_covariance_conjugation(rng):
    cov6 = rng.normal(size=(8, 6)).astype(np.float32)
    axis = rng.normal(size=3)
    R = np.asarray(math3d.axis_angle_to_rotmat(jnp.asarray(axis), jnp.asarray(0.7)))
    out = np.asarray(math3d.transform_covariance(jnp.asarray(cov6), jnp.asarray(R)))
    full = np.asarray(math3d.unpack_symmetric(jnp.asarray(cov6)))
    expect = np.einsum("ij,njk,lk->nil", R, full, R)
    np.testing.assert_allclose(
        np.asarray(math3d.unpack_symmetric(jnp.asarray(out))), expect, atol=1e-5
    )


def test_axis_angle_rotation_basics():
    Rz90 = np.asarray(math3d.axis_angle_to_rotmat(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 2)))
    np.testing.assert_allclose(Rz90 @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_decompose_covariance_roundtrip(rng):
    n = 40
    s = rng.uniform(0.05, 0.5, size=(n, 3)).astype(np.float32)
    q = random_quats(rng, n).astype(np.float32)
    cov6 = math3d.covariance_from_scaling_rotation(jnp.asarray(s), jnp.asarray(q))
    scales, quats = math3d.decompose_covariance(cov6)
    cov6_re = math3d.covariance_from_scaling_rotation(scales, quats)
    np.testing.assert_allclose(np.asarray(cov6_re), np.asarray(cov6), rtol=1e-3, atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9])
    import jax

    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(math3d.inverse_sigmoid(x))), np.asarray(x), atol=1e-6
    )


def test_kabsch_rotation_recovers_rotation(rng):
    # Exact-correspondence correlation matrix must recover the rotation
    # (and stay exactly orthogonal — unlike jnp.linalg.svd on TPU f32).
    q = random_quats(rng, 20)
    R_true = np.asarray(math3d.quat_to_rotmat(jnp.asarray(q)))  # [20, 3, 3]
    p = rng.normal(size=(20, 500, 3)).astype(np.float32)
    tgt = np.einsum("nij,nkj->nki", R_true, p)
    H = np.einsum("nki,nkj->nij", p, tgt)  # sum p q^T
    R = np.asarray(math3d.kabsch_rotation(jnp.asarray(H.astype(np.float32))))
    np.testing.assert_allclose(R, R_true, atol=5e-4)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    assert np.all(np.linalg.det(R) > 0.99)


def test_kabsch_rotation_reflection_case(rng):
    # Degenerate/noisy H with negative determinant must still give a proper
    # rotation (Horn's method optimizes over rotations only).
    H = np.diag([1.0, 0.5, -2.0]).astype(np.float32)
    R = np.asarray(math3d.kabsch_rotation(jnp.asarray(H)))
    assert np.linalg.det(R) > 0.99
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
