"""Tests for SE(3)/so(3) exp/log maps."""

import numpy as np
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops import se3


def test_so3_exp_log_roundtrip(rng):
    phi = rng.normal(size=(50, 3)).astype(np.float32)
    # keep |phi| < pi for unique log
    norms = np.linalg.norm(phi, axis=1, keepdims=True)
    phi = phi / norms * np.minimum(norms, 3.0)
    R = se3.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(phi2, phi, rtol=1e-3, atol=1e-4)


def test_so3_exp_small_angle():
    phi = jnp.asarray([[1e-9, 0.0, 0.0]])
    R = np.asarray(se3.so3_exp(phi))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(30, 6)).astype(np.float32)
    xi[:, 3:] *= 0.8
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, rtol=1e-3, atol=1e-4)


def test_se3_exp_is_rigid(rng):
    xi = jnp.asarray(rng.normal(size=(10, 6)).astype(np.float32))
    T = np.asarray(se3.se3_exp(xi))
    R = T[:, :3, :3]
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", R, R), np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(T[:, 3], np.broadcast_to([0, 0, 0, 1.0], (10, 4)), atol=1e-7)


def test_se3_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T @ se3.se3_inverse(T)), np.eye(4), atol=1e-5)


def test_apply_se3(rng):
    xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    T = se3.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    out = np.asarray(se3.apply_se3(T, pts))
    Tn = np.asarray(T)
    expect = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_so3_log_near_pi():
    axis = np.array([0.3, -0.5, 0.8])
    axis /= np.linalg.norm(axis)
    theta = np.pi - 1e-5
    R = se3.so3_exp(jnp.asarray(axis * theta))
    phi = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(np.abs(phi), np.abs(axis * theta), rtol=1e-2)
