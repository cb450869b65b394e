"""Tests for SH evaluation and Wigner-D rotation.

Oracle for rotation (SURVEY.md §4): rotating coefficients then evaluating at a
direction d must equal evaluating the original coefficients at R^T d — the
defining property of the Wigner matrices, independent of any external library.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.ops import math3d, sh


def test_sh2rgb_roundtrip():
    rgb = jnp.asarray([[0.2, 0.5, 0.8]])
    np.testing.assert_allclose(np.asarray(sh.sh2rgb(sh.rgb2sh(rgb))), np.asarray(rgb), atol=1e-6)


def test_eval_sh_dc_only(rng):
    coeffs = jnp.asarray(rng.normal(size=(5, 1, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    out = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out), sh.SH_C0 * np.asarray(coeffs)[:, 0, :], atol=1e-6)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_wigner_rotation_property(rng, degree):
    """c' = D c  must satisfy  f_{c'}(d) = f_c(R^T d) for all directions."""
    n = 16
    k = (degree + 1) ** 2
    coeffs = rng.normal(size=(n, k, 3)).astype(np.float32)
    axis = rng.normal(size=3)
    angle = 1.1
    R = np.asarray(math3d.axis_angle_to_rotmat(jnp.asarray(axis), jnp.asarray(angle)))

    rest = jnp.asarray(coeffs[:, 1:, :])
    rotated_rest = sh.rotate_sh(rest, jnp.asarray(R), degree)
    rotated = jnp.concatenate([jnp.asarray(coeffs[:, :1, :]), rotated_rest], axis=1)

    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs.astype(np.float32)

    lhs = sh.eval_sh(degree, rotated, jnp.asarray(dirs))
    rhs = sh.eval_sh(degree, jnp.asarray(coeffs), jnp.asarray(dirs @ R))  # R^T d  (row vec)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-3, atol=1e-4)


def test_wigner_matrices_orthogonal(rng):
    axis = rng.normal(size=3)
    R = math3d.axis_angle_to_rotmat(jnp.asarray(axis), jnp.asarray(0.6))
    for ell, D in enumerate(sh.wigner_d_matrices(3, R), start=1):
        D = np.asarray(D)
        np.testing.assert_allclose(D @ D.T, np.eye(2 * ell + 1), atol=1e-5)


def test_wigner_identity():
    mats = sh.wigner_d_matrices(3, jnp.eye(3))
    for ell, D in enumerate(mats, start=1):
        np.testing.assert_allclose(np.asarray(D), np.eye(2 * ell + 1), atol=1e-6)


def test_rotate_sh_composition(rng):
    """Rotating by R1 then R2 equals rotating by R2 @ R1."""
    degree = 3
    rest = jnp.asarray(rng.normal(size=(4, 15, 3)).astype(np.float32))
    R1 = np.asarray(math3d.axis_angle_to_rotmat(jnp.asarray(rng.normal(size=3)), jnp.asarray(0.5)))
    R2 = np.asarray(math3d.axis_angle_to_rotmat(jnp.asarray(rng.normal(size=3)), jnp.asarray(-0.9)))
    seq = sh.rotate_sh(sh.rotate_sh(rest, jnp.asarray(R1), degree), jnp.asarray(R2), degree)
    direct = sh.rotate_sh(rest, jnp.asarray(R2 @ R1), degree)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(direct), rtol=1e-3, atol=1e-4)
