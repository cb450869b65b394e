"""SE(3) Lie group/algebra utilities for pose representation and optimization.

The reference keeps poses as raw 4x4 numpy matrices mutated by the UI
(`/root/reference/src/models/ui_state_repository.py:5-20`). Here the pose is a
first-class differentiable object: 4x4 homogeneous matrices plus exp/log maps
on se(3) so optimizers (Gauss-Newton ICP updates, optax photometric pose
optimization) can work in the tangent space. All functions are jittable and
differentiable.

Twist convention: xi = (rho, phi) with rho the translational part and phi the
rotational part (axis * angle), both 3-vectors; exp(xi) applies V(phi) @ rho.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) exp map: [..., 3] axis-angle -> [..., 3, 3] rotation (Rodrigues).

    Uses Taylor-safe coefficients near theta = 0 so gradients are stable.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    K = _skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(rotmat: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation -> [..., 3] axis-angle; inverse of so3_exp."""
    tr = jnp.trace(rotmat, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of antisymmetric part
    w = jnp.stack(
        [
            rotmat[..., 2, 1] - rotmat[..., 1, 2],
            rotmat[..., 0, 2] - rotmat[..., 2, 0],
            rotmat[..., 1, 0] - rotmat[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / jnp.maximum(2.0 * sin_theta, _EPS))
    # Near theta = pi the vee part vanishes; fall back to diagonal extraction.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([rotmat[..., 0, 0], rotmat[..., 1, 1], rotmat[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag - cos_theta[..., None]) / jnp.maximum(1.0 - cos_theta[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis_sq)
    # Resolve signs from off-diagonals (largest-axis reference sign).
    sx = jnp.sign(rotmat[..., 2, 1] - rotmat[..., 1, 2])
    sy = jnp.sign(rotmat[..., 0, 2] - rotmat[..., 2, 0])
    sz = jnp.sign(rotmat[..., 1, 0] - rotmat[..., 0, 1])
    s = jnp.stack([sx, sy, sz], axis=-1)
    s = jnp.where(s == 0, _pi_axis_signs(rotmat, axis), s)
    pi_branch = axis * s * theta[..., None]
    return jnp.where(near_pi[..., None], pi_branch, w * scale[..., None])


def _pi_axis_signs(rotmat: jax.Array, axis: jax.Array) -> jax.Array:
    """Sign resolution for the theta ~ pi branch via off-diagonal products."""
    i = jnp.argmax(axis, axis=-1)
    sxy = jnp.sign(rotmat[..., 0, 1] + rotmat[..., 1, 0])
    sxz = jnp.sign(rotmat[..., 0, 2] + rotmat[..., 2, 0])
    syz = jnp.sign(rotmat[..., 1, 2] + rotmat[..., 2, 1])
    one = jnp.ones_like(sxy)
    sx = jnp.where(i == 0, one, jnp.where(i == 1, sxy, sxz))
    sy = jnp.where(i == 0, sxy, jnp.where(i == 1, one, syz))
    sz = jnp.where(i == 0, sxz, jnp.where(i == 1, syz, one))
    s = jnp.stack([sx, sy, sz], axis=-1)
    return jnp.where(s == 0, 1.0, s)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) exp map: [..., 6] twist (rho, phi) -> [..., 4, 4] transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
    )
    K = _skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * (K @ K)
    t = (V @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jax.Array) -> jax.Array:
    """[..., 4, 4] transform -> [..., 6] twist; inverse of se3_exp."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    K = _skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / jnp.maximum(2.0 * (1.0 - jnp.cos(theta)), _EPS))
        / jnp.maximum(theta2, _EPS * _EPS),
    )
    Vinv = eye - 0.5 * K + cot_term[..., None, None] * (K @ K)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def apply_se3(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (4,4) transform to [..., 3] points."""
    return points @ T[:3, :3].T + T[:3, 3]
