"""Batched 3D math primitives (quaternions, rotations, symmetric covariances).

TPU-native counterpart of the reference's torch helpers
(`/root/reference/src/utils/general_utils.py:16-109`). Everything here is a
pure function over jnp arrays, batched over a leading N axis where noted, and
safe to `jit`/`vmap`/differentiate. Quaternions are (w, x, y, z), matching the
3DGS PLY layout (`/root/reference/src/models/gaussian_model.py:125-129`).

Symmetric 3x3 covariances are packed as 6 elements in row-major upper-triangle
order [xx, xy, xz, yy, yz, zz]
(`/root/reference/src/utils/general_utils.py:20-44`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    """log(x / (1-x)); inverse of the opacity activation."""
    return jnp.log(x / (1.0 - x))


def pack_symmetric(m: jax.Array) -> jax.Array:
    """[..., 3, 3] symmetric matrix -> [..., 6] packed [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 0, 1], m[..., 0, 2], m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]],
        axis=-1,
    )


def unpack_symmetric(v: jax.Array) -> jax.Array:
    """[..., 6] packed -> [..., 3, 3] symmetric matrix."""
    row0 = jnp.stack([v[..., 0], v[..., 1], v[..., 2]], axis=-1)
    row1 = jnp.stack([v[..., 1], v[..., 3], v[..., 4]], axis=-1)
    row2 = jnp.stack([v[..., 2], v[..., 4], v[..., 5]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    """Safe L2 normalization."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, _EPS)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """[..., 4] (w,x,y,z) quaternion -> [..., 3, 3] rotation matrix.

    Normalizes internally (matches `build_rotation`,
    `/root/reference/src/utils/general_utils.py:47-68`).
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> [..., 4] (w,x,y,z) unit quaternion.

    Branch-free Shepperd's method: computes all four candidate quaternions and
    selects by the largest denominator, so it is robust for all rotations
    (unlike the trace-only formula in
    `/root/reference/src/utils/general_utils.py:94-109`, which divides by zero
    for 180-degree rotations) and remains jittable.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, _EPS)) * 0.5

    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand_w = jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], axis=-1)
    cand_x = jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)], axis=-1)
    cand_y = jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)], axis=-1)
    cand_z = jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3], axis=-1)

    case = jnp.argmax(jnp.stack([w0, x1, y2, z3], axis=-1), axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4(case), 4(comp)]
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b for (w,x,y,z) quaternions, broadcastable.

    `R(a ⊗ b) = R(a) R(b)`. Applying a world rotation q_rot to a splat with
    orientation q yields `quat_multiply(q_rot, q)` — the same composition as
    `/root/reference/src/models/gaussian_model.py:199-221` (which writes the
    operands in the opposite argument order for the same product).
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """[..., 3] scales (activated) + [..., 4] quats -> L = R diag(s), [..., 3, 3].

    Matches `build_scaling_rotation`
    (`/root/reference/src/utils/general_utils.py:71-80`).
    """
    return quat_to_rotmat(q) * s[..., None, :]


def covariance_from_scaling_rotation(
    s: jax.Array, q: jax.Array, scaling_modifier: float = 1.0
) -> jax.Array:
    """Activated scales + quats -> packed 6-covariance Σ = L Lᵀ.

    Matches `build_covariance_from_scaling_rotation`
    (`/root/reference/src/models/gaussian_model.py:34-38`).
    """
    L = build_scaling_rotation(scaling_modifier * s, q)
    return pack_symmetric(L @ jnp.swapaxes(L, -1, -2))


def axis_angle_to_rotmat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation formula; axis [..., 3] (unit), angle scalar [...].

    Matches `axis_angle_rotation` (`/root/reference/src/utils/math_util.py:88-104`).
    """
    axis = normalize(axis)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    omc = 1.0 - c
    return jnp.stack(
        [
            jnp.stack([c + x * x * omc, x * y * omc - z * s, x * z * omc + y * s], axis=-1),
            jnp.stack([y * x * omc + z * s, c + y * y * omc, y * z * omc - x * s], axis=-1),
            jnp.stack([z * x * omc - y * s, z * y * omc + x * s, c + z * z * omc], axis=-1),
        ],
        axis=-2,
    )


def transform_covariance(cov6: jax.Array, rotmat: jax.Array) -> jax.Array:
    """Conjugate packed covariances by a rotation: R Σ Rᵀ.

    Matches `/root/reference/src/models/gaussian_model.py:215-217`.
    """
    full = unpack_symmetric(cov6)
    return pack_symmetric(rotmat @ full @ rotmat.T)


def decompose_covariance(cov6: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Packed covariances -> (scales [N,3], quats [N,4]) with Σ = R diag(s²) Rᵀ.

    Principled version of `decompose_covariance_matrix`
    (`/root/reference/src/models/gaussian_model.py:242-265`): eigendecompose,
    scales = sqrt(clamped eigenvalues), quaternion from the eigenvector basis
    with determinant fixed to +1 (the reference instead stored raw eigenvalues
    as log-scales and reordered eigenvectors by axis correspondence, which can
    collide and produce improper rotations).
    """
    full = unpack_symmetric(cov6)
    eigvals, eigvecs = jnp.linalg.eigh(full)  # ascending
    scales = jnp.sqrt(jnp.maximum(eigvals, _EPS))
    # Fix improper rotations (det = -1) by flipping the last eigenvector.
    det = jnp.linalg.det(eigvecs)
    eigvecs = eigvecs.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    quats = rotmat_to_quat(eigvecs)
    return scales, quats


def kabsch_rotation(H: jax.Array, iters: int = 8) -> jax.Array:
    """Optimal proper rotation R maximizing tr(R H) from a correlation matrix
    H = Σ w p qᵀ (p source-centered, q target-centered), batched [..., 3, 3].

    Horn's quaternion method (closed-form absolute orientation): the optimal
    unit quaternion is the dominant eigenvector of a symmetric 4x4 N-matrix
    built from H. The dominant eigenvector is extracted by shifted
    power iteration with repeated matrix squaring (`iters` squarings ≈ 2^iters
    power steps) — pure 4x4 matmuls, exact in f32 on the MXU/VPU.

    This deliberately avoids `jnp.linalg.svd`: on the TPU backend the f32 SVD
    returns visibly non-orthogonal factors (~3% error), which silently turned
    ICP's rigid updates into contractions. Horn's method always yields a
    proper rotation (det +1), also fixing the reflection case Kabsch handles
    with a sign flip.
    """
    S00, S01, S02 = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    S10, S11, S12 = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    S20, S21, S22 = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    row0 = jnp.stack([S00 + S11 + S22, S12 - S21, S20 - S02, S01 - S10], axis=-1)
    row1 = jnp.stack([S12 - S21, S00 - S11 - S22, S01 + S10, S20 + S02], axis=-1)
    row2 = jnp.stack([S20 - S02, S01 + S10, S11 - S00 - S22, S12 + S21], axis=-1)
    row3 = jnp.stack([S01 - S10, S20 + S02, S12 + S21, S22 - S00 - S11], axis=-1)
    N = jnp.stack([row0, row1, row2, row3], axis=-2)  # [..., 4, 4]

    # Shift by the Frobenius norm: A = N + ||N||_F I is PSD and its dominant
    # eigenvector is the max-eigenvalue eigenvector of N.
    fro = jnp.sqrt(jnp.sum(N * N, axis=(-2, -1), keepdims=True))
    A = N + jnp.eye(4, dtype=N.dtype) * jnp.maximum(fro, _EPS)
    # Repeated squaring with renormalization (prevents overflow).
    for _ in range(iters):
        A = A @ A
        A = A / jnp.maximum(
            jnp.sqrt(jnp.sum(A * A, axis=(-2, -1), keepdims=True)), _EPS
        )
    # Start vector not orthogonal to any rotation quaternion in general; the
    # huge effective power (2^iters) washes out any tiny overlap deficiency.
    q0 = jnp.array([1.0, 0.1, 0.2, 0.3], dtype=N.dtype)
    q = A @ jnp.broadcast_to(q0, N.shape[:-2] + (4,))[..., None]
    return quat_to_rotmat(normalize(q[..., 0]))


def make_se3(rotmat: jax.Array, translation: jax.Array) -> jax.Array:
    """(3,3) + (3,) -> (4,4) homogeneous transform."""
    top = jnp.concatenate([rotmat, translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
