"""GaussianCloud: the central splat-cloud pytree.

TPU-native counterpart of the reference's `GaussianModel`
(`/root/reference/src/models/gaussian_model.py:21-290`), re-designed as an
immutable, registered JAX pytree of raw (pre-activation) parameter arrays so it
can flow through `jit`/`vmap`/`grad`/`pjit` and be sharded over device meshes.
Differences from the reference by design:

* immutable dataclass, methods return new clouds (no in-place mutation);
* no device bookkeeping — placement is JAX's job (`jax.device_put`, shardings)
  instead of `move_to_device` (`gaussian_model.py:224-235`);
* SE(3) transform also rotates higher-order SH via Wigner-D matrices, a
  capability the reference wrote but never wired
  (`/root/reference/src/utils/math_util.py:7-55`).

Raw storage matches the 3DGS PLY layout: xyz, features_dc [N,1,3],
features_rest [N,K-1,3], opacity logits [N,1], log-scales [N,3],
unnormalized quaternions (w,x,y,z) [N,4], plus the cached packed covariance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplattingregistration_tpu.ops import math3d, sh as sh_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianCloud:
    """A cloud of N 3D Gaussians with SH radiance.

    Activations mirror `GaussianModel.__init__`
    (`/root/reference/src/models/gaussian_model.py:40-45`): exp for scale,
    sigmoid for opacity, L2-normalize for rotation.
    """

    xyz: jax.Array               # [N, 3]
    features_dc: jax.Array       # [N, 1, 3]
    features_rest: jax.Array     # [N, K-1, 3] (K = (sh_degree+1)^2)
    opacity: jax.Array           # [N, 1] logits
    scaling: jax.Array           # [N, 3] log-scale
    rotation: jax.Array          # [N, 4] unnormalized quaternion (w, x, y, z)
    covariance: jax.Array        # [N, 6] packed symmetric, cached activation
    sh_degree: int = dataclasses.field(metadata={"static": True}, default=0)

    # ---------------------------------------------------------------- basic
    def __len__(self) -> int:
        return int(self.xyz.shape[0])

    @property
    def num_points(self) -> int:
        return int(self.xyz.shape[0])

    # ---------------------------------------------------------- activations
    @property
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jax.Array:
        return math3d.normalize(self.rotation)

    @property
    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jax.Array:
        """[N, K, 3] full SH stack, DC first (`gaussian_model.py:59-63`)."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def get_colors(self) -> jax.Array:
        """[N, 3] DC coefficients (`gaussian_model.py:65-67`)."""
        return self.features_dc[:, 0, :]

    @property
    def get_rgb(self) -> jax.Array:
        """[N, 3] DC converted to RGB."""
        return sh_ops.sh2rgb(self.get_colors)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """[N, 6] packed covariance (`gaussian_model.py:89-96`)."""
        if scaling_modifier == 1.0:
            return self.covariance
        return self.covariance * (scaling_modifier * scaling_modifier)

    def get_full_covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """[N, 3, 3] dense covariance (`gaussian_model.py:81-87`)."""
        return math3d.unpack_symmetric(self.get_covariance(scaling_modifier))

    # -------------------------------------------------------- constructors
    @classmethod
    def create(
        cls,
        xyz,
        features_dc,
        features_rest,
        opacity,
        scaling,
        rotation,
        sh_degree: int,
        covariance: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ) -> "GaussianCloud":
        """Build from raw (pre-activation) arrays; computes the covariance cache."""
        xyz = jnp.asarray(xyz, dtype)
        features_dc = jnp.asarray(features_dc, dtype).reshape(xyz.shape[0], 1, 3)
        k_rest = sh_ops.num_sh_coeffs(sh_degree) - 1
        features_rest = jnp.asarray(features_rest, dtype).reshape(xyz.shape[0], k_rest, 3)
        opacity = jnp.asarray(opacity, dtype).reshape(xyz.shape[0], 1)
        scaling = jnp.asarray(scaling, dtype).reshape(xyz.shape[0], 3)
        rotation = jnp.asarray(rotation, dtype).reshape(xyz.shape[0], 4)
        if covariance is None:
            covariance = math3d.covariance_from_scaling_rotation(
                jnp.exp(scaling), rotation
            )
        else:
            covariance = jnp.asarray(covariance, dtype).reshape(xyz.shape[0], 6)
        return cls(
            xyz=xyz,
            features_dc=features_dc,
            features_rest=features_rest,
            opacity=opacity,
            scaling=scaling,
            rotation=rotation,
            covariance=covariance,
            sh_degree=sh_degree,
        )

    @classmethod
    def from_mixture(cls, level, sh_degree: int) -> "GaussianCloud":
        """Build from a HEM mixture level (counterpart of `from_mixture`,
        `/root/reference/src/models/gaussian_model.py:141-153`).

        Unlike the reference (which stored raw eigenvalues as log-scales), the
        covariance is eigendecomposed into sqrt-eigenvalue scales and proper
        unit quaternions, so scale/rotation stay consistent with the cache.
        """
        cov6 = jnp.asarray(level.covariance).reshape(-1, 6)
        scales, quats = math3d.decompose_covariance(cov6)
        n = cov6.shape[0]
        opacities = jnp.asarray(level.opacities).reshape(n, 1)
        # Mixture opacities are linear-space; convert back to logits.
        logits = math3d.inverse_sigmoid(jnp.clip(opacities, 1e-6, 1.0 - 1e-6))
        return cls.create(
            xyz=jnp.asarray(level.xyz).reshape(n, 3),
            features_dc=jnp.asarray(level.colors).reshape(n, 1, 3),
            features_rest=jnp.asarray(level.features).reshape(
                n, sh_ops.num_sh_coeffs(sh_degree) - 1, 3
            ),
            opacity=logits,
            scaling=jnp.log(jnp.maximum(scales, 1e-10)),
            rotation=quats,
            sh_degree=sh_degree,
            covariance=cov6,
        )

    # ---------------------------------------------------------- transforms
    def transform(self, transformation: jax.Array, rotate_sh: bool = True) -> "GaussianCloud":
        """Apply a 4x4 SE(3) transform to the whole cloud.

        Semantics of `transform_gaussian_model`
        (`/root/reference/src/models/gaussian_model.py:210-222`): means get
        R x + t, covariances get R Σ Rᵀ, orientations get q_rot ⊗ q. Plus SH
        rotation (Wigner-D), which the reference omitted.
        """
        T = jnp.asarray(transformation, self.xyz.dtype)
        R = T[:3, :3]
        t = T[:3, 3]
        new_xyz = self.xyz @ R.T + t
        new_cov = math3d.transform_covariance(self.covariance, R)
        q_rot = math3d.rotmat_to_quat(R)
        new_rot = math3d.normalize(math3d.quat_multiply(q_rot[None, :], self.get_rotation))
        new_rest = (
            sh_ops.rotate_sh(self.features_rest, R, self.sh_degree)
            if rotate_sh
            else self.features_rest
        )
        return dataclasses.replace(
            self, xyz=new_xyz, covariance=new_cov, rotation=new_rot, features_rest=new_rest
        )

    def merge(self, other: "GaussianCloud", transformation: Optional[jax.Array] = None) -> "GaussianCloud":
        """Concatenate two clouds, optionally transforming self first.

        Counterpart of `get_merged_gaussian_point_clouds`
        (`/root/reference/src/models/gaussian_model.py:267-290`); requires
        equal SH degree, like the reference's assert at `:280`.
        """
        if self.sh_degree != other.sh_degree:
            raise ValueError(
                f"SH degree mismatch: {self.sh_degree} vs {other.sh_degree}"
            )
        first = self if transformation is None else self.transform(transformation)
        return GaussianCloud(
            xyz=jnp.concatenate([first.xyz, other.xyz]),
            features_dc=jnp.concatenate([first.features_dc, other.features_dc]),
            features_rest=jnp.concatenate([first.features_rest, other.features_rest]),
            opacity=jnp.concatenate([first.opacity, other.opacity]),
            scaling=jnp.concatenate([first.scaling, other.scaling]),
            rotation=jnp.concatenate([first.rotation, other.rotation]),
            covariance=jnp.concatenate([first.covariance, other.covariance]),
            sh_degree=self.sh_degree,
        )

    def select(self, indices: jax.Array) -> "GaussianCloud":
        """Gather a subset of splats (counterpart of Open3D `select_by_index`
        used at `/root/reference/src/controllers/registration_controller.py:52-56`)."""
        return jax.tree_util.tree_map(lambda a: a[indices], self)

    def pad_to(self, n: int) -> "GaussianCloud":
        """Pad to a static size with zero-opacity splats (TPU static shapes)."""
        cur = self.num_points
        if cur >= n:
            return self
        pad = n - cur

        def _pad(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths)

        padded = jax.tree_util.tree_map(_pad, self)
        # Padded opacity logits -> strongly negative so they never contribute.
        opacity = padded.opacity.at[cur:].set(-30.0)
        rotation = padded.rotation.at[cur:, 0].set(1.0)
        scaling = padded.scaling.at[cur:].set(-10.0)
        return dataclasses.replace(padded, opacity=opacity, rotation=rotation, scaling=scaling)

    # -------------------------------------------------------------- export
    def to_numpy_dict(self) -> dict:
        """Raw arrays as numpy, in PLY-layout order."""
        return {
            "xyz": np.asarray(self.xyz),
            "features_dc": np.asarray(self.features_dc),
            "features_rest": np.asarray(self.features_rest),
            "opacity": np.asarray(self.opacity),
            "scaling": np.asarray(self.scaling),
            "rotation": np.asarray(self.rotation),
        }
