"""Pinhole camera model with interactive orbit controls as pure functions.

Counterpart of the reference `Camera`
(`/root/reference/src/models/camera.py:8-122`), re-designed as an immutable
JAX pytree. The view-matrix convention matches 3DGS `getWorld2View2`
(`/root/reference/src/utils/graphics_utils.py:24-35`): `R` is the
camera-to-world rotation stored transposed, `T` the world-to-camera
translation; `viewmat = [[Rᵀ, T], [0, 1]]`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from gaussiansplattingregistration_tpu.ops import math3d


def fov2focal(fov: float, pixels: float) -> float:
    """(`/root/reference/src/utils/graphics_utils.py:50-51`)."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov_x2fov_y(fov_x: float, aspect_ratio: float) -> float:
    return 2.0 * math.atan(math.tan(fov_x / 2.0) / aspect_ratio)


def focal_lengths_from_spec(width: int, height: int, value: float, fov_type: int):
    """FOV input modes of the rasterizer tab
    (`/root/reference/src/utils/graphics_utils.py:91-108`): 0 = default,
    1 = field-of-view (radians, or degrees if > pi), 2 = focal length fx."""
    if fov_type == 0:
        return 0.0, 0.0
    if fov_type == 1:
        if value > math.pi:
            value = value * math.pi / 180.0
        return fov2focal(value, width), fov2focal(value, height)
    if fov_type == 2:
        fx = value
        fov_x = focal2fov(fx, width)
        fov_y = fov_x2fov_y(fov_x, width / height)
        return fx, fov2focal(fov_y, height)
    raise ValueError(f"unknown fov_type {fov_type}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Immutable pinhole camera.

    `rotation` is camera-to-world (the reference's `R`), `position` the
    world-to-camera translation (the reference's `T`), mirroring
    `/root/reference/src/models/camera.py:17-29`.
    """

    rotation: jax.Array  # (3, 3)
    position: jax.Array  # (3,)
    fx: jax.Array        # scalar
    fy: jax.Array        # scalar
    width: int = dataclasses.field(metadata={"static": True}, default=0)
    height: int = dataclasses.field(metadata={"static": True}, default=0)
    image_name: str = dataclasses.field(metadata={"static": True}, default="")

    # ------------------------------------------------------------- factory
    @classmethod
    def create(cls, R, T, fx, fy, width, height, image_name="") -> "Camera":
        return cls(
            rotation=jnp.asarray(R, jnp.float32),
            position=jnp.asarray(T, jnp.float32),
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            width=int(width),
            height=int(height),
            image_name=image_name,
        )

    @classmethod
    def from_json_entry(cls, entry: dict) -> "Camera":
        """Build from one 3DGS `cameras.json` record (counterpart of
        `load_cameras_clicked`, `/root/reference/src/gui/tabs/evaluation_tab.py:92-122`
        + `convert_to_camera_transform`,
        `/root/reference/src/utils/general_utils.py:83-91`)."""
        import numpy as np

        rot = np.asarray(entry["rotation"], dtype=np.float64)
        pos = np.asarray(entry["position"], dtype=np.float64)
        w2c = np.eye(4)
        w2c[:3, :3] = rot
        w2c[:3, 3] = pos
        rt = np.linalg.inv(w2c)
        R = rt[:3, :3].T
        T = rt[:3, 3]
        return cls.create(
            R, T, entry["fx"], entry["fy"], entry["width"], entry["height"],
            image_name=entry.get("img_name", ""),
        )

    # ---------------------------------------------------------- projection
    @property
    def intrinsics(self) -> jax.Array:
        """(3, 3) K matrix with principal point at the image center
        (`/root/reference/src/models/camera.py:21-25`)."""
        zero = jnp.zeros_like(self.fx)
        one = jnp.ones_like(self.fx)
        cx = jnp.asarray(self.width / 2.0, jnp.float32)
        cy = jnp.asarray(self.height / 2.0, jnp.float32)
        return jnp.stack(
            [
                jnp.stack([self.fx, zero, cx]),
                jnp.stack([zero, self.fy, cy]),
                jnp.stack([zero, zero, one]),
            ]
        )

    @property
    def viewmat(self) -> jax.Array:
        """(4, 4) world-to-camera matrix (`getWorld2View2` semantics)."""
        return math3d.make_se3(self.rotation.T, self.position)

    @property
    def cam_center(self) -> jax.Array:
        """Camera center in world coordinates."""
        return -(self.rotation @ self.position)

    def with_viewmat(self, viewmat: jax.Array) -> "Camera":
        """Set pose from a 4x4 view matrix (counterpart of `set_viewmat`,
        `/root/reference/src/models/camera.py:117-122`)."""
        V = jnp.asarray(viewmat, jnp.float32)
        return dataclasses.replace(self, rotation=V[:3, :3].T, position=V[:3, 3])

    def resized(self, scale: float) -> "Camera":
        """Scale resolution and focal lengths together."""
        return dataclasses.replace(
            self,
            fx=self.fx * scale,
            fy=self.fy * scale,
            width=int(round(self.width * scale)),
            height=int(round(self.height * scale)),
        )

    # -------------------------------------------------- interactive orbit
    # Pure-function versions of the reference's mutating controls
    # (`/root/reference/src/models/camera.py:32-112`).
    _RIGHT = (1.0, 0.0, 0.0)
    _UP = (0.0, 1.0, 0.0)
    _FORWARD = (0.0, 0.0, 1.0)

    def rotate(self, dx: float, dy: float) -> "Camera":
        up = self.rotation @ jnp.array(self._UP)
        right = self.rotation @ jnp.array(self._RIGHT)
        yaw = math3d.axis_angle_to_rotmat(up, jnp.asarray(dx, jnp.float32))
        pitch = math3d.axis_angle_to_rotmat(right, jnp.asarray(-dy, jnp.float32))
        return dataclasses.replace(self, rotation=yaw @ pitch @ self.rotation)

    def translate(self, dx: float, dy: float) -> "Camera":
        move = (
            jnp.array(self._RIGHT) * (dx / self.fx)
            + jnp.array(self._UP) * (dy / self.fy)
        )
        return dataclasses.replace(self, position=self.position + move)

    def roll(self, dx: float) -> "Camera":
        radians = 4.0 * math.pi * dx / max(self.height, 1)
        rot = math3d.axis_angle_to_rotmat(jnp.array(self._FORWARD), jnp.asarray(radians, jnp.float32))
        return dataclasses.replace(self, rotation=self.rotation @ rot)

    def zoom(self, delta: float, aabb_min, aabb_max) -> "Camera":
        """Zoom toward/away from the scene, distance-scaled like the
        reference (`/root/reference/src/models/camera.py:81-96`); the AABB
        clamping heuristic (`can_zoom`, `:98-112`) is applied."""
        aabb_min = jnp.asarray(aabb_min, jnp.float32)
        aabb_max = jnp.asarray(aabb_max, jnp.float32)
        model_size = jnp.linalg.norm(aabb_max - aabb_min)
        center = (aabb_min + aabb_max) / 2.0
        length = jnp.linalg.norm(center - self.position)
        length = jnp.maximum(0.02 * model_size, length)
        dist = delta * 0.05 * length
        new_pos = self.position + dist * jnp.array(self._FORWARD)
        return dataclasses.replace(self, position=new_pos)


def look_at(eye, lookat, up, zoom: float = 1.0, forward: str = "-z") -> jax.Array:
    """Build a 4x4 view matrix (counterpart of `look_at`,
    `/root/reference/src/utils/math_util.py:58-85`).

    forward="-z" reproduces the reference exactly (OpenGL-style: the camera
    looks along its NEGATIVE z axis — the convention of the Open3D viewer
    the reference wrote it for). The rasterizer (`ops/rasterize.py`) uses
    the +z-forward COLMAP/3DGS convention and culls z <= near, so cameras
    built for it need forward="+z" (same axes as the CLI's camera builder,
    `cli/main.py _make_cli_camera`)."""
    eye = jnp.asarray(eye, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    front = math3d.normalize(lookat - eye)
    eye = lookat - front * zoom
    if forward == "+z":
        z_axis = front
    elif forward == "-z":
        z_axis = -front
    else:
        raise ValueError(f"forward must be '+z' or '-z', got {forward!r}")
    x_axis = math3d.normalize(jnp.cross(up, z_axis))
    y_axis = jnp.cross(z_axis, x_axis)
    R = jnp.stack([x_axis, y_axis, z_axis])
    t = -R @ eye
    return math3d.make_se3(R, t)
