"""Workspace: the session-state container (repository analogue).

Counterpart of the reference's two Qt-observable repositories
(`/root/reference/src/models/data_repository.py:4-38`,
`ui_state_repository.py:5-20`): per-level cloud lists for both inputs, plane
fits, the last registration record, and THE central 4x4 transformation that
every registration writes and every merger/renderer reads
(`registration_controller.py:154-155`). Change notification is a plain
callback list instead of Qt signals.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.models.point_cloud import PointCloud
from gaussiansplattingregistration_tpu.models.registration_data import (
    RegistrationResult,
)


@dataclasses.dataclass
class Workspace:
    """Mutable session state for interactive / scripted use."""

    # Per-HEM-level lists; index 0 = the loaded clouds (data_repository.py:11-16).
    gaussian_list_first: List[GaussianCloud] = dataclasses.field(default_factory=list)
    gaussian_list_second: List[GaussianCloud] = dataclasses.field(default_factory=list)
    point_list_first: List[PointCloud] = dataclasses.field(default_factory=list)
    point_list_second: List[PointCloud] = dataclasses.field(default_factory=list)
    current_index: int = 0                       # HEM level selector (:26)

    # Plane fitting results, per input cloud (data_repository.py:19-24:
    # `planes`, `first_plane_indices`, `second_plane_indices`).
    plane_coefficients_first: List[np.ndarray] = dataclasses.field(default_factory=list)
    plane_coefficients_second: List[np.ndarray] = dataclasses.field(default_factory=list)
    plane_indices_first: List[np.ndarray] = dataclasses.field(default_factory=list)
    plane_indices_second: List[np.ndarray] = dataclasses.field(default_factory=list)

    last_registration: Optional[RegistrationResult] = None  # (:29)

    _transformation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4)
    )
    _listeners: List[Callable[[np.ndarray], None]] = dataclasses.field(
        default_factory=list
    )

    # ------------------------------------------------------- transformation
    @property
    def transformation(self) -> np.ndarray:
        return self._transformation

    @transformation.setter
    def transformation(self, value) -> None:
        """Set + notify only on actual change (ui_state_repository.py:13-20)."""
        value = np.asarray(value, np.float64)
        if np.array_equal(value, self._transformation):
            return
        self._transformation = value
        for fn in self._listeners:
            fn(value)

    def on_transformation_changed(self, fn: Callable[[np.ndarray], None]) -> None:
        self._listeners.append(fn)

    # ------------------------------------------------------------- clouds
    def load_pair(self, first: GaussianCloud, second: GaussianCloud) -> None:
        """Reset level lists to the loaded pair
        (point_cloud_io_controller.py:62-83 semantics)."""
        from gaussiansplattingregistration_tpu.utils import io as gio

        if first.sh_degree != second.sh_degree:
            raise ValueError(
                f"SH degree mismatch: {first.sh_degree} vs {second.sh_degree}"
            )
        self.gaussian_list_first = [first]
        self.gaussian_list_second = [second]
        self.point_list_first = [gio.gaussian_to_point_cloud(first)]
        self.point_list_second = [gio.gaussian_to_point_cloud(second)]
        self.current_index = 0

    def append_mixture_levels(self, levels_first, levels_second, sh_degree) -> None:
        """Append HEM levels 1..N (downsampler_controller.py:74-87)."""
        from gaussiansplattingregistration_tpu.ops import hem
        from gaussiansplattingregistration_tpu.utils import io as gio

        for lvl in hem.mixture_levels_to_clouds(levels_first, sh_degree):
            self.gaussian_list_first.append(lvl)
            self.point_list_first.append(gio.gaussian_to_point_cloud(lvl))
        for lvl in hem.mixture_levels_to_clouds(levels_second, sh_degree):
            self.gaussian_list_second.append(lvl)
            self.point_list_second.append(gio.gaussian_to_point_cloud(lvl))

    @property
    def current_pair(self):
        i = self.current_index
        return self.point_list_first[i], self.point_list_second[i]

    @property
    def inlier_pair(self):
        """The LEVEL-0 pair restricted to the concatenated plane-inlier
        subsets — what every `execute_*_registration_inlier` registers on
        (`registration_controller.py:30-36,54-60,77-83`)."""
        from gaussiansplattingregistration_tpu.pipelines.planes import (
            select_plane_inliers,
        )

        if not self.plane_indices_first or not self.plane_indices_second:
            raise ValueError(
                "no fitted planes stored — run plane fitting on both clouds "
                "before inlier registration"
            )
        return (
            select_plane_inliers(self.point_list_first[0], self.plane_indices_first),
            select_plane_inliers(self.point_list_second[0], self.plane_indices_second),
        )

    def clear_planes(self) -> None:
        self.plane_coefficients_first = []
        self.plane_coefficients_second = []
        self.plane_indices_first = []
        self.plane_indices_second = []

    def apply_plane_merge(self, params, seed: int = 0) -> None:
        """Per-plane HEM merge of BOTH loaded clouds; the resulting levels
        replace any existing HEM levels and the plane state is cleared —
        `DownsamplerController.merge_plane_inliers` +
        `handle_plane_merge_results` semantics
        (`downsampler_controller.py:43-69,90-97`: trim lists to level 0,
        extend with the merged levels, clear planes)."""
        from gaussiansplattingregistration_tpu.pipelines.planes import (
            merge_plane_inliers,
        )
        from gaussiansplattingregistration_tpu.utils import io as gio

        if not self.gaussian_list_first or not self.gaussian_list_second:
            raise ValueError("load two Gaussian clouds before plane merging")
        if not self.plane_indices_first or not self.plane_indices_second:
            raise ValueError("no fitted planes stored — run plane fitting "
                             "on both clouds first")
        levels_first = merge_plane_inliers(
            self.gaussian_list_first[0], self.plane_indices_first, params,
            seed=seed,
        )
        levels_second = merge_plane_inliers(
            self.gaussian_list_second[0], self.plane_indices_second, params,
            seed=seed + 1,
        )
        self.gaussian_list_first = self.gaussian_list_first[:1]
        self.gaussian_list_second = self.gaussian_list_second[:1]
        self.point_list_first = self.point_list_first[:1]
        self.point_list_second = self.point_list_second[:1]
        for lvl in levels_first:
            self.gaussian_list_first.append(lvl)
            self.point_list_first.append(gio.gaussian_to_point_cloud(lvl))
        for lvl in levels_second:
            self.gaussian_list_second.append(lvl)
            self.point_list_second.append(gio.gaussian_to_point_cloud(lvl))
        self.clear_planes()
