"""Trajectory accumulation and map frame utilities.

Covers the reference's peripheral nodes (SURVEY.md §2.7):
- ``path_generator``: accumulate poses into a path
  (``path_generator/include/path_generator/path_generator.hpp:44-116``);
- ``map_tf_generator``: static map->viewer transform at the map cloud
  centroid (``map_tf_generator/src/map_tf_generator_node.cpp:54-95``).
"""

from __future__ import annotations

import numpy as np

from lidar_feature_extraction_tpu.core.pose import Pose


class PathAccumulator:
    """Append poses; export as arrays (positions + wxyz quaternions)."""

    def __init__(self):
        self._q = []
        self._t = []
        self._stamps = []

    def append(self, pose: Pose, stamp: float | None = None) -> None:
        self._q.append(np.asarray(pose.q, np.float64))
        self._t.append(np.asarray(pose.t, np.float64))
        self._stamps.append(stamp if stamp is not None else len(self._q) - 1)

    def __len__(self) -> int:
        return len(self._q)

    @property
    def positions(self) -> np.ndarray:
        return np.stack(self._t) if self._t else np.zeros((0, 3))

    @property
    def quaternions(self) -> np.ndarray:
        return np.stack(self._q) if self._q else np.zeros((0, 4))

    @property
    def stamps(self) -> np.ndarray:
        return np.asarray(self._stamps)

    def save_tum(self, path: str) -> None:
        """TUM trajectory format: stamp x y z qx qy qz qw."""
        with open(path, "w") as f:
            for s, t, q in zip(self._stamps, self._t, self._q):
                f.write(f"{s} {t[0]} {t[1]} {t[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}\n")


def map_viewer_transform(map_points: np.ndarray,
                         valid: np.ndarray | None = None) -> np.ndarray:
    """Centroid of the map cloud — the static map->viewer translation
    the reference broadcasts for rviz centering."""
    pts = np.asarray(map_points)
    if valid is not None:
        pts = pts[np.asarray(valid)]
    if len(pts) == 0:
        return np.zeros(3)
    return pts.mean(axis=0)
