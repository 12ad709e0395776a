"""Point-cloud / trajectory export.

Equivalent of the reference's PLY writer (utils/utils.py:414-447
SaveWorldImageToPLY) for the landmarks and trajectories this back-end
produces.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> None:
    """Write an ASCII PLY point cloud.

    points: (N, 3) float; colors: optional (N, 3) uint8 RGB.
    """
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.6f} {points[i, 1]:.6f} {points[i, 2]:.6f}"
            if colors is not None:
                c = np.asarray(colors[i], dtype=int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")


def export_keyframe_graph(graph, landmarks_path: str,
                          trajectory_path: Optional[str] = None) -> None:
    """Dump a KeyframeGraph's landmarks (and optionally trajectory) to PLY."""
    if graph.landmarks:
        write_ply(landmarks_path, np.stack(graph.landmarks))
    if trajectory_path is not None:
        traj = graph.trajectory()
        colors = np.zeros((len(traj), 3), np.uint8)
        colors[:, 0] = 255
        write_ply(trajectory_path, traj, colors)
