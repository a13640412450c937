"""Minimal trimesh stand-in (test tooling only).

Provides the small Trimesh surface the reference's geometry normalization
uses: mutable vertices, area-weighted centroid, and directed face edges.
"""

import numpy as np


class Trimesh:
    def __init__(self, vertices=None, faces=None, process=False):
        self.vertices = np.asarray(vertices, dtype=np.float64).copy()
        self.faces = np.asarray(faces, dtype=np.int64).copy()

    @property
    def centroid(self):
        pts = self.vertices[self.faces]
        centers = pts.mean(axis=1)
        areas = 0.5 * np.linalg.norm(
            np.cross(pts[:, 1] - pts[:, 0], pts[:, 2] - pts[:, 0]), axis=1
        )
        return (centers * areas[:, None]).sum(0) / areas.sum()

    @property
    def edges(self):
        f = self.faces
        return np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
