"""Procedural mesh generators.

`generate_plane_mesh` produces the same hexagonal-lattice triangulation of
the unit square as the reference's `data/meshes/plane.py:3-68` (same vertex
ordering and triangle connectivity so μ settings and exact-transport tests
are directly comparable), implemented vectorized.
"""

from __future__ import annotations

import numpy as np


def generate_plane_mesh(n: int = 50):
    """Regular triangular mesh on [0,1]^2 built from staggered rows.

    Rows are spaced dy = dx*sqrt(3)/2 apart; odd rows are shifted by dx/2,
    so each interior cell splits into two near-equilateral triangles.

    Returns (vertices (N,3), triangles (M,3), edges (K,2)).
    """
    dx = 1.0 / n
    dy = dx * np.sqrt(3.0) / 2.0
    n_rows = int(1.0 / dy) + 1
    n_cols = n + 1

    rows = np.arange(n_rows)
    cols = np.arange(n_cols)
    xx = cols[None, :] * dx + (rows[:, None] % 2) * (dx / 2.0)
    yy = np.broadcast_to(rows[:, None] * dy, (n_rows, n_cols))
    vertices = np.stack(
        [xx.reshape(-1), yy.reshape(-1), np.zeros(n_rows * n_cols)], axis=-1
    )

    def vid(i, j):
        return i * n_cols + j

    triangles = []
    for i in range(n_rows - 1):
        for j in range(n_cols - 1):
            if i % 2 == 0:
                triangles.append([vid(i, j), vid(i, j + 1), vid(i + 1, j)])
                triangles.append([vid(i, j + 1), vid(i + 1, j + 1), vid(i + 1, j)])
            else:
                triangles.append([vid(i, j), vid(i + 1, j + 1), vid(i + 1, j)])
                if j > 0:
                    triangles.append([vid(i, j - 1), vid(i, j), vid(i + 1, j)])
    triangles = np.asarray(triangles, dtype=np.int64)

    edge_pairs = np.concatenate(
        [triangles[:, [0, 1]], triangles[:, [1, 2]], triangles[:, [2, 0]]], axis=0
    )
    edges = np.unique(np.sort(edge_pairs, axis=1), axis=0)
    return vertices, triangles, edges


def generate_mesh(n: int = 50):
    """Alias so this module can be used as a .py mesh file via read_mesh."""
    return generate_plane_mesh(n=n)
