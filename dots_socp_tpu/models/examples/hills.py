"""Hills: two gaussian peaks to a y-halfspace (ref data/settings/hills.py)."""
import numpy as np


def get_mu(area_vertices, vertices):
    length_scale = 0.1
    center0 = vertices[5982, :]
    center1 = vertices[1347, :]
    d0 = np.sum((vertices - center0) ** 2, axis=1)
    d1 = np.sum((vertices - center1) ** 2, axis=1)
    mu0 = area_vertices * (
        np.exp(-d0 / length_scale**2) + np.exp(-d1 / length_scale**2)
    )
    mu1 = area_vertices * np.where(vertices[:, 1] > 0.4, 1.0, 0.0)
    return mu0, mu1
