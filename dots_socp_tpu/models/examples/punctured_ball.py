"""Punctured ball: ring source to two split sinks (ref data/settings/punctured_ball.py)."""
import numpy as np

from dots_socp_tpu.models.density import cut_off


def get_mu(area_vertices, vertices):
    x0 = np.array([0.33, 0.5, 0.0])
    x10 = np.array([0.8, 0.2, 0.0])
    x11 = np.array([0.8, 0.8, 0.0])
    d = lambda c: np.linalg.norm(vertices - c, axis=1)
    mu0 = area_vertices * cut_off(d(x0) - 0.1, 0.1)
    mu1 = area_vertices * (
        cut_off((d(x10) - 0.1) * 2.0, 0.1) + cut_off((d(x11) - 0.1) * 2.0, 0.1)
    )
    return mu0, mu1
