"""Eight: opposite x-caps (ref data/settings/eight.py)."""
from dots_socp_tpu.models.density import cut_off


def get_mu(area_vertices, vertices):
    mu0 = area_vertices * cut_off(vertices[:, 0] - 0.5, 0.5)
    mu1 = area_vertices * cut_off(vertices[:, 0] + 0.7, 0.5)
    return mu0, mu1
