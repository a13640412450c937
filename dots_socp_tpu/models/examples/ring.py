"""Ring: opposite y-caps (ref data/settings/ring.py)."""
from dots_socp_tpu.models.density import cut_off


def get_mu(area_vertices, vertices):
    mu0 = area_vertices * cut_off(-vertices[:, 1] + 0.875, 0.1)
    mu1 = area_vertices * cut_off(vertices[:, 1] + 0.875, 0.1)
    return mu0, mu1
