"""Audi: one box corner to two split boxes (ref data/settings/audi.py)."""
from dots_socp_tpu.models.density import cut_off


def get_mu(area_vertices, vertices):
    x, y, z = vertices[:, 0], vertices[:, 1], vertices[:, 2]
    mu0 = (
        area_vertices
        * cut_off(x + 0.2626, 0.01)
        * cut_off(y + 0.9108, 0.1012)
    )
    band = cut_off(-x + 0.9696, 0.0202) * cut_off(y + 0.9108, 0.1012)
    mu1 = area_vertices * band * (
        cut_off(z + 0.3371, 0.0337) + cut_off(z + 0.4383, 0.0337)
    )
    return mu0, mu1
