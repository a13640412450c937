"""Surrogate mesh generators and the missing-blob example fallback.

The reference ships benchmark meshes as git-LFS pointers (absent from the
snapshot), so named examples cannot run from a bare checkout; the registry
substitutes procedural surrogate geometry (`geometry/generators.py`,
`models/registry.py::_SURROGATES`). These tests check the generated meshes
are valid FEM input (manifold-consistent connectivity, positive areas,
correct Euler characteristic) and that every predefined example loads and
yields normalized, non-degenerate boundary densities.
"""

import numpy as np
import pytest

from dots_socp_tpu.geometry.generators import (
    generate_hills_mesh,
    generate_knot_mesh,
    generate_punctured_sphere_mesh,
    generate_sphere_mesh,
    generate_torus_mesh,
)
from dots_socp_tpu.geometry.surface import triangle_quantities, vertex_areas


def _check_mesh(vertices, triangles, edges, expect_euler=None):
    v, f, e = vertices.shape[0], triangles.shape[0], edges.shape[0]
    assert vertices.shape[1] == 3 and triangles.shape[1] == 3
    assert triangles.min() >= 0 and triangles.max() < v
    # no degenerate triangles
    assert np.all(np.diff(np.sort(triangles, axis=1), axis=1) != 0)
    areas, _, _ = triangle_quantities(vertices, triangles)
    assert np.all(areas > 0)
    av = vertex_areas(triangles, areas, v)
    assert np.all(av > 0)  # every vertex belongs to a triangle
    if expect_euler is not None:
        assert v - e + f == expect_euler
    # every edge is shared by at most 2 triangles (manifold)
    pairs = np.concatenate(
        [triangles[:, [0, 1]], triangles[:, [1, 2]], triangles[:, [2, 0]]]
    )
    _, counts = np.unique(np.sort(pairs, axis=1), axis=0, return_counts=True)
    assert counts.max() <= 2


def test_icosphere():
    vertices, triangles, edges = generate_sphere_mesh(3, radius=2.0, center=(1, 0, 0))
    assert vertices.shape[0] == 10 * 4**3 + 2
    _check_mesh(vertices, triangles, edges, expect_euler=2)
    radii = np.linalg.norm(vertices - np.array([1.0, 0.0, 0.0]), axis=1)
    np.testing.assert_allclose(radii, 2.0, rtol=1e-12)


def test_punctured_sphere_has_boundary():
    vertices, triangles, edges = generate_punctured_sphere_mesh(3, cap=0.8)
    full_v = 10 * 4**3 + 2
    assert vertices.shape[0] < full_v
    # disk topology: Euler characteristic 1
    _check_mesh(vertices, triangles, edges, expect_euler=1)
    # boundary edges exist (shared by exactly one triangle)
    pairs = np.concatenate(
        [triangles[:, [0, 1]], triangles[:, [1, 2]], triangles[:, [2, 0]]]
    )
    _, counts = np.unique(np.sort(pairs, axis=1), axis=0, return_counts=True)
    assert (counts == 1).sum() > 0


def test_torus():
    vertices, triangles, edges = generate_torus_mesh(32, 16)
    assert vertices.shape[0] == 32 * 16
    _check_mesh(vertices, triangles, edges, expect_euler=0)
    # surface of revolution: distance from z axis within [R-r, R+r]
    rho = np.hypot(vertices[:, 0], vertices[:, 1])
    assert rho.min() >= 0.4 - 1e-9 and rho.max() <= 1.0 + 1e-9


@pytest.mark.parametrize("p,q", [(2, 3), (2, 5)])
def test_knot_tube(p, q):
    vertices, triangles, edges = generate_knot_mesh(p, q, n_u=96, n_v=12)
    assert vertices.shape[0] == 96 * 12
    _check_mesh(vertices, triangles, edges, expect_euler=0)
    # all tube rings have the requested radius around their centerline point
    ring = vertices.reshape(96, 12, 3)
    centers = ring.mean(axis=1, keepdims=True)
    dist = np.linalg.norm(ring - centers, axis=-1)
    np.testing.assert_allclose(dist, 0.12, atol=0.01)


def test_hills_heightfield():
    vertices, triangles, edges = generate_hills_mesh(n=30)
    _check_mesh(vertices, triangles, edges, expect_euler=1)
    assert vertices[:, 2].max() > 0.1  # bumps present
    assert vertices[:, 2].min() >= 0.0


def test_every_predefined_example_loads():
    """All registry names load with normalized, usable densities (surrogates
    + fallback densities where the settings are tied to the real blobs)."""
    import warnings

    from dots_socp_tpu.data.loader import load_example
    from dots_socp_tpu.models.registry import EXAMPLE_NAMES

    for name in EXAMPLE_NAMES:
        kwargs = {"n": 16} if name == "plane" else None
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            _, geom, _ = load_example(example_name=name, kwargs_generating_mesh=kwargs)
        v = geom["vertices"].shape[0]
        assert geom["mu0"].shape == (v,) and geom["mu1"].shape == (v,)
        np.testing.assert_allclose(geom["mu0"].sum(), 1.0, rtol=1e-10)
        np.testing.assert_allclose(geom["mu1"].sum(), 1.0, rtol=1e-10)
        assert np.isfinite(geom["mu0"]).all() and np.isfinite(geom["mu1"]).all()
        assert geom["mu0"].min() >= 0 and geom["mu1"].min() >= 0


def test_surrogate_warns_and_solves():
    """A named example without its blob warns, and the solve conserves mass."""
    import warnings

    from dots_socp_tpu.data.loader import load_example
    from dots_socp_tpu.geometry.normalize import normalize_geometry
    from dots_socp_tpu.solver.socp import solver_socp

    with pytest.warns(UserWarning, match="SURROGATE"):
        _, geom, _ = load_example(example_name="ring")
    geom, _ = normalize_geometry(geom)
    solution, _ = solver_socp(5, geom, nit=40, tol=5e-2, time_limit=120)
    mu = solution["mu"]
    mass = (mu * np.asarray(geom["area_vertices"])[None, :] / 3.0).sum(axis=1)
    np.testing.assert_allclose(mass, 1.0, atol=0.05)
