"""Geometry kernel tests: FEM quantities vs. independent naive formulas."""

import numpy as np
import pytest

from dots_socp_tpu.geometry.generators import generate_plane_mesh
from dots_socp_tpu.geometry.surface import (
    build_incidence_table,
    cotan_laplacian,
    triangle_quantities,
    vertex_areas,
)


def _naive_triangle_quantities(vertices, triangles):
    """Straight-from-the-math per-triangle loop, for golden comparison."""
    F = triangles.shape[0]
    areas = np.zeros(F)
    angles = np.zeros((F, 3))
    grads = np.zeros((F, 3, 3))
    for f in range(F):
        p = vertices[triangles[f]]
        areas[f] = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
        for k in range(3):
            a = p[(k + 1) % 3] - p[k]
            b = p[(k + 2) % 3] - p[k]
            angles[f, k] = np.arccos(
                np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
            )
            # gradient of hat_k: altitude vector from opposite edge to corner
            # k divided by its squared length.
            edge = p[(k + 2) % 3] - p[(k + 1) % 3]
            to_corner = p[k] - p[(k + 1) % 3]
            alt = to_corner - edge * (np.dot(to_corner, edge) / np.dot(edge, edge))
            grads[f, k] = alt / np.dot(alt, alt)
    return areas, angles, grads


@pytest.fixture(scope="module")
def small_mesh():
    rng = np.random.default_rng(0)
    vertices, triangles, edges = generate_plane_mesh(n=6)
    # Perturb z so the surface is genuinely curved.
    vertices = vertices.copy()
    vertices[:, 2] = 0.05 * rng.standard_normal(vertices.shape[0])
    return vertices, triangles


def test_triangle_quantities_match_naive(small_mesh):
    vertices, triangles = small_mesh
    area, angles, grad = triangle_quantities(vertices, triangles)
    n_area, n_angles, n_grad = _naive_triangle_quantities(vertices, triangles)
    np.testing.assert_allclose(area, n_area, rtol=1e-12)
    np.testing.assert_allclose(angles, n_angles, rtol=1e-10)
    np.testing.assert_allclose(grad, n_grad, rtol=1e-9, atol=1e-12)


def test_hat_basis_partition_of_unity(small_mesh):
    vertices, triangles = small_mesh
    _, _, grad = triangle_quantities(vertices, triangles)
    # Gradients of the three hat functions sum to zero in each triangle.
    np.testing.assert_allclose(grad.sum(axis=1), 0.0, atol=1e-12)


def test_angles_sum_to_pi(small_mesh):
    vertices, triangles = small_mesh
    _, angles, _ = triangle_quantities(vertices, triangles)
    np.testing.assert_allclose(angles.sum(axis=1), np.pi, rtol=1e-10)


def test_vertex_areas_total(small_mesh):
    vertices, triangles = small_mesh
    area, _, _ = triangle_quantities(vertices, triangles)
    av = vertex_areas(triangles, area, vertices.shape[0])
    np.testing.assert_allclose(av.sum(), 3.0 * area.sum(), rtol=1e-12)


def test_cotan_laplacian_properties(small_mesh):
    vertices, triangles = small_mesh
    _, angles, grad = triangle_quantities(vertices, triangles)
    area, _, _ = triangle_quantities(vertices, triangles)
    lap = cotan_laplacian(triangles, angles, vertices.shape[0])

    # Symmetric, kills constants, negative semidefinite.
    assert abs(lap - lap.T).max() < 1e-12
    np.testing.assert_allclose(lap @ np.ones(vertices.shape[0]), 0.0, atol=1e-12)
    eigvals = np.linalg.eigvalsh(lap.toarray())
    assert eigvals.max() < 1e-10

    # Equals -G^T diag(area) G for the P1 gradient operator.
    V = vertices.shape[0]
    F = triangles.shape[0]
    G = np.zeros((F, 3, V))
    for f in range(F):
        for k in range(3):
            G[f, :, triangles[f, k]] += grad[f, k]
    G = G.reshape(3 * F, V)
    dense = -(G.T * np.repeat(area, 3)) @ G
    np.testing.assert_allclose(lap.toarray(), dense, atol=1e-10)


def test_incidence_table_reduction(small_mesh):
    vertices, triangles = small_mesh
    V = vertices.shape[0]
    table, mask = build_incidence_table(triangles, V)
    rng = np.random.default_rng(1)
    values = rng.standard_normal((triangles.shape[0], 3))

    expected = np.zeros(V)
    np.add.at(expected, triangles.reshape(-1), values.reshape(-1))

    flat = values.reshape(-1)
    got = (flat[table] * mask).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_plane_mesh_consistency():
    vertices, triangles, edges = generate_plane_mesh(n=8)
    assert triangles.min() >= 0 and triangles.max() < vertices.shape[0]
    area, _, _ = triangle_quantities(vertices, triangles)
    assert (area > 0).all()
    # Euler-ish sanity: every edge of a triangle appears in the edge set.
    edge_set = {tuple(e) for e in np.sort(edges, axis=1)}
    for f in triangles[:20]:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            assert tuple(sorted((f[a], f[b]))) in edge_set


def test_off_roundtrip(tmp_path):
    from dots_socp_tpu.geometry.mesh_io import read_mesh_off

    vertices, triangles, _ = generate_plane_mesh(n=4)
    path = tmp_path / "mesh.off"
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(vertices)} {len(triangles)} 0\n")
        for v in vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    rv, rt, re = read_mesh_off(path)
    np.testing.assert_allclose(rv, vertices)
    np.testing.assert_array_equal(rt, triangles)
    assert re.shape == (3 * len(triangles), 2)
