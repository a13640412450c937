"""Native C++ geometry runtime: parser parity and partitioner invariants."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def plane_mesh():
    from dots_socp_tpu.geometry.generators import generate_plane_mesh

    vertices, triangles, _ = generate_plane_mesh(n=16)
    return vertices, triangles


def _write_off(path, vertices, triangles):
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(vertices)} {len(triangles)} 0\n")
        for v in vertices:
            f.write(f"{v[0]:.17g} {v[1]:.17g} {v[2]:.17g}\n")
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def test_native_off_parser_matches_python(plane_mesh, tmp_path):
    from dots_socp_tpu.geometry.native import get_library, parse_off_native

    if get_library() is None:
        pytest.skip("native library unavailable (no toolchain)")
    vertices, triangles = plane_mesh
    path = tmp_path / "mesh.off"
    _write_off(path, vertices, triangles)

    parsed = parse_off_native(str(path))
    assert parsed is not None
    v_native, t_native = parsed
    np.testing.assert_allclose(v_native, vertices, rtol=0, atol=0)
    np.testing.assert_array_equal(t_native, triangles)


def test_read_mesh_off_native_and_fallback_agree(plane_mesh, tmp_path, monkeypatch):
    from dots_socp_tpu.geometry import mesh_io

    vertices, triangles = plane_mesh
    path = tmp_path / "mesh.off"
    _write_off(path, vertices, triangles)

    v1, t1, e1 = mesh_io.read_mesh_off(path)
    monkeypatch.setenv("DOTS_SOCP_TPU_NO_NATIVE", "1")
    monkeypatch.setattr("dots_socp_tpu.geometry.native._lib", None)
    monkeypatch.setattr("dots_socp_tpu.geometry.native._lib_tried", True)
    v2, t2, e2 = mesh_io.read_mesh_off(path)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(e1, e2)


@pytest.mark.parametrize("n_parts", [2, 4, 7])
def test_bfs_partition_invariants(plane_mesh, n_parts):
    from dots_socp_tpu.geometry.native import bfs_partition, halo_vertices

    vertices, triangles = plane_mesh
    n_vertices = len(vertices)
    part, perm = bfs_partition(triangles, n_vertices, n_parts)

    # Every vertex assigned; perm is a permutation.
    assert set(np.unique(part)) <= set(range(n_parts))
    assert sorted(perm.tolist()) == list(range(n_vertices))

    # Near-balanced block sizes.
    sizes = np.bincount(part, minlength=n_parts)
    target = -(-n_vertices // n_parts)
    assert sizes.max() <= target

    # Blocks are contiguous in the permuted order.
    part_of_new = part[perm]
    assert np.all(np.diff(part_of_new) >= 0)

    # Halo is a strict boundary subset; for a 2-way cut of this mesh it is
    # a thin band (the bound scales with cut count on small meshes).
    halo = halo_vertices(triangles, part)
    assert 0 < halo.sum() < n_vertices
    if n_parts == 2:
        assert halo.sum() < n_vertices / 4


def test_bfs_partition_fallback_matches_native(plane_mesh):
    from dots_socp_tpu.geometry.native import (
        _bfs_partition_numpy,
        bfs_partition,
        get_library,
    )

    if get_library() is None:
        pytest.skip("native library unavailable")
    vertices, triangles = plane_mesh
    n_vertices = len(vertices)
    part_n, perm_n = bfs_partition(triangles, n_vertices, 4)
    part_p, perm_p = _bfs_partition_numpy(
        np.asarray(triangles, dtype=np.int32), n_vertices, 4
    )
    np.testing.assert_array_equal(part_n, part_p)
    np.testing.assert_array_equal(perm_n, perm_p)
