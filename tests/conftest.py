"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may force the TPU platform regardless of
# JAX_PLATFORMS; override through the config, which wins post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: repeat test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dots_socp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def plane_geometry():
    """Small plane example geometry (generated mesh, no data files needed)."""
    from dots_socp_tpu.geometry.generators import generate_plane_mesh
    from dots_socp_tpu.geometry.surface import triangle_quantities, vertex_areas
    from dots_socp_tpu.utils.types import GeometryData

    vertices, triangles, edges = generate_plane_mesh(n=12)
    area_f, _, _ = triangle_quantities(vertices, triangles)
    av = vertex_areas(triangles, area_f, vertices.shape[0])

    center0 = np.array([0.4, 0.4, 0.0])
    center1 = np.array([0.6, 0.6, 0.0])
    scale = 2 * 0.1**2
    mu0 = av * np.exp(-np.linalg.norm(vertices - center0, axis=1) ** 2 / scale)
    mu1 = av * np.exp(-np.linalg.norm(vertices - center1, axis=1) ** 2 / scale)
    mu0 /= mu0.sum()
    mu1 /= mu1.sum()

    return GeometryData(
        vertices=vertices,
        triangles=triangles,
        edges=edges,
        mu0=mu0,
        mu1=mu1,
        area_triangles=area_f,
        area_vertices=av,
    )
