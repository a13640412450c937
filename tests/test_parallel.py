"""Device-mesh sharding: N simulated devices must reproduce the single-device
solve (SURVEY section 4's multi-host test strategy; conftest provides a
virtual 8-device CPU platform)."""

import numpy as np
import pytest


@pytest.mark.parametrize("time_axis", [1, 2])
def test_sharded_solver_matches_single_device(plane_geometry, time_axis):
    from dots_socp_tpu.parallel.mesh import make_mesh
    from dots_socp_tpu.solver import solver_socp

    kw = dict(nit=30, tol=1e-12, time_limit=300, precision="float64")
    sol_single, _ = solver_socp(6, plane_geometry, **kw)

    mesh = make_mesh(8, time_axis=time_axis)
    sol_sharded, _ = solver_socp(6, plane_geometry, mesh=mesh, **kw)

    np.testing.assert_allclose(
        sol_sharded["mu"], sol_single["mu"], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        sol_sharded["E"], sol_single["E"], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        sol_sharded["phi"], sol_single["phi"], rtol=1e-9, atol=1e-12
    )


def test_parse_mesh_shape():
    from dots_socp_tpu.parallel import parse_mesh_shape

    assert parse_mesh_shape("2x4") == (2, 4)
    assert parse_mesh_shape("8") == (1, 8)
    assert parse_mesh_shape(" 1X8 ") == (1, 8)
    for bad in ("0x4", "2x4x2", "-1"):
        with pytest.raises(ValueError):
            parse_mesh_shape(bad)


def test_make_solver_mesh_rejects_oversubscription():
    from dots_socp_tpu.parallel import make_solver_mesh

    with pytest.raises(ValueError, match="devices"):
        make_solver_mesh("4x4")  # conftest provides 8 virtual devices


def test_cli_mesh_shape_solve_matches_single_device():
    """--mesh_shape must be reachable from the CLI surface: the same solve
    through run_dot_surface on a 2x4 mesh and on a single device."""
    from dots_socp_tpu.cli import parse_args
    from dots_socp_tpu.interface import run_dot_surface

    argv = [
        "--example=plane",
        "--n_space=12",
        "--ntime=6",
        "--tol=1e-12",
        "--nit=25",
        "--precision=float64",
    ]
    parser = parse_args(return_parser=True)
    single, _, _ = run_dot_surface(opts=parser.parse_args(argv))
    sharded, _, _ = run_dot_surface(
        opts=parser.parse_args(argv + ["--mesh_shape=2x4"])
    )
    np.testing.assert_allclose(sharded["mu"], single["mu"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(sharded["E"], single["E"], rtol=1e-9, atol=1e-12)
