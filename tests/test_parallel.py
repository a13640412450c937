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
