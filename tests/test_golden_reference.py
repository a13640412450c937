"""Golden parity tests: run the reference implementation (via dependency
shims) and this framework on identical inputs; final states must agree.

The reference at /root/reference is pure NumPy; `reference_shims/` provides
numexpr/tomli/trimesh stand-ins so it can execute here. With a tolerance too
small to trigger early stopping and nit < 100 (below the z-rescale trigger),
both solvers perform exactly the same sequence of iterations and sigma
updates, so trajectories should agree to float64 roundoff accumulation.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

SHIM_DIR = Path(__file__).parent / "reference_shims"
REFERENCE_DIR = Path("/root/reference")


@pytest.fixture(scope="module")
def reference_solver():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repository not available")
    sys.path.insert(0, str(SHIM_DIR))
    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        from dot_surface_socp.socp.solver_socp import solver_socp as ref_solver
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"could not import reference solver: {exc}")
    return ref_solver


def _geometry_pair(plane_geometry):
    """Same geometry dict for both solvers (reference mutates nothing)."""
    return {k: np.asarray(v).copy() if hasattr(v, "copy") else v
            for k, v in plane_geometry.items()}


@pytest.mark.parametrize("congestion", [0.0, 0.05])
def test_final_state_matches_reference(
    reference_solver, plane_geometry, congestion
):
    from dots_socp_tpu.solver import solver_socp

    kwargs = dict(
        congestion=congestion,
        nit=60,
        tol=1e-12,  # never met: both run exactly nit iterations
        time_limit=10_000,
        is_z_scaling=True,
        is_multi_threads=False,
    )
    n_time = 5

    ref_solution, _ = reference_solver(
        n_time, _geometry_pair(plane_geometry), **kwargs
    )
    our_solution, _ = solver_socp(
        n_time, _geometry_pair(plane_geometry), precision="float64", **kwargs
    )

    # mu is the transported density (the headline output); phi the potential.
    np.testing.assert_allclose(
        our_solution["mu"], ref_solution["mu"], rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        our_solution["A"], ref_solution["A"], rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        our_solution["z_fst"], ref_solution["z_fst"], rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        our_solution["E"], ref_solution["E"], rtol=1e-7, atol=1e-9
    )
    # phi agrees up to the Laplacian null space (a global constant): the
    # reference's singular SuperLU solve leaves an arbitrary constant, our
    # pseudo-inverse pins it.
    diff = np.asarray(our_solution["phi"]) - np.asarray(ref_solution["phi"])
    assert np.abs(diff - diff.mean()).max() < 1e-7


def test_kkt_errors_match_reference(reference_solver, plane_geometry):
    """Per-iteration KKT errors recorded in step-by-step mode must agree."""
    from dots_socp_tpu.solver import solver_socp

    kwargs = dict(
        nit=25,
        tol=1e-12,
        time_limit=10_000,
        check_kkt_step_by_step=True,
        is_multi_threads=False,
    )
    _, ref_history = reference_solver(4, _geometry_pair(plane_geometry), **kwargs)
    _, our_history = solver_socp(
        4, _geometry_pair(plane_geometry), precision="float64", **kwargs
    )

    ref_err = np.asarray(ref_history.kkt_errors, dtype=float)
    our_err = np.asarray(our_history.kkt_errors, dtype=float)
    n = min(ref_err.shape[0], our_err.shape[0])
    np.testing.assert_allclose(our_err[:n], ref_err[:n], rtol=1e-6, atol=1e-10)


def test_z_rescale_schedule_matches_reference(reference_solver):
    """The z-rescale trigger (min_it, one-shot count, 5e-3 gate) must take
    the same decision as the reference's AdjustAdmmParam on identical
    (iteration, recorded-KKT) sequences -- including the boundary where the
    recorded error crosses the gate exactly at / between validations."""
    from dot_surface_socp.utils.admm_tools import AdjustAdmmParam

    from dots_socp_tpu.solver.schedule import SigmaSchedule

    sequences = [
        # (it, recorded kkt): gate crossing before / at / after min_it=100
        [(50, [1e-2]), (99, [1e-4]), (100, [1e-4]), (103, [1e-4])],
        [(100, [6e-3]), (101, [5.1e-3]), (137, [4.9e-3]), (138, [1e-4])],
        [(100, [4e-3]), (101, [4e-3])],  # one-shot: second never fires
        [(250, [1e-2]), (300, [2e-3])],
    ]
    for seq in sequences:
        ours = SigmaSchedule()
        ref = AdjustAdmmParam()
        for it, kkt in seq:
            assert ours.is_to_scale_matrix(it, kkt) == ref.is_to_scale_matrix(
                it, kkt
            ), f"divergent z-rescale decision at it={it}, kkt={kkt}"


def test_trajectory_across_z_trigger_boundary(reference_solver, plane_geometry):
    """Golden trajectory crossing iteration 100, where the one-shot z-rescale
    trigger is evaluated from chunk boundaries in our host loop but every
    iteration in the reference: final states must still agree (the recorded
    KKT only changes at validation points, which are chunk boundaries)."""
    from dots_socp_tpu.solver import solver_socp

    kwargs = dict(
        nit=160,
        tol=1e-12,  # never met: both run exactly nit iterations
        time_limit=10_000,
        is_z_scaling=True,
        is_multi_threads=False,
    )
    ref_solution, _ = reference_solver(4, _geometry_pair(plane_geometry), **kwargs)
    our_solution, _ = solver_socp(
        4, _geometry_pair(plane_geometry), precision="float64", **kwargs
    )
    np.testing.assert_allclose(
        our_solution["mu"], ref_solution["mu"], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        our_solution["z_fst"], ref_solution["z_fst"], rtol=1e-6, atol=1e-9
    )
