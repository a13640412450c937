"""End-to-end solver tests on the generated plane example."""

import numpy as np
import pytest

from dots_socp_tpu.solver import solver, solver_raw, solver_socp


@pytest.fixture(scope="module")
def solved(plane_geometry):
    solution, history = solver(
        8, plane_geometry, nit=1500, tol=1e-4, time_limit=300
    )
    return solution, history


def test_mass_conservation(solved, plane_geometry):
    solution, _ = solved
    mu = solution["mu"]
    masses = mu.sum(axis=1)
    np.testing.assert_allclose(masses, 1.0, atol=5e-4)


def test_nonnegative_density(solved):
    solution, _ = solved
    mu = solution["mu"]
    assert mu[mu < 0].sum() > -1e-3


def test_kkt_converged(solved):
    _, history = solved
    final = history.get_current_kkt_errors()
    assert np.all(final < 1e-4)


def test_kkt_errors_decrease(solved):
    _, history = solved
    # Stop error should drop by orders of magnitude start to end.
    stop_cols = [0, 2, 4, 5]
    errs = np.nanmax(history.kkt_errors[:, stop_cols], axis=1)
    finite = errs[np.isfinite(errs)]
    assert finite[-1] < 1e-4
    assert finite[0] > 10 * finite[-1]


def test_transport_cost_gaussian_pair(solved):
    """For two equal-width Gaussians, the dynamic-OT dual objective equals
    W2^2/2 = |c1 - c0|^2 / 2 up to discretization error."""
    _, history = solved
    cost = history.history["Transportation cost"][-1]
    expected = 0.5 * (0.2**2 + 0.2**2)
    assert abs(cost - expected) < 0.15 * expected


def test_time_centered_grid_endpoints(solved, plane_geometry):
    solution, _ = solved
    mu = solution["mu"]
    assert mu.shape[0] == 8 + 1
    np.testing.assert_allclose(mu[0], plane_geometry["mu0"], atol=1e-12)
    np.testing.assert_allclose(mu[-1], plane_geometry["mu1"], atol=1e-12)


def test_solver_raw_staggered_units(plane_geometry):
    solution, _ = solver_raw(4, plane_geometry, nit=50, tol=1e-2, time_limit=60)
    assert solution["mu"].shape[0] == 4  # staggered grid: T slices


def test_warm_start_resumes(plane_geometry):
    sol1, hist1 = solver_socp(4, plane_geometry, nit=60, tol=1e-10, time_limit=60)
    sol2, hist2 = solver_socp(
        4,
        plane_geometry,
        nit=60,
        tol=1e-10,
        time_limit=60,
        init_solution=sol1,
    )
    # Warm-started run should start far closer to feasibility than cold.
    cold_first = np.nanmax(hist1.kkt_errors[0, [0, 2]])
    warm_first = np.nanmax(hist2.kkt_errors[0, [0, 2]])
    assert warm_first < 0.5 * cold_first


def test_checkpoints_recorded(plane_geometry):
    solution, _ = solver(
        6,
        plane_geometry,
        nit=1500,
        tol=1e-3,
        time_limit=300,
        tol_checkpoints=[1e-1, 1e-2],
    )
    cps = solution.get("checkpoints")
    assert cps and len(cps) == 2
    assert cps[0]["iteration"] <= cps[1]["iteration"]
    for cp in cps:
        assert cp["mu"].shape[0] == 6 + 1  # centered grid via decorator


def test_congestion_mode(plane_geometry):
    solution, history = solver(
        4, plane_geometry, nit=400, tol=1e-3, time_limit=120, congestion=0.01
    )
    assert np.all(history.get_current_kkt_errors() < 1e-3)
    masses = solution["mu"].sum(axis=1)
    np.testing.assert_allclose(masses, 1.0, atol=5e-3)


def test_cg_mode_matches_spectral(plane_geometry):
    sol_a, _ = solver_socp(
        4, plane_geometry, nit=40, tol=1e-12, time_limit=60,
        laplacian_mode="spectral",
    )
    sol_b, _ = solver_socp(
        4, plane_geometry, nit=40, tol=1e-12, time_limit=60,
        laplacian_mode="cg", cg_max_iters=400, cg_rtol=1e-13,
    )
    np.testing.assert_allclose(sol_a["mu"], sol_b["mu"], atol=2e-6)


def test_cg_adaptive_rtol_converges(plane_geometry):
    """cg_rtol=None (inexact-ALM inner-tolerance scheduling) still drives
    the outer KKT error to tolerance, with the deflated preconditioner."""
    solution, history = solver_socp(
        4, plane_geometry, nit=800, tol=1e-3, time_limit=180,
        laplacian_mode="cg", cg_deflation_k=16,
    )
    assert np.all(history.get_current_kkt_errors() < 1e-3)
    assert np.isfinite(solution["mu"]).all()
    # Mass conservation in DOT units: SOCP mu times area_vertices / 3.
    av = np.asarray(plane_geometry["area_vertices"])
    masses = (np.asarray(solution["mu"]) * av[None, :] / 3.0).sum(axis=1)
    np.testing.assert_allclose(masses, 1.0, atol=5e-3)


def test_palm_mode_runs(plane_geometry):
    solution, history = solver(
        4, plane_geometry, nit=200, tol=1e-2, time_limit=120, is_palm=True
    )
    assert np.all(history.get_current_kkt_errors() < 1e-2)


def test_step_by_step_history(plane_geometry):
    _, history = solver(
        4,
        plane_geometry,
        nit=12,
        tol=1e-12,
        time_limit=60,
        check_kkt_step_by_step=True,
    )
    # Every iteration recorded, with objective history.
    assert history.kkt_iteration.shape[0] >= 12
    assert "Transportation cost" in history.history


def test_run_chunk_kkt_matches_separate(plane_geometry):
    """The fused chunk+KKT dispatch must agree with run_chunk followed by
    compute_kkt (same graph content, one round trip)."""
    import __graft_entry__ as graft
    import numpy as np

    from dots_socp_tpu.solver.kkt import compute_kkt
    from dots_socp_tpu.solver.step import run_chunk, run_chunk_kkt

    config, data, state = graft._build(n_space=10, n_time=5, dtype="float64")
    state_a = run_chunk(config, data, state, np.int32(7))
    table_a = np.asarray(compute_kkt(config, data, state_a))

    _, _, state = graft._build(n_space=10, n_time=5, dtype="float64")
    state_b, table_b = run_chunk_kkt(config, data, state, np.int32(7))
    np.testing.assert_allclose(np.asarray(state_b.phi), np.asarray(state_a.phi), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(table_b), table_a, rtol=1e-10)


def test_snapshot_resume_matches_uninterrupted(plane_geometry, tmp_path):
    """Interrupt at nit=20, resume to nit=45: trajectory must match a single
    uninterrupted 45-iteration run (state + host schedules fully restored)."""
    from dots_socp_tpu.solver import solver_socp

    kw = dict(tol=1e-12, time_limit=300)  # tol unreachable: fixed 45 its
    sol_full, _ = solver_socp(6, plane_geometry, nit=45, **kw)

    snap = str(tmp_path / "state.npz")
    solver_socp(6, plane_geometry, nit=20, snapshot_path=snap, **kw)
    sol_resumed, hist = solver_socp(
        6, plane_geometry, nit=45, snapshot_path=snap, **kw
    )

    np.testing.assert_allclose(sol_resumed["mu"], sol_full["mu"], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(sol_resumed["phi"], sol_full["phi"], rtol=1e-8, atol=1e-12)


def test_adaptive_segment_sigma_update_at_checkpoint_crossing():
    """A tolerance-checkpoint crossing that ends the device segment must not
    suppress a sigma update scheduled at that same validation: the host
    order is checkpoint -> passed-check -> sigma adjust (reference
    `socp/solver_socp.py:789-823`)."""
    import __graft_entry__ as graft
    from dots_socp_tpu.solver.step import (
        ADAPTIVE_HEADER,
        ADAPTIVE_REC_SIZE,
        run_chunk_adaptive,
    )

    config, data, state = graft._build(8, 4, "float64", pad_multiple=1)
    # First sigma-adjust boundary is iteration 3 (last_adjust=0, gap 3).
    # j_first=4 plans the first validation exactly there; a huge checkpoint
    # threshold makes the crossing fire at that same validation.
    aux = np.asarray([0.0, 0.0, 1e-12, 1e6, -np.inf], dtype=np.float64)
    _, packed = run_chunk_adaptive(
        config, data, state, np.int32(0), np.int32(64), np.int32(4), aux, 16
    )
    packed = np.asarray(packed)
    assert int(packed[0]) == 1  # segment ended at the crossing validation
    assert int(packed[2]) == 3  # last_adjust_it advanced to the boundary
    rec = packed[ADAPTIVE_HEADER : ADAPTIVE_HEADER + ADAPTIVE_REC_SIZE]
    assert rec[1] == 1.0, "sigma adjust suppressed by the checkpoint crossing"


def test_adaptive_segment_sigma_tail_freeze():
    """With aux[4] = +inf (host-latched freeze) the device segment must keep
    firing the adjustment cadence (forced validations, last_adjust advances)
    while every applied sigma factor stays exactly 1."""
    import __graft_entry__ as graft
    from dots_socp_tpu.solver.step import (
        ADAPTIVE_HEADER,
        ADAPTIVE_REC_SIZE,
        run_chunk_adaptive,
    )

    config, data, state = graft._build(8, 4, "float64", pad_multiple=1)

    def run(freeze):
        import jax
        import jax.numpy as jnp

        aux = np.asarray([0.0, 0.0, 1e-12, -np.inf, freeze], dtype=np.float64)
        # state is donated by run_chunk_adaptive; hand each call its own copy.
        state_copy = jax.tree.map(jnp.copy, state)
        _, packed = run_chunk_adaptive(
            config, data, state_copy, np.int32(0), np.int32(64), np.int32(4),
            aux, 16,
        )
        packed = np.asarray(packed)
        n = int(packed[0])
        recs = packed[ADAPTIVE_HEADER:].reshape(-1, ADAPTIVE_REC_SIZE)[:n]
        return packed, recs

    packed_off, recs_off = run(-np.inf)
    packed_on, recs_on = run(np.inf)

    # Freeze disabled: the gap table applies real factors at this stage.
    assert np.any(recs_off[recs_off[:, 1] == 1.0, 2] != 1.0)
    # Frozen: cadence still fires (bookkeeping parity) but factor is 1.
    assert np.any(recs_on[:, 1] == 1.0)
    assert np.all(recs_on[:, 2] == 1.0)
    assert int(packed_on[2]) > 0  # last_adjust_it still advances


def test_solver_sigma_freeze_converges(plane_geometry):
    """sigma_freeze_error engaged from the start still converges (fixed-
    penalty ALM descent) and the sigma-frozen run reaches the tolerance."""
    _, hist = solver_socp(
        4, plane_geometry, nit=2000, tol=1e-3, time_limit=120,
        sigma_freeze_error=1.0,
    )
    assert np.all(hist.get_current_kkt_errors() < 1e-3)
