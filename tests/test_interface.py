"""Interface layer: versus-exact flow, table export, custom examples."""

import numpy as np
import pytest


def _opts(**over):
    from dots_socp_tpu.cli import parse_args

    argv = [
        "--example=plane",
        "--n_space=16",
        "--ntime=8",
        "--tol=1e-2",
        "--nit=1500",
    ]
    argv += [f"--{k}={v}" if v is not True else f"--{k}" for k, v in over.items()]
    parser = parse_args(return_parser=True)
    return parser.parse_args(argv)


def test_versus_exact_flow(tmp_path):
    from dots_socp_tpu.interface import run_dot_surface_versus_exact
    from dots_socp_tpu.solver import solver as dot_solver

    opts = _opts(outdir=str(tmp_path))
    opts.checkpoints = [1e-1, 1e-2]
    (
        solution,
        geometry,
        run_history,
        error_transportation,
        error_checkpoints,
    ) = run_dot_surface_versus_exact(
        solver=dot_solver, solver_name="socp", opts=opts
    )

    # Final l1/l2/linf errors against the closed-form Gaussian transport
    # (key names match reference `evaluate_solution.py:54-56`).
    assert set(error_transportation) >= {"l1", "l2", "linf"}
    assert 0 < error_transportation["l2"] < 0.5

    # One checkpoint row per crossed tolerance, KKT decreasing across them.
    assert len(error_checkpoints) == 2
    kkts = [row["kkt_error"] for row in error_checkpoints]
    assert kkts[1] < kkts[0] <= 1e-1

    # Exported error table exists.
    tables = list(tmp_path.rglob("*.tex")) + list(tmp_path.rglob("*.html"))
    assert tables, "expected exported checkpoint-error tables"
