"""Interface layer: versus-exact flow, table export, custom examples."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).parent.parent
REFERENCE_DIR = Path("/root/reference")
SHIM_DIR = Path(__file__).parent / "reference_shims"


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


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


def test_log2table_contract_end_to_end(tmp_path):
    """A real solve's --log_file output must parse into the SAME table
    through our log2table and through the reference's (the log format is an
    API: the replication sweep builds its comparison tables from it)."""
    from dots_socp_tpu.interface import (
        print_example_info,
        run_dot_surface,
        set_logging_level,
    )

    log_path = tmp_path / "info.log"
    opts = _opts(outdir=str(tmp_path))
    opts.log_file = str(log_path)
    try:
        set_logging_level("info", log_file=str(log_path))
        print_example_info(opts)
        run_dot_surface(solver_name="socp", opts=opts)
    finally:
        set_logging_level("info")

    ours = _load_module("ours_log2table", REPO_ROOT / "replication" / "log2table.py")
    ours.log2table(str(log_path), [str(tmp_path / "ours.csv"), str(tmp_path / "ours.tex")])
    our_csv = (tmp_path / "ours.csv").read_text()
    assert "Plane" in our_csv and "Transport Cost" in our_csv
    assert (tmp_path / "ours.tex").exists()

    if not REFERENCE_DIR.exists():
        pytest.skip("reference repository not available")
    sys.path.insert(0, str(SHIM_DIR))
    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        ref = _load_module(
            "ref_log2table", REFERENCE_DIR / "replication" / "log2table.py"
        )
    except Exception as exc:
        pytest.skip(f"could not import reference log2table: {exc}")
    finally:
        sys.path.remove(str(SHIM_DIR))
        sys.path.remove(str(REFERENCE_DIR))
    ref.log2table(str(log_path), [str(tmp_path / "ref.csv")])

    assert (tmp_path / "ref.csv").exists(), "reference parser matched no block"
    assert our_csv == (tmp_path / "ref.csv").read_text()


def test_profile_dir_captures_trace(tmp_path):
    """--profile_dir wraps the solve in jax.profiler.trace and leaves a
    trace artifact on disk (SURVEY 5.1: device-timeline observability)."""
    from dots_socp_tpu.interface import run_dot_surface
    from dots_socp_tpu.solver import solver as dot_solver

    profile_dir = tmp_path / "trace"
    opts = _opts(nit=3, profile_dir=str(profile_dir))
    run_dot_surface(solver=dot_solver, solver_name="socp", opts=opts)

    produced = list(profile_dir.rglob("*"))
    assert any(p.is_file() for p in produced), "no profiler artifacts written"
