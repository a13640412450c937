"""Steady-state wall-clock for baseline configs 2 and 3 (compile excluded).

Round-2 BASELINE.md quoted "184 s incl. compile" / "425 s incl. compile"
for the congestion=0.05 and ntime=127 protocol configs, which makes the
rows incomparable across rounds once compile caches change. This driver
measures each config twice in one process: a 2-iteration warmup solve on
the identical shape absorbs the XLA compile, then the measured solve runs
with a warm jit cache. Reports pure solve wall time, iterations, and it/s.

Usage: python scripts/steady_state_configs.py [--configs 2 3]
"""

import argparse
import json
import os
import sys
import time

# Self-bootstrap: runnable without PYTHONPATH (round-3 lost a chip run to a
# bare `python scripts/...` invocation failing the package import).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(parser, argv, warmup_nit=2):
    from dots_socp_tpu.interface import run_dot_surface

    warm = parser.parse_args(argv)
    warm.nit = warmup_nit
    t0 = time.perf_counter()
    run_dot_surface(opts=warm)
    compile_s = time.perf_counter() - t0

    opts = parser.parse_args(argv)
    t0 = time.perf_counter()
    _, _, history = run_dot_surface(opts=opts)
    wall = time.perf_counter() - t0
    import numpy as np

    recorded = np.asarray(history.kkt_iteration)
    recorded = recorded[np.isfinite(recorded)]
    iterations = int(recorded[-1]) if recorded.size else 0
    errors = np.asarray(history.get_current_kkt_errors(), dtype=float)
    return {
        "argv": " ".join(argv),
        "warmup_incl_compile_sec": round(compile_s, 3),
        "solve_sec": round(wall, 3),
        "iterations": iterations,
        "iters_per_sec": round(iterations / wall, 1),
        "converged": bool(np.all(errors < opts.tol)),
    }


CONFIGS = {
    # BASELINE.md config 2: congestion proximal term exercised.
    "2": ["--example=plane", "--n_space=64", "--ntime=31",
          "--congestion=0.05", "--tol=1e-4", "--nit=10000",
          "--time_limit=1200"],
    # BASELINE.md config 3: high-resolution time grid.
    "3": ["--example=plane", "--n_space=50", "--ntime=127",
          "--tol=1e-4", "--nit=10000", "--time_limit=1200"],
    # CI smoke config: exercises the full measurement path in seconds on
    # CPU so script bugs can't silently consume chip hours again.
    "smoke": ["--example=plane", "--n_space=12", "--ntime=4",
              "--congestion=0.05", "--tol=1e-2", "--nit=50",
              "--time_limit=60"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["2", "3"],
                    choices=sorted(CONFIGS))
    args = ap.parse_args()

    from dots_socp_tpu.cli import parse_args as cli_parse_args
    from dots_socp_tpu.interface import set_logging_level

    set_logging_level("info", log_file=None)
    parser = cli_parse_args(return_parser=True)
    results = {}
    for key in args.configs:
        results[f"config_{key}"] = run_config(parser, CONFIGS[key])
        print(json.dumps({f"config_{key}": results[f"config_{key}"]}),
              flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
