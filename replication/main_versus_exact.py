"""Accuracy replication: solve and compare against the exact transport at
order-of-magnitude KKT checkpoints (equivalent of the reference's
`replication/main_versus_exact.py`, driven by `make true_error`).
"""

import sys
from math import log
from pathlib import Path

root_of_import = Path(__file__).parent.parent
if str(root_of_import) not in sys.path:
    sys.path.insert(0, str(root_of_import))

from dots_socp_tpu import (  # noqa: E402
    parse_args as parse_args_socp,
    print_example_info,
    run_dot_surface_versus_exact,
    set_logging_level,
)
from dots_socp_tpu.solver import solver as dot_solver  # noqa: E402


def parse_args(return_parser=False):
    parser = parse_args_socp(return_parser=True)
    # Only examples defining an exact transport qualify.
    parser._option_string_actions["--example"].choices = ["plane"]
    parser._option_string_actions["--example"].help = (
        "Example to solve (must define get_exact_transportation)."
    )
    parser._actions = [a for a in parser._actions if a.dest != "versus_exact"]
    parser._option_string_actions.pop("--versus_exact", None)
    parser._option_string_actions["--outdir"].default = "output/undated_versus_exact"
    if return_parser:
        return parser
    return parser.parse_args()


def automatic_checkpoints(tol: float):
    """[1e-1, 1e-2, ..., tol]: one checkpoint per order of magnitude."""
    raw = -log(tol, 10)
    exponents = int(round(raw, 12) if abs(raw - round(raw)) < 1e-12 else raw)
    return [10 ** (-i - 1) for i in range(exponents)]


if __name__ == "__main__":
    args = parse_args()
    set_logging_level(log_level=args.log_level, log_file=args.log_file)
    print_example_info(args)

    if not args.checkpoints:
        args.checkpoints = automatic_checkpoints(args.tol)

    run_dot_surface_versus_exact(
        solver=dot_solver, solver_name="socp", opts=args
    )
