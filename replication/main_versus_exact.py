"""Accuracy replication: solve and compare against the exact transport at
order-of-magnitude KKT checkpoints (same experiment as the reference's
`replication/main_versus_exact.py`, driven by `make true_error`).
"""

import sys
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

# Examples whose settings module defines get_exact_transportation.
EXACT_EXAMPLES = ("plane",)


def parse_args(return_parser=False):
    """The package CLI, re-defaulted for the versus-exact experiment."""
    parser = parse_args_socp(return_parser=True)
    parser.set_defaults(outdir="output/undated_versus_exact", versus_exact=True)
    if return_parser:
        return parser
    args = parser.parse_args()
    args.versus_exact = True  # this script IS the versus-exact flow
    if args.example is not None and args.example not in EXACT_EXAMPLES:
        parser.error(
            f"--example must define an exact transport (one of {EXACT_EXAMPLES})"
        )
    return args


def automatic_checkpoints(tol: float):
    """One checkpoint per order of magnitude: [1e-1, 1e-2, ..., down to tol].

    Decades strictly between tol and 1 are included; tol itself is included
    when it sits on a decade (up to float fuzz).
    """
    checkpoints = []
    exponent = 1
    while 10.0 ** (-exponent) >= tol * (1.0 - 1e-9):
        checkpoints.append(10.0 ** (-exponent))
        exponent += 1
    return checkpoints


if __name__ == "__main__":
    args = parse_args()
    set_logging_level(log_level=args.log_level, log_file=args.log_file)
    print_example_info(args)

    if not args.checkpoints:
        args.checkpoints = automatic_checkpoints(args.tol)

    run_dot_surface_versus_exact(
        solver=dot_solver, solver_name="socp", opts=args
    )
