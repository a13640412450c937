"""Replication entry point: run one benchmark example with the DOT solver.

Equivalent of the reference's `replication/main.py` driving the `make main`
sweep (14 examples x 3 congestion levels).
"""

import sys
from pathlib import Path

root_of_import = Path(__file__).parent.parent
if str(root_of_import) not in sys.path:
    sys.path.insert(0, str(root_of_import))

from dots_socp_tpu import (  # noqa: E402
    parse_args,
    print_example_info,
    run_dot_surface,
    run_dot_surface_versus_exact,
    set_logging_level,
)
from dots_socp_tpu.solver import solver as dot_solver  # noqa: E402

if __name__ == "__main__":
    args = parse_args()
    set_logging_level(log_level=args.log_level, log_file=args.log_file)
    print_example_info(args)

    if not getattr(args, "versus_exact", False):
        run_dot_surface(solver=dot_solver, solver_name="socp", opts=args)
    else:
        run_dot_surface_versus_exact(
            solver=dot_solver, solver_name="socp", opts=args
        )
