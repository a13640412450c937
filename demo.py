"""Demonstration of the usage (equivalent of the reference demo.py).

Runs the plane example (no mesh data files needed) with show=False by
default in headless environments; pass --show to open the viewer.
"""

from dots_socp_tpu import (
    parse_args as parse_args_socp,
    print_example_info,
    run_dot_surface,
    set_logging_level,
)

DEFAULT_EXAMPLE = "plane"
DEFAULT_TOL = 1e-3
DEFAULT_ITERATIONS = 1000


def parse_args():
    parser = parse_args_socp(return_parser=True)
    parser.set_defaults(
        example=DEFAULT_EXAMPLE,
        tol=DEFAULT_TOL,
        nit=DEFAULT_ITERATIONS,
        n_space=50,
    )
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    set_logging_level(log_level=args.log_level, log_file=args.log_file)
    print_example_info(args)
    run_dot_surface(solver_name="socp", opts=args)
