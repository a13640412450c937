"""Command-line interface.

Same flags, defaults and groups as the reference CLI (`cli.py:27-156`), plus
TPU-specific extras (--precision, --laplacian_mode). Run as
``python -m dots_socp_tpu.cli --example plane --n_space 40``.
"""

from __future__ import annotations

import argparse

from numpy import inf as np_inf


class CheckArgsRangeTau(argparse.Action):
    def __call__(self, arg_parser, namespace, values, option_string=None):
        if not (0.0 < float(values) < 2.0):
            raise argparse.ArgumentError(
                self, f"tau must be in range (0.0, 2.0), but got {values}"
            )
        setattr(namespace, self.dest, values)


class CheckArgsPowerPerceptual(argparse.Action):
    def __call__(self, arg_parser, namespace, values, option_string=None):
        if not float(values) > 0.0:
            raise argparse.ArgumentError(
                self, f"power_perceptual must be > 0.0, but got {values}"
            )
        setattr(namespace, self.dest, values)


def parse_args(parser=None, return_parser=False):
    """Build (and optionally return) the argument parser."""
    if parser is None:
        parser = argparse.ArgumentParser(
            description="Animate DOT-Surface transmission process."
        )

    example_group = parser.add_argument_group(
        "Example configuration",
        "Configure example via predefined set (--example) or custom files "
        "(--mesh_file, --setting_file)",
    )
    example_group.add_argument(
        "--example",
        default=None,
        type=str,
        help="Predefined example name (airplane, armadillo, hand, "
        "punctured_ball, bunny, sphere, ring, knots_3, knots_5, hills, "
        "plane, refined_* ...)",
    )
    example_group.add_argument(
        "--mesh_file", default=None, type=str, help="Input mesh file path (.off)"
    )
    example_group.add_argument(
        "--setting_file", default=None, type=str, help="Input settings file path (.py)"
    )
    example_group.add_argument(
        "--congestion", default=0.0, type=float, help="Congestion factor (default: 0.0)"
    )
    example_group.add_argument(
        "--ntime", default=31, type=int, help="Time discretization points"
    )

    algo_group = parser.add_argument_group("Algorithm parameters")
    algo_group.add_argument(
        "--tau",
        type=float,
        default=None,
        action=CheckArgsRangeTau,
        help="Step size value (range: 0.0-2.0)",
    )
    algo_group.add_argument("--nit", default=10**3, type=int, help="Maximum iterations")
    algo_group.add_argument(
        "--eps",
        default=0.0,
        type=float,
        help="Epsilon value for proximal item in the phi step",
    )
    algo_group.add_argument(
        "--tol", default=10 ** (-3), type=float, help="Convergence tolerance"
    )
    algo_group.add_argument(
        "--time_limit",
        default=np_inf,
        type=float,
        help="Time limit in seconds (default: no limit)",
    )
    algo_group.add_argument(
        "--precision",
        default=None,
        choices=["float32", "float64"],
        help="Solver dtype (default: float32 on TPU, float64 when JAX x64 "
        "is enabled)",
    )
    algo_group.add_argument(
        "--laplacian_mode",
        default=None,
        choices=["auto", "spectral", "cg"],
        help="Space-time Laplacian solver: dense spectral factor or "
        "matrix-free CG (default: auto by mesh size)",
    )

    output_group = parser.add_argument_group("Output options")
    output_group.add_argument(
        "--show", default=False, action="store_true", help="Display animation"
    )
    output_group.add_argument(
        "--save", default=False, action="store_true", help="Save animation"
    )
    output_group.add_argument(
        "--cmap", default=None, type=str, help="Matplotlib colormap for animation"
    )
    output_group.add_argument(
        "--power_perceptual",
        default=1.0,
        type=float,
        action=CheckArgsPowerPerceptual,
        help="Power perceptual for colormap (default: 1.0)",
    )
    output_group.add_argument(
        "--detail_runhist",
        default=False,
        action="store_true",
        help="Compute detailed running history (may take longer time)",
    )
    output_group.add_argument(
        "--show_kkt_it",
        "--show_kkt",
        default=False,
        action="store_true",
        help="Display KKT history vs iterations",
    )
    output_group.add_argument(
        "--save_kkt_it",
        "--save_kkt",
        default=False,
        action="store_true",
        help="Save KKT history vs iterations plot",
    )
    output_group.add_argument(
        "--show_kkt_time",
        default=False,
        action="store_true",
        help="Display KKT history vs time",
    )
    output_group.add_argument(
        "--save_kkt_time",
        default=False,
        action="store_true",
        help="Save KKT history vs time plot",
    )
    output_group.add_argument(
        "-o", "--outdir", default="output/undated", type=str, help="Output directory"
    )
    output_group.add_argument(
        "--log_file", default=None, type=str, help="Log file path"
    )

    exp_group = parser.add_argument_group("Experimental features")
    exp_group.add_argument(
        "--log_level",
        type=str,
        choices=["debug", "kkt", "scaling", "info"],
        default="info",
        help="Log level: debug=all, kkt=KKT details, scaling=scaling info, "
        "info=convergence",
    )
    exp_group.add_argument(
        "--versus_exact",
        default=False,
        action="store_true",
        help="Compare with exact transportation (requires setting support)",
    )
    exp_group.add_argument(
        "--checkpoints",
        default=None,
        nargs="+",
        type=float,
        help="Checkpoints for saving intermediate results (for --versus_exact)",
    )
    exp_group.add_argument(
        "--n_space",
        type=int,
        default=None,
        help="Spatial grid points for generated meshes (plane)",
    )
    exp_group.add_argument(
        "--snapshot",
        dest="snapshot_path",
        type=str,
        default=None,
        help="Path to a .npz state snapshot: written periodically during the "
        "solve, and resumed from if it already exists",
    )
    exp_group.add_argument(
        "--snapshot_every",
        type=float,
        default=300.0,
        help="Seconds between periodic snapshots (with --snapshot)",
    )

    if return_parser:
        return parser
    return parser.parse_args()


def main():
    from dots_socp_tpu.interface import (
        print_example_info,
        run_dot_surface,
        run_dot_surface_versus_exact,
        set_logging_level,
    )

    args = parse_args()
    set_logging_level(log_level=args.log_level, log_file=args.log_file)
    print_example_info(args)

    if not args.versus_exact:
        run_dot_surface(solver_name="socp", opts=args)
    else:
        run_dot_surface_versus_exact(solver_name="socp", opts=args)


if __name__ == "__main__":
    main()
