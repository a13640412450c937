"""Attribute the per-iteration cost of the large-mesh CG-path solve.

VERDICT round-3 item 2: at V=46k the production solve sustains ~194 ms/it
while the SpMV roofline accounts for ~10 ms -- the bulk was unattributed.
This driver measures, all at the production state dtype/config on the real
chip:

  1. marginal in-context costs: the fused iteration timed with each major
     step knocked out (Laplacian solve -> identity, SOC projection ->
     passthrough, multiplier/q step -> frozen), mirroring
     `solver/step.py::iteration` -- the difference to the full iteration is
     that step's cost *as fused by XLA*;
  2. standalone chained costs of the KKT table and the CG solve at a given
     inner rtol (with inner iteration count), for the roofline table;
  3. optionally a raw `jax.profiler` device trace of a short chunk
     (--profile_dir), committed for op-level inspection.

All timings are differenced chains inside single dispatches, so dispatch
round trips cancel (same methodology as bench.py / bench_matvec.py).

Usage: python scripts/profile_iteration.py --n_space 200 --ntime 31
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_space", type=int, default=200)
    ap.add_argument("--ntime", type=int, default=31)
    ap.add_argument("--cg_rtol", type=float, default=5e-6,
                    help="inner CG rtol (production late-stage adaptive "
                    "value is 0.05 * KKT error, floored at 2e-6)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup_iters", type=int, default=100,
                    help="real iterations run before timing so the state "
                    "(and CG warm starts) are representative")
    ap.add_argument("--phi_refine", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--profile_dir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dots_socp_tpu.data.loader import load_example
    from dots_socp_tpu.geometry.normalize import normalize_geometry
    from dots_socp_tpu.ops.mesh_ops import grad_space
    from dots_socp_tpu.ops.time_stencils import (
        decouple_space,
        decouple_space_adjoint,
        grad_time,
    )
    from dots_socp_tpu.solver.kkt import kkt_table
    from dots_socp_tpu.solver.problem import build_problem
    from dots_socp_tpu.solver.state import init_state
    from dots_socp_tpu.solver.step import (
        run_chunk,
        solve_laplacian,
        solve_proj_soc,
        solve_q_lambda,
    )

    _, geometry, _ = load_example(
        example_name="plane", kwargs_generating_mesh={"n": args.n_space}
    )
    geometry, _ = normalize_geometry(geometry)

    cpu0 = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu0):
        config, data, extras = build_problem(
            args.ntime, geometry, dtype="float32", laplacian_mode="cg",
            cg_rtol=args.cg_rtol, pad_multiple=8, phi_refine=args.phi_refine,
        )
        dt = config.stepsize_time
        ops = data.ops
        state = init_state(
            args.ntime, config.n_vertices, config.n_triangles,
            extras["mu0_padded"], extras["mu1_padded"], dt,
            grad_time_fn=lambda p: grad_time(dt, p),
            grad_space_fn=lambda p: grad_space(ops, p),
            decouple_adjoint_fn=decouple_space_adjoint,
            dtype=config.jnp_dtype,
            phi_dtype=config.phi_dtype,
        )
    dev = jax.local_devices()[0]
    if dev.platform != "cpu":
        data, state = jax.device_put((data, state), dev)

    # Parameterized mirror of `solver/step.py::iteration` with step
    # knockouts (skip_*: replace the step with a cheap passthrough).
    def iteration_variant(state, skip_lap=False, skip_soc=False,
                          skip_qmult=False):
        if skip_lap:
            phi = state.phi * 1.0000001  # keep a data dependency
        else:
            phi = solve_laplacian(config, data, state)
        if skip_soc:
            z_fst, z_mid, z_end = state.z_fst, state.z_mid, state.z_end
        else:
            z_fst, z_mid, z_end = solve_proj_soc(config, data, state)
        wd = config.jnp_dtype
        dt_phi = grad_time(dt, phi).astype(wd)
        dx_phi = grad_space(ops, phi).astype(wd)
        if skip_qmult:
            return state._replace(
                phi=phi, z_fst=z_fst, z_mid=z_mid, z_end=z_end,
                dt_phi=dt_phi, dx_phi=dx_phi,
            )
        state_z = state._replace(z_fst=z_fst, z_mid=z_mid, z_end=z_end)
        A, B, lambda_c = solve_q_lambda(config, state_z, dt_phi, dx_phi)
        tau, sz = state.tau, state.scale_z
        dec_b = decouple_space(B, sz)
        return state._replace(
            phi=phi, A=A, B=B, lambda_c=lambda_c,
            z_fst=z_fst, z_mid=z_mid, z_end=z_end,
            mu=state.mu + tau * (dt_phi - A - lambda_c),
            E=state.E + tau * (dx_phi - B),
            beta_fst=state.beta_fst + tau * (z_fst + sz * A - state.constant_d),
            beta_mid=state.beta_mid + tau * (z_mid - dec_b),
            beta_end=state.beta_end + tau * (z_end - sz * A - state.constant_d),
            dt_phi=dt_phi, dx_phi=dx_phi,
        )

    def chain(body):
        @jax.jit
        def run(state, n):
            return jax.lax.fori_loop(0, n, lambda _, s: body(s), state)
        return run

    def fetch(s):
        return np.asarray(s.phi)[0, 0]

    # Representative state: run real iterations first (CG warm starts, KKT
    # magnitudes, sigma all realistic for the mid-solve regime).
    state = run_chunk(config, data, state, np.int32(args.warmup_iters))
    fetch(state)

    def timed(run, state, n):
        run(state, np.int32(2))  # compile both trip counts
        fetch(run(state, np.int32(2 + n)))
        t0 = time.perf_counter()
        fetch(run(state, np.int32(2)))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(run(state, np.int32(2 + n)))
        t_long = time.perf_counter() - t0
        return (t_long - t_short) / n

    n = args.iters
    table = {}
    table["full_iteration_ms"] = timed(chain(iteration_variant), state, n) * 1e3
    table["no_laplacian_ms"] = (
        timed(chain(lambda s: iteration_variant(s, skip_lap=True)), state, n)
        * 1e3
    )
    table["no_soc_ms"] = (
        timed(chain(lambda s: iteration_variant(s, skip_soc=True)), state, n)
        * 1e3
    )
    table["no_qmult_ms"] = (
        timed(chain(lambda s: iteration_variant(s, skip_qmult=True)), state, n)
        * 1e3
    )

    # Standalone KKT chain (dependency through a zero-scaled feedback).
    def kkt_body(s):
        t = kkt_table(config, data, s)
        return s._replace(mu=s.mu + 0.0 * t[0, 0])

    table["kkt_table_ms"] = timed(chain(kkt_body), state, n) * 1e3

    # CG solve with inner-iteration count at the production rtol.
    from dots_socp_tpu.ops.laplacian import cg_solve
    from dots_socp_tpu.solver.step import laplacian_rhs

    rhs = jax.jit(lambda d, s: laplacian_rhs(config, d, s))(data, state)

    @jax.jit
    def cg_iters(d, r, x0):
        return cg_solve(d.ops, d.cg_op, r, x0=x0,
                        max_iters=config.cg_max_iters, return_iters=True)

    _, inner_cold = cg_iters(data, rhs, jnp.zeros_like(state.phi))
    _, inner_warm = cg_iters(data, rhs, state.phi)

    marginal = {
        "laplacian_solve_ms": table["full_iteration_ms"] - table["no_laplacian_ms"],
        "soc_projection_ms": table["full_iteration_ms"] - table["no_soc_ms"],
        "q_and_multiplier_ms": table["full_iteration_ms"] - table["no_qmult_ms"],
    }

    if args.profile_dir:
        os.makedirs(args.profile_dir, exist_ok=True)
        with jax.profiler.trace(args.profile_dir):
            fetch(run_chunk(config, data, state, np.int32(5)))

    print(
        json.dumps(
            {
                "metric": (
                    f"per-iteration attribution (plane n{args.n_space}, "
                    f"V={config.n_vertices_real}, F={config.n_triangles_real}, "
                    f"T={args.ntime}, f32, CG path, refine="
                    f"{'on' if config.phi_refine else 'off'}, "
                    f"cg_rtol={args.cg_rtol:g})"
                ),
                "unit": "ms/iteration",
                "chain_timings": {k: round(v, 3) for k, v in table.items()},
                "marginal_costs": {k: round(v, 3) for k, v in marginal.items()},
                "cg_inner_iters": {
                    "cold": int(inner_cold),
                    "warm_from_current_phi": int(inner_warm),
                },
                "profile_dir": args.profile_dir,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
