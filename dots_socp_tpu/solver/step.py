"""The fused iALM iteration and the chunked multi-iteration driver.

One call to `iteration` is the whole per-iteration hot loop of the reference
(`socp/solver_socp.py:656-722`), expressed as a single traced computation:

  step 1a  phi   <- spacetime-Laplacian solve of the dual residual RHS
  step 1b  z     <- batched SOC projection (independent of 1a given old A, B;
                    XLA schedules both from one graph -- the reference needed
                    two Python threads for this, `solver_socp.py:674-696`)
  step 2   q     <- closed-form diagonal solve for (A, B, lambda_c)
  step 3   duals <- multiplier ascent with step tau

`run_chunk` dispatches `n` iterations in one device call via lax.fori_loop
(dynamic bound), so the host only syncs at KKT validation points.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dots_socp_tpu.ops.cones import project_soc
from dots_socp_tpu.ops.laplacian import cg_solve, spectral_solve
from dots_socp_tpu.ops.mesh_ops import div_space, grad_space
from dots_socp_tpu.ops.time_stencils import (
    decouple_space,
    decouple_space_adjoint,
    div_time,
    grad_time,
)
from dots_socp_tpu.solver.problem import ProblemConfig, ProblemData
from dots_socp_tpu.solver.state import SolverState


def solve_laplacian(config: ProblemConfig, data: ProblemData, state: SolverState):
    """Step 1a: solve the space-time Laplacian system for phi.

    RHS mirrors reference `vanilla_solve_laplacian` (`solver_socp.py:976-986`),
    including the proximal -eps * av * phi_prev term.
    """
    ops = data.ops
    dt = config.stepsize_time
    rhs_t = (state.A + state.lambda_c - state.mu) * ops.av[None, :]
    rhs_x = (state.B - state.E) * ops.area_f[None, :, None]
    rhs = div_time(dt, rhs_t) + div_space(ops, rhs_x) - state.boundary
    rhs = rhs - state.eps * ops.av[None, :] * state.phi

    if config.laplacian_mode == "spectral":
        return spectral_solve(data.spectral, rhs)
    return cg_solve(
        ops,
        data.cg_op,
        rhs,
        x0=state.phi,
        max_iters=config.cg_max_iters,
        rtol=config.cg_rtol,
    )


def solve_proj_soc(data: ProblemData, state: SolverState):
    """Step 1b: project onto the second-order cones (uses pre-step-2 A, B)."""
    ops = data.ops
    dec_b = decouple_space(state.B, state.scale_z)
    to_fst = state.constant_d - state.scale_z * state.A - state.beta_fst
    to_mid = ops.diag_soc[None, None, :, :, None] * (dec_b - state.beta_mid)
    to_end = state.constant_d + state.scale_z * state.A - state.beta_end
    return project_soc(ops, to_fst, to_mid, to_end)


def solve_q_lambda(config: ProblemConfig, state: SolverState, dt_phi, dx_phi):
    """Step 2 (and PALM step 0): closed-form diagonal solve for (A, B, lambda).

    Reference `vanilla_solve_q_lambda` (`solver_socp.py:1044-1065`).
    """
    sz = state.scale_z
    a1 = sz * (1.0 + state.congestion * state.r)
    a2 = 1.0 + 2.0 * sz * a1

    memo_a = dt_phi + state.mu
    memo_b = decouple_space_adjoint(state.z_mid + state.beta_mid, sz)

    A = (1.0 / a2) * memo_a + (a1 / a2) * (
        state.z_end + state.beta_end - state.z_fst - state.beta_fst
    )
    # Diagonal of the B system: 1 + 2 sz^2 on interior time slices,
    # 1 + sz^2 at the endpoints (each endpoint slice has only one cone copy).
    interior = 1.0 + 2.0 * sz * sz
    endpoint = 1.0 + sz * sz
    diag_b = jnp.concatenate(
        [
            endpoint[None],
            jnp.broadcast_to(interior, (config.n_time - 1,)),
            endpoint[None],
        ]
    )
    B = (dx_phi + state.E + memo_b) / diag_b[:, None, None]
    cr = state.congestion * state.r
    lambda_c = (cr / (1.0 + cr)) * (memo_a - A)
    return A, B, lambda_c


def iteration(config: ProblemConfig, data: ProblemData, state: SolverState):
    """One full iALM iteration; pure function of the state pytree."""
    if config.is_palm:
        A, B, lambda_c = solve_q_lambda(config, state, state.dt_phi, state.dx_phi)
        state = state._replace(A=A, B=B, lambda_c=lambda_c)

    # Step 1: Laplacian solve and SOC projection share the pre-update state.
    phi = solve_laplacian(config, data, state)
    z_fst, z_mid, z_end = solve_proj_soc(data, state)

    # Step 2
    dt_phi = grad_time(config.stepsize_time, phi)
    dx_phi = grad_space(data.ops, phi)
    state_z = state._replace(z_fst=z_fst, z_mid=z_mid, z_end=z_end)
    A, B, lambda_c = solve_q_lambda(config, state_z, dt_phi, dx_phi)

    # Step 3: multiplier ascent
    tau = state.tau
    sz = state.scale_z
    dec_b = decouple_space(B, sz)
    mu = state.mu + tau * (dt_phi - A - lambda_c)
    E = state.E + tau * (dx_phi - B)
    beta_fst = state.beta_fst + tau * (z_fst + sz * A - state.constant_d)
    beta_mid = state.beta_mid + tau * (z_mid - dec_b)
    beta_end = state.beta_end + tau * (z_end - sz * A - state.constant_d)

    return state._replace(
        phi=phi,
        A=A,
        B=B,
        lambda_c=lambda_c,
        z_fst=z_fst,
        z_mid=z_mid,
        z_end=z_end,
        mu=mu,
        E=E,
        beta_fst=beta_fst,
        beta_mid=beta_mid,
        beta_end=beta_end,
        dt_phi=dt_phi,
        dx_phi=dx_phi,
    )


@partial(jax.jit, static_argnums=0, donate_argnums=2)
def run_chunk(config: ProblemConfig, data: ProblemData, state: SolverState, n):
    """Run `n` iterations in one device dispatch (n may be traced)."""
    return jax.lax.fori_loop(
        0, n, lambda _, s: iteration(config, data, s), state
    )
