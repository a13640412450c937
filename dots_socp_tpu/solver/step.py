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


def laplacian_rhs(config: ProblemConfig, data: ProblemData, state: SolverState):
    """RHS of the phi system, mirroring reference `vanilla_solve_laplacian`
    (`solver_socp.py:976-986`), incl. the proximal -eps * av * phi_prev term."""
    ops = data.ops
    spmd = config.spmd_kwargs(data)
    dt = config.stepsize_time
    rhs_t = (state.A + state.lambda_c - state.mu) * ops.av[None, :]
    rhs_x = (state.B - state.E) * ops.area_f[None, :, None]
    rhs = div_time(dt, rhs_t) + div_space(ops, rhs_x, lead=(None,), **spmd)
    # phi may be f64 (mixed-precision refinement); the RHS stays in the
    # work dtype -- refinement's f64 true residual is computed against this
    # same RHS, so consistency (not extra RHS precision) is what matters.
    phi_w = state.phi.astype(rhs.dtype)
    return rhs - state.boundary - state.eps * ops.av[None, :] * phi_w


def solve_laplacian(config: ProblemConfig, data: ProblemData, state: SolverState):
    """Step 1a: solve the space-time Laplacian system for phi."""
    ops = data.ops
    spmd = config.spmd_kwargs(data)
    rhs = laplacian_rhs(config, data, state)

    if config.laplacian_mode == "spectral":
        return spectral_solve(data.spectral, rhs)
    # With the space axis sharded but no halo tables (spmd == {}), the ELL
    # gather would force a per-matvec all-gather of x under GSPMD; tell
    # cg_solve so it routes through the partitionable incidence form.
    space_is_sharded = (
        config.mesh_axes is not None and config.mesh_axes[1] > 1 and not spmd
    )
    return cg_solve(
        ops,
        data.cg_op,
        rhs,
        x0=state.phi,
        max_iters=config.cg_max_iters,
        rtol=None,  # traced data.cg_op.rtol (host-adapted, no recompile)
        space_sharded=space_is_sharded,
        ops_hi=data.ops_hi,
        **spmd,
    )


def solve_proj_soc(config: ProblemConfig, data: ProblemData, state: SolverState):
    """Step 1b: project onto the second-order cones (uses pre-step-2 A, B)."""
    ops = data.ops
    dec_b = decouple_space(state.B, state.scale_z)
    to_fst = state.constant_d - state.scale_z * state.A - state.beta_fst
    to_mid = ops.diag_soc[None, None, :, :, None] * (dec_b - state.beta_mid)
    to_end = state.constant_d + state.scale_z * state.A - state.beta_end
    return project_soc(ops, to_fst, to_mid, to_end, **config.spmd_kwargs(data))


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
    z_fst, z_mid, z_end = solve_proj_soc(config, data, state)

    # Step 2. With mixed-precision refinement phi is f64; its gradients are
    # taken in f64 then rounded to the work dtype (the extra quantization
    # enters dual_aux only through one div factor, ~eps32 * sqrt(cond) --
    # an order below tol -- whereas keeping phi itself f32 would floor the
    # true phi-residual, and with it KKT dual feasibility, at eps32 * cond).
    wd = config.jnp_dtype
    dt_phi = grad_time(config.stepsize_time, phi).astype(wd)
    dx_phi = grad_space(
        data.ops, phi, lead=(None,), **config.spmd_kwargs(data)
    ).astype(wd)
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


# sigma-schedule constants mirrored on device (must match
# `schedule.SigmaSchedule`; reference `utils/admm_tools.py:25-95`).
_ADJ_LOS = (0, 20, 50, 100, 200, 500)
_ADJ_HIS = (20, 50, 100, 200, 500, 1 << 30)
_ADJ_GAPS = (3, 7, 11, 17, 31, 43)
_GAP_FACTORS_ASC = (  # ascending thresholds; last satisfied wins
    (1.2, 1.10), (1.5, 1.20), (2.0, 1.26), (2.5, 1.28), (3.0, 1.32),
    (5.0, 1.35), (10.0, 1.40), (20.0, 1.60), (35.0, 1.75), (50.0, 2.00),
)
_SIGMA_LOWER, _SIGMA_UPPER = 1e-3, 1e3

#: Packed layout of one per-check record in `run_chunk_adaptive` output.
ADAPTIVE_REC_SIZE = 17  # [it_offset, adjusted, sigma_factor, table(7x2)]
ADAPTIVE_HEADER = 4  # [n_checks, it_total, last_adjust_it, is_org_kkt]


def _device_next_adjust(it, last_adjust):
    """Smallest absolute iteration a >= it with a - last_adjust >= gap(a)
    (device mirror of `SigmaSchedule.next_adjust_iteration`)."""
    los = jnp.asarray(_ADJ_LOS, dtype=jnp.int32)
    his = jnp.asarray(_ADJ_HIS, dtype=jnp.int32)
    gaps = jnp.asarray(_ADJ_GAPS, dtype=jnp.int32)
    cand = jnp.maximum(jnp.maximum(los, it), last_adjust + gaps)
    valid = cand < his
    return jnp.min(jnp.where(valid, cand, jnp.int32(1 << 30)))


def _device_sigma_factor(sigma, prim_dual_gap):
    """Applied multiplicative sigma factor (device mirror of
    `SigmaSchedule.updated_sigma`, incl. the [1e-3, 1e3] safeguard)."""
    g = jnp.where(prim_dual_gap < 1.0, 1.0 / prim_dual_gap, prim_dual_gap)
    fac = jnp.asarray(1.0, dtype=sigma.dtype)
    for threshold, f in _GAP_FACTORS_ASC:
        fac = jnp.where(g > threshold, f, fac)
    fac = jnp.where(prim_dual_gap < 1.0, 1.0 / fac, fac)
    new_sigma = jnp.clip(sigma * fac, _SIGMA_LOWER, _SIGMA_UPPER)
    return new_sigma / sigma


@partial(jax.jit, static_argnums=(0, 7), donate_argnums=2)
def run_chunk_adaptive(
    config: ProblemConfig,
    data: ProblemData,
    state: SolverState,
    it0,
    k_bound,
    j_first,
    aux,
    max_checks: int = 64,
):
    """Device-resident solver segment: iterations, adaptive-cadence KKT
    validations AND sigma updates all on device -- ONE dispatch and ONE
    device->host transfer per `k_bound` iterations.

    Through a high-latency link every host<->device interaction costs more
    than dozens of fused iterations, so the host schedule (reference
    `socp/solver_socp.py:724-823`) is mirrored in traced control flow:

      * adaptive KKT cadence (`utils/condition_validator_wrapper.py:76-97`):
        interval 1 at tolerance, 37 beyond 10x away, log-linear between;
      * sigma cadence + gap lookup + safeguards (`utils/admm_tools.py:25-95`)
        applied via the same pytree transform as the host path;
      * the org/scaled column switch once scaled errors < 5 tol.

    Every computed KKT table is returned (packed) so the host replays its
    bookkeeping (history, progress, schedule state) exactly.

    Parameters: it0 absolute iteration index of the first iteration in the
    segment; k_bound max iterations; j_first iterations until the first
    check; aux = [last_adjust_it, is_org_kkt (0/1), tol, next_checkpoint,
    sigma_freeze]. sigma_freeze mirrors the host's sticky tail rule
    (`solver_socp(sigma_freeze_error=...)`): once the stop-set error at a
    validation drops below it, later validations in the segment skip the
    sigma factor (the cadence still fires, matching the host's bookkeeping);
    -inf disables, +inf means the host already latched the freeze.
    next_checkpoint (-inf when none are pending) makes the segment stop at
    the validation where the stop-set error first crosses a tolerance
    checkpoint, so the host snapshots the state exactly at the crossing --
    checkpointed (versus-exact) runs keep this one-dispatch-per-segment
    path instead of falling back to per-validation host syncs.

    Returns (state, packed) where packed =
      [n_checks, it_total, last_adjust_it, is_org_kkt,
       rec_0 ... rec_{max_checks-1}]
    and rec = [it_offset (1-based), adjusted (0/1), sigma_factor,
    table.ravel() (7x2)]. Convergence stop: all 7 original-unit errors < tol
    (the host loop's `passed`).
    """
    min_int, max_int = 1, 37  # AdaptiveKKTCadence defaults

    from dots_socp_tpu.solver.kkt import kkt_table
    from dots_socp_tpu.solver.scaling import apply_penalty_factor

    dtype = config.jnp_dtype  # work dtype (phi may be wider under refinement)
    last_adjust0 = aux[0].astype(jnp.int32)
    is_org0 = aux[1] > 0.5
    tol = aux[2].astype(dtype)
    next_checkpoint = aux[3].astype(dtype)
    sigma_freeze = aux[4].astype(dtype)
    recs0 = jnp.full((max_checks, ADAPTIVE_REC_SIZE), jnp.nan, dtype=dtype)
    stop_idx = jnp.asarray([0, 2, 4, 5])
    prim_pos = jnp.asarray([0, 1])
    dual_pos = jnp.asarray([2, 3])

    def next_interval(err):
        # Parity with AdaptiveKKTCadence.set_error_and_tolerance.
        ratio = err / jnp.maximum(tol, 1e-10)
        log_ratio = jnp.log10(ratio)
        lin = jnp.maximum(
            min_int, (min_int + log_ratio * (max_int - min_int)).astype(jnp.int32)
        )
        iv = jnp.where(log_ratio > 1.0, max_int, lin)
        iv = jnp.where(ratio <= 1.0, min_int, iv)
        return jnp.where(jnp.isfinite(err), iv, max_int).astype(jnp.int32)

    def cond(carry):
        _, _, n, it_total, _, _, _, _, done = carry
        return (~done) & (it_total < k_bound) & (n < max_checks)

    def body(carry):
        state, recs, n, it_total, j_next, last_adjust, is_org, frozen, _ = carry
        it_cur = it0 + it_total
        na = _device_next_adjust(it_cur, last_adjust)
        j = jnp.minimum(
            jnp.minimum(j_next, k_bound - it_total), jnp.maximum(na - it_cur + 1, 1)
        )
        state = jax.lax.fori_loop(
            0, j, lambda _, s: iteration(config, data, s), state
        )
        it_total = it_total + j
        a = it0 + it_total - 1  # absolute index of the just-finished iteration

        table = kkt_table(config, data, state)
        org, scaled = table[:, 0], table[:, 1]
        err = jnp.nanmax(org[stop_idx])
        passed = jnp.all(org < tol)
        done = passed | (err <= next_checkpoint)

        # org/scaled switch precedes the sigma update (host order).
        is_org = is_org | (jnp.nanmax(scaled) < 5 * tol)

        # Sticky tail freeze: latched BEFORE the factor at this validation
        # (host order: error -> freeze latch -> sigma adjust).
        frozen = frozen | (err < sigma_freeze)

        # Host order at a validation is checkpoint -> passed-check -> sigma
        # adjust: a tolerance-checkpoint crossing that ends the segment must
        # NOT suppress a sigma update scheduled at the same validation (the
        # snapshot is unaffected: `apply_penalty_factor` keeps r*mu and r*E
        # invariant, and the recovered checkpoint scales mu/E by r).
        adjust_now = (a == na) & (~passed)
        col = jnp.where(is_org, org, scaled)
        prim_error = jnp.nanmax(col[prim_pos])
        dual_error = jnp.nanmax(col[dual_pos])
        gap_ok = (
            jnp.isfinite(prim_error) & jnp.isfinite(dual_error) & (dual_error > 0)
        )
        gap = jnp.where(
            gap_ok,
            prim_error / jnp.where(dual_error > 0, dual_error, 1.0),
            1.0,
        )
        factor = jnp.where(
            adjust_now & gap_ok & (~frozen), _device_sigma_factor(state.r, gap), 1.0
        ).astype(dtype)
        state = apply_penalty_factor(state, factor)
        last_adjust = jnp.where(adjust_now, a, last_adjust)

        rec = jnp.concatenate(
            [
                jnp.stack(
                    [
                        it_total.astype(dtype),
                        adjust_now.astype(dtype),
                        factor,
                    ]
                ),
                table.ravel().astype(dtype),
            ]
        )
        recs = jax.lax.dynamic_update_index_in_dim(recs, rec, n, 0)
        return (
            state, recs, n + 1, it_total, next_interval(err),
            last_adjust, is_org, frozen, done,
        )

    init = (
        state, recs0, jnp.int32(0), jnp.int32(0), j_first,
        last_adjust0, is_org0, False, False,
    )
    state, recs, n, it_total, _, last_adjust, is_org, _, _ = jax.lax.while_loop(
        cond, body, init
    )
    header = jnp.stack(
        [
            n.astype(dtype),
            it_total.astype(dtype),
            last_adjust.astype(dtype),
            is_org.astype(dtype),
        ]
    )
    return state, jnp.concatenate([header, recs.ravel()])


@partial(jax.jit, static_argnums=0, donate_argnums=2)
def run_chunk_kkt(config: ProblemConfig, data: ProblemData, state: SolverState, n):
    """`run_chunk` + the fused (7, 2) KKT table, in ONE device dispatch.

    The host plans chunks to end exactly on KKT validation points; computing
    the table in the same dispatch halves the host<->device round trips per
    validation (the dominant cost through a high-latency device link: the
    reference separates iteration and validation because both are host code,
    `socp/solver_socp.py:656-787`).
    """
    from dots_socp_tpu.solver.kkt import kkt_table

    state = jax.lax.fori_loop(
        0, n, lambda _, s: iteration(config, data, s), state
    )
    return state, kkt_table(config, data, state)
