"""iALM solver for the SOCP reformulation of dynamic optimal transport.

Layout:
  state.py      -- SolverState pytree (all mutable per-iteration data)
  problem.py    -- one-time assembly: operators, spectral factor, constants
  step.py       -- the fused iALM iteration + chunked driver (device)
  kkt.py        -- all 7 KKT residuals in one fused computation (device)
  scaling.py    -- prim/dual/z rescalings + sigma penalty updates (device)
  schedule.py   -- sigma cadence / factor tables / scaling triggers (host)
  socp.py       -- solver_socp orchestration (host)
  decorators.py -- SOCP -> DOT unit translation, stagger -> center grid
"""

from dots_socp_tpu.solver.socp import solver_socp
from dots_socp_tpu.solver.decorators import solver, solver_raw

__all__ = ["solver_socp", "solver", "solver_raw"]
