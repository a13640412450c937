"""Distributed execution: device meshes and sharding specifications.

The reference is single-process with no communication backend
(SURVEY.md section 5.8); here scaling is a first-class component:
state and operator arrays carry NamedShardings over a ("time", "space")
mesh and XLA inserts the collectives (psum for the weighted-norm
reductions, all-gathers around the mesh gathers, matmul collectives for
the spectral solve).
"""

from dots_socp_tpu.parallel.distributed import (
    initialize_distributed,
    make_solver_mesh,
    parse_mesh_shape,
)
from dots_socp_tpu.parallel.mesh import (
    make_mesh,
    state_shardings,
    problem_shardings,
    shard_state,
    shard_problem,
)

__all__ = [
    "initialize_distributed",
    "make_solver_mesh",
    "parse_mesh_shape",
    "make_mesh",
    "state_shardings",
    "problem_shardings",
    "shard_state",
    "shard_problem",
]
