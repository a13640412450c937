"""Pure-JAX device operators: mesh calculus, time stencils, cones, Laplacian.

Every function here is traceable (no data-dependent Python control flow) and
composes into the single fused iALM iteration in `dots_socp_tpu.solver.step`.
"""

from dots_socp_tpu.ops.mesh_ops import (
    SurfaceOps,
    build_surface_ops,
    grad_space,
    div_space,
    vertex_reduce,
    vertex_gather,
    laplacian_apply,
)
from dots_socp_tpu.ops.time_stencils import (
    grad_time,
    div_time,
    time_center_adjoint,
    decouple_space,
    decouple_space_adjoint,
)
from dots_socp_tpu.ops.cones import project_soc
from dots_socp_tpu.ops.laplacian import (
    SpectralFactor,
    build_spectral_factor,
    spectral_solve,
    build_time_laplacian,
)

__all__ = [
    "SurfaceOps",
    "build_surface_ops",
    "grad_space",
    "div_space",
    "vertex_reduce",
    "vertex_gather",
    "laplacian_apply",
    "grad_time",
    "div_time",
    "time_center_adjoint",
    "decouple_space",
    "decouple_space_adjoint",
    "project_soc",
    "SpectralFactor",
    "build_spectral_factor",
    "spectral_solve",
    "build_time_laplacian",
]
