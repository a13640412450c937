"""Pure-JAX device operators: mesh calculus, time stencils, cones, Laplacian.

Every function here is traceable (no data-dependent Python control flow) and
composes into the single fused iALM iteration in `dots_socp_tpu.solver.step`.

Importing this package configures two JAX defaults for the solver's compute
path (each overridable by setting the env var before import):

* ``jax_default_matmul_precision`` -> ``DOTS_SOCP_TPU_MATMUL_PRECISION``
  (default "highest"; "keep" leaves JAX's default). On TPU MXUs, float32
  dot-generals default to bfloat16 passes with ~1e-3 relative error, which
  caps the attainable KKT residual near 1e-2 -- this is a KKT-driven solver,
  so full-f32 accumulation is the correct default, not a tuning knob.
* ``jax_compilation_cache_dir`` -> ``JAX_COMPILATION_CACHE_DIR``
  (default ``~/.cache/dots_socp_tpu/jax``): the fused iteration + KKT graphs
  take tens of seconds to compile; the persistent cache makes every rerun of
  the CLI / replication harness start hot.
"""

import os as _os

import jax as _jax

_prec = _os.environ.get("DOTS_SOCP_TPU_MATMUL_PRECISION", "highest")
if _prec != "keep":
    _jax.config.update("jax_default_matmul_precision", _prec)

if getattr(_jax.config, "jax_compilation_cache_dir", None) is None:
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "dots_socp_tpu", "jax"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Through a high-latency device link even sub-second compiles cost
        # a round trip; persist everything.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except OSError:
        pass

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
from dots_socp_tpu.ops.sharded_window import (
    ShardedWindow,
    build_sharded_window,
    sharded_window_matvec,
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
    "ShardedWindow",
    "build_sharded_window",
    "sharded_window_matvec",
]
