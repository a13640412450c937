"""One-time problem assembly: operators, Laplacian factor, KKT constants.

Everything here runs once per (mesh, n_time, eps, dtype) on the host, then
lives on device for the whole solve. The reference does the analogous work at
`socp/solver_socp.py:96-237` (sparse matrix assembly + SuperLU
factorizations); here it becomes SurfaceOps index tables and the spectral /
CG factor of the space-time Laplacian.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from dots_socp_tpu.geometry.surface import cotan_laplacian, triangle_quantities
from dots_socp_tpu.ops.laplacian import (
    CGOperator,
    SpectralFactor,
    build_cg_operator,
    build_spectral_factor,
)
from dots_socp_tpu.ops.mesh_ops import SurfaceOps, build_surface_ops
from dots_socp_tpu.utils.types import GeometryData


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Static (hashable) solver configuration; changing any field recompiles."""

    n_time: int
    n_vertices: int
    n_triangles: int
    stepsize_time: float
    is_palm: bool = False
    laplacian_mode: str = "spectral"  # "spectral" | "cg"
    cg_max_iters: int = 200
    cg_rtol: float = 1e-9
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


class ProblemData(NamedTuple):
    """Per-problem device arrays (a pytree passed through jit)."""

    ops: SurfaceOps
    spectral: Optional[SpectralFactor]
    cg_op: Optional[CGOperator]
    # Relative-KKT normalization constants (reference
    # `socp/solver_socp.py:303-313`): means of the weight arrays.
    c_prim_q: jnp.ndarray
    c_prim_z: jnp.ndarray
    c_dual_alpha: jnp.ndarray
    c_dual_beta: jnp.ndarray
    c_comp_rho: jnp.ndarray
    c_comp_m: jnp.ndarray


def build_problem(
    n_time: int,
    geometry: GeometryData,
    eps: float = 0.0,
    is_palm: bool = False,
    laplacian_mode: str = "auto",
    max_dense_vertices: int = 16384,
    cg_max_iters: int = 200,
    cg_rtol: float = 1e-9,
    dtype: str = "float32",
):
    """Assemble (ProblemConfig, ProblemData) plus host-side constants.

    Returns
    -------
    config : ProblemConfig
    data : ProblemData
    extras : dict with host floats {norm_constant_d, area_mesh} and the
        NumPy av / area_f arrays for downstream host bookkeeping.
    """
    vertices = np.asarray(geometry["vertices"], dtype=np.float64)
    triangles = np.asarray(geometry["triangles"])
    n_vertices = vertices.shape[0]
    n_triangles = triangles.shape[0]
    dt = 1.0 / n_time
    jdtype = jnp.float64 if dtype == "float64" else jnp.float32

    ops = build_surface_ops(vertices, triangles, dtype=jdtype)

    area_f, angles, _ = triangle_quantities(vertices, triangles)
    av = np.asarray(ops.av, dtype=np.float64)  # area_vertices / 3
    lap = cotan_laplacian(triangles, angles, n_vertices)

    if laplacian_mode == "auto":
        laplacian_mode = "spectral" if n_vertices <= max_dense_vertices else "cg"

    spectral = None
    cg_op = None
    if laplacian_mode == "spectral":
        spectral = build_spectral_factor(n_time, dt, av, lap, eps=eps, dtype=jdtype)
    elif laplacian_mode == "cg":
        cg_op = build_cg_operator(
            n_time, dt, av, lap.diagonal(), eps=eps, dtype=jdtype
        )
    else:
        raise ValueError(f"unknown laplacian_mode: {laplacian_mode}")

    mean_av = float(av.mean())
    mean_af = float(area_f.mean())
    scalar = lambda x: jnp.asarray(x, dtype=jdtype)

    config = ProblemConfig(
        n_time=n_time,
        n_vertices=n_vertices,
        n_triangles=n_triangles,
        stepsize_time=dt,
        is_palm=is_palm,
        laplacian_mode=laplacian_mode,
        cg_max_iters=cg_max_iters,
        cg_rtol=cg_rtol,
        dtype=dtype,
    )
    data = ProblemData(
        ops=ops,
        spectral=spectral,
        cg_op=cg_op,
        c_prim_q=scalar((mean_av + mean_af) / 2.0),
        c_prim_z=scalar((mean_av + mean_af + mean_av) / 3.0),
        c_dual_alpha=scalar(mean_av),
        c_dual_beta=scalar((mean_av + mean_af) / 2.0),
        c_comp_rho=scalar(mean_av),
        c_comp_m=scalar(mean_af),
    )
    extras = {
        "area_mesh": float(area_f.sum()),
        "norm_constant_d": math.sqrt(2.0 * float(area_f.sum())),
        "av": av,
        "area_f": area_f,
    }
    return config, data, extras
