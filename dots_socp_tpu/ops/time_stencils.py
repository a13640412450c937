"""Time-axis stencil operators and space-staggered decoupling maps.

The time grid is staggered: potentials live on T+1 centered slices, momenta
and densities on T interval slices. All operators are nearest-neighbor
stencils, expressed with static slicing/concatenation so XLA fuses them into
neighboring elementwise work. Semantics match the reference operators
`vanilla_grad_time` / `vanilla_div_time` / `decouple_spacial` /
`decouple_adjoin_spacial` / `decouple_adjoint_time`
(`socp/solver_socp.py:881-974`) with one layout change: decoupled arrays use
axes (T, endpoint, F, corner, coord) instead of (T, endpoint, corner, F, coord)
so corner-slot data is contiguous with the triangle axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


def grad_time(dt: float, phi):
    """Forward time difference: (T+1, ...) -> (T, ...)."""
    return jnp.diff(phi, axis=0) / dt


def div_time(dt: float, m):
    """Negative adjoint of grad_time: (T, ...) -> (T+1, ...).

    out[0] = m[0]/dt, out[t] = (m[t]-m[t-1])/dt, out[T] = -m[T-1]/dt.
    """
    return jnp.concatenate([m[:1], jnp.diff(m, axis=0), -m[-1:]], axis=0) / dt


def time_center_adjoint(x):
    """Adjoint of centered time averaging: (T, ...) -> (T+1, ...).

    Adjoint of y[t] = (x[t] + x[t+1]) / 2:
    out[0] = x[0]/2, out[t] = (x[t-1]+x[t])/2, out[T] = x[T-1]/2.
    """
    zeros = jnp.zeros_like(x[:1])
    lo = jnp.concatenate([zeros, x], axis=0)
    hi = jnp.concatenate([x, zeros], axis=0)
    return 0.5 * (lo + hi)


def decouple_space(b, scale_z=1.0):
    """Copy the momentum field onto the space-staggered cone grid.

    (T+1, F, 3coord) -> (T, 2, F, 3corner, 3coord):
    out[t, 0, f, k, :] = (scale_z/sqrt(3)) * b[t]   (interval start)
    out[t, 1, f, k, :] = (scale_z/sqrt(3)) * b[t+1] (interval end)
    broadcast over the 3 corners k.
    """
    b_aux = (scale_z / SQRT3) * b
    pair = jnp.stack([b_aux[:-1], b_aux[1:]], axis=1)  # (T, 2, F, 3coord)
    n_time, _, n_f, _ = pair.shape
    return jnp.broadcast_to(pair[:, :, :, None, :], (n_time, 2, n_f, 3, 3))


def decouple_space_adjoint(x, scale_z=1.0):
    """Adjoint of decouple_space: (T, 2, F, 3corner, 3coord) -> (T+1, F, 3coord).

    out[t] = (scale_z/sqrt(3)) * (sum_k x[t, 0, :, k] + sum_k x[t-1, 1, :, k])
    with the obvious boundary truncation.
    """
    summed = (scale_z / SQRT3) * x.sum(axis=3)  # (T, 2, F, 3coord)
    # out has T+1 slices: slice t gets the start-contribution for t < T and
    # the end-contribution for t > 0.
    lo = jnp.concatenate([summed[:, 0], jnp.zeros_like(summed[:1, 0])], axis=0)
    hi = jnp.concatenate([jnp.zeros_like(summed[:1, 1]), summed[:, 1]], axis=0)
    return lo + hi
