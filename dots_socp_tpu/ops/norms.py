"""Weighted space-time norms.

Mirrors the reference's `norm_square_weight` family
(`socp/solver_socp.py:215-218,875-878`): squared norms weighted by vertex or
triangle areas and averaged over the number of time slices. The weight
arrays are never materialized at full (T, ...) shape -- broadcasting against
the (V,) / (F,) area vectors lets XLA fuse the reduction.

Under a sharded state these reductions become the framework's collectives:
jit + NamedSharding inserts the psums (reference has no distributed backend;
see SURVEY.md section 5.8).
"""

from __future__ import annotations

import jax.numpy as jnp


def norm_sq_vertex(av, a, num_avg: int):
    """sum(a^2 * av[v]) / num_avg for a of shape (T_like, V)."""
    return jnp.einsum("tv,v->", a * a, av) / num_avg


def norm_sq_triangle(area_f, a, num_avg: int):
    """sum(a^2 * area_f) / num_avg for a of shape (T_like, F, 3coord)."""
    return jnp.einsum("tfc,f->", a * a, area_f) / num_avg


def norm_sq_decouple(area_f, a, num_avg: int):
    """sum(a^2 * area_f) / num_avg for a of shape (T, 2, F, 3, 3)."""
    return jnp.einsum("tefkc,f->", a * a, area_f) / num_avg
