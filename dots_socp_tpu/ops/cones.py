"""Batched second-order cone projection.

One cone per (time interval, vertex): the variable
(z_fst[t,v]; {x_mid over corner slots incident to v}, z_end[t,v]) is projected
onto the rotated cone { (s, y) : s >= ||y|| } in the diagonal-rescaled
coordinates x_mid = diag_soc * z_mid. Closed form (reference
`socp/solver_socp.py:988-1042`): with n = ||tail||, lam = clip(0.5 (1 +
s/n), 0, 1); the projection scales the tail by lam and sets the head to
lam * n (identity when lam saturates at 1, zero when lam = 0).

Everything is elementwise over (T, 2, F, 3, 3) plus one incidence-table
reduction and one gather -- XLA fuses the whole step into a handful of
HBM-bandwidth-bound loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from dots_socp_tpu.ops.mesh_ops import SurfaceOps, vertex_gather, vertex_reduce


def project_soc(ops: SurfaceOps, to_fst, to_mid, to_end, halo=None, mesh_axes=None):
    """Project points onto the per-(t, v) second-order cones.

    Parameters
    ----------
    to_fst : (T, V)            cone head (already in cone coordinates)
    to_mid : (T, 2, F, 3, 3)   tail block, already scaled by diag_soc
    to_end : (T, V)            tail scalar component

    Returns
    -------
    z_fst : (T, V)
    z_mid : (T, 2, F, 3, 3)  -- tail scaled back to original z coordinates
            (the 1/diag_soc of the reference's lam_triangles is applied here)
    z_end : (T, V)
    """
    # ||tail||^2 per (t, v): sum of squares of incident mid entries + end^2.
    sq = (to_mid * to_mid).sum(axis=(1, 4))  # (T, F, 3corner)
    norm_sq = vertex_reduce(ops, sq, halo, mesh_axes, ("time",)) + to_end * to_end
    norm = jnp.sqrt(norm_sq)

    # Zero-norm guard: for a zero tail the correct projection is the
    # identity when to_fst >= 0 and the origin when to_fst < 0; flooring
    # the norm at the smallest normal float makes the lam formula produce
    # exactly that (clip saturates) instead of 0/0 = NaN poisoning the
    # state. (The reference shares this hazard; we fix it.)
    safe_norm = jnp.maximum(norm, jnp.finfo(norm.dtype).tiny)
    lam = jnp.clip(0.5 * (1.0 + to_fst / safe_norm), 0.0, 1.0)
    inside = lam >= 1.0  # point already inside the cone: identity

    z_fst = jnp.where(inside, to_fst, lam * norm)
    z_end = lam * to_end

    lam_slots = vertex_gather(ops, lam, halo, mesh_axes, ("time",)) / ops.diag_soc
    z_mid = lam_slots[:, None, :, :, None] * to_mid
    return z_fst, z_mid, z_end
