"""Shard-local incidence gathers/reductions with explicit halo exchange.

Drop-in SPMD implementations of `ops.mesh_ops.vertex_gather` /
`vertex_reduce` for a space-sharded problem laid out by
`parallel.partition.blocked_layout`. Written with `jax.shard_map` so the
communication is explicit and minimal: each shard exports only its boundary
entries (one small all-gather), completes every gather/reduce from
[local block ++ halo buffer], and never materializes another shard's bulk
arrays — unlike the GSPMD lowering of an arbitrary-index gather, which must
all-gather the full operand. Communication volume per call is
O(boundary * n_shards) instead of O(V) or O(F).

(SURVEY.md section 7.3.6; the scaling-book halo-exchange recipe.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import AbstractMesh, PartitionSpec as P


class HaloTables(NamedTuple):
    """Device arrays driving the shard-local ops (see
    `partition.BlockedLayout` for the encoding).

    vtx_export  : (S, Vb) int32 -- local vertex ids each shard exports
    tri_local   : (F, 3) int32  -- per-corner gather codes
    slot_export : (S, Fb) int32 -- local flat corner-slot ids each shard
                  exports
    inc_local   : (V, D) int32  -- per-vertex reduce codes
    """

    vtx_export: jnp.ndarray
    tri_local: jnp.ndarray
    slot_export: jnp.ndarray
    inc_local: jnp.ndarray


def abstract_mesh(mesh_axes: tuple[int, int]) -> AbstractMesh:
    """The solver's ("time", "space") mesh as a device-free AbstractMesh
    (resolved to the physical mesh by the arguments' shardings)."""
    return AbstractMesh(tuple(mesh_axes), ("time", "space"))


def halo_gather(mesh_axes, halo: HaloTables, values, lead=()):
    """(..., V) vertex field -> (..., F, 3) per-corner values, shard-local.

    lead: PartitionSpec entries for the leading axes of `values`
    (e.g. (None,) for a (T+1, V) array, ("time",) for (T, V)).
    """
    lead = tuple(lead)

    def _shard(vals, vtx_export, tri_local):
        exported = vals[..., vtx_export[0]]  # (..., Vb)
        buf = jax.lax.all_gather(exported, "space", axis=-1, tiled=True)
        return jnp.concatenate([vals, buf], axis=-1)[..., tri_local]

    return jax.shard_map(
        _shard,
        mesh=abstract_mesh(mesh_axes),
        in_specs=(P(*lead, "space"), P("space", None), P("space", None)),
        out_specs=P(*lead, "space", None),
    )(values, halo.vtx_export, halo.tri_local)


def halo_reduce(mesh_axes, halo: HaloTables, inc_mask, values, lead=()):
    """Sum (..., F, 3) corner-slot data into vertices (..., V), shard-local.

    inc_mask is the (V, D) validity mask (shared with the global-path
    incidence table).
    """
    lead = tuple(lead)

    def _shard(vals, slot_export, inc_local, mask):
        flat = vals.reshape(vals.shape[:-2] + (-1,))  # (..., 3*f_chunk)
        exported = flat[..., slot_export[0]]  # (..., Fb)
        buf = jax.lax.all_gather(exported, "space", axis=-1, tiled=True)
        gathered = jnp.concatenate([flat, buf], axis=-1)[..., inc_local]
        return (gathered * mask).sum(-1)

    return jax.shard_map(
        _shard,
        mesh=abstract_mesh(mesh_axes),
        in_specs=(
            P(*lead, "space", None),
            P("space", None),
            P("space", None),
            P("space", None),
        ),
        out_specs=P(*lead, "space"),
    )(values, halo.slot_export, halo.inc_local, inc_mask)
