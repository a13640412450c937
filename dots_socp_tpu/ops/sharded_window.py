"""Space-sharded Pallas window SpMV: the two-level window kernel per shard.

The single-device window kernel (`ops.pallas_spmv`) is the production CG
matvec (measured 4.7x over padded-ELL at V=46k); this module runs it on a
space-sharded problem so multi-chip solves keep the kernel advantage
instead of falling back to the halo/incidence matvec (reference hot loop:
`utils/laplacian_inverse_socp.py:57-59` -- one process, cached SuperLU).

Per-shard construction (host, once per problem):

  1. Each shard owns the contiguous blocked row range produced by
     `parallel.partition.blocked_layout`. Its EXTENDED vertex set is the
     local block plus the remote columns its Laplacian rows reference.
  2. Reverse-Cuthill-McKee on the extended subgraph interleaves remote
     vertices among the locals, so every TV-row tile's neighbor columns
     span a narrow window of extended positions. Per-shard bandwidth is
     ~sqrt(V/S) on surface meshes -- the sharded windows are NARROWER
     than the global one, so total matrix traffic drops ~sqrt(S)x.
  3. The CG state is carried in "compressed window order": shard s's
     chunk holds its local vertices sorted by extended-RCM rank. All
     device-side reorderings are then shard-local gathers.

Per matvec (device, inside one `jax.shard_map` region):

  exports = x_local[exp_codes]            # boundary values, window order
  buf     = all_gather(exports, "space")  # the ONLY collective
  xw      = concat(x_local, buf, 0)[win_codes]   # extended window vector
  y       = two-level window kernel (per-shard tiles, shared x-window DMA)

Communication per matvec is one boundary-sized all-gather -- the same
volume as the halo/incidence path -- while the FLOPs ride the MXU on
dense window tiles.
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from dots_socp_tpu.ops.pallas_spmv import _LANES, _VMEM_BUDGET, _window_kernel


class ShardedWindow(NamedTuple):
    """Per-shard window-tile form of the blocked (V, V) cotan Laplacian.

    All leading-S arrays are sharded over the mesh "space" axis; inside the
    shard_map each shard consumes row 0 of its block.

    a_tiles   : (S, n_tiles * TV, W) f32 dense window rows; shard s row
                t*TV + r holds its compressed-window row t*TV+r over
                extended positions [starts[s, t // G] + sub_off[s, t], +W)
    starts    : (S, n_super) i32 shared x-window start per super-tile
    sub_off   : (S, n_tiles) i32 tile offset inside its super-window
    exp_codes : (S, Wb) i32 -- positions (in shard-local compressed window
                order) of the boundary values each shard exports
    win_codes : (S, Nw) i32 -- gather codes building the extended window
                vector: < v_chunk = local compressed position, else
                v_chunk + owner*Wb + rank into the all-gathered buffer;
                padding rows point at the appended zero slot
    state_in  : (S, v_chunk) i32 -- blocked-local index of the vertex at
                each compressed window position (entry permute)
    state_out : (S, v_chunk) i32 -- compressed window position of each
                blocked-local vertex (exit permute)
    ws_marker : (Ws,) i8 zeros -- static super-window width via shape
    av_p      : (V,) window-layout vertex areas (f32)
    jacobi_p  : (T+1, V) window-layout Jacobi diagonal (f32)
    s_p       : (V,) window-layout av^{-1/2} (f32)
    defl_q_p  : (V, k) window-layout Ritz vectors (f32)
    real_p    : (V,) window-layout real-vertex mask (f32)

    TV, W, G, Ws, Nw, Wb are implied by array shapes (static under jit).
    """

    a_tiles: jnp.ndarray
    starts: jnp.ndarray
    sub_off: jnp.ndarray
    exp_codes: jnp.ndarray
    win_codes: jnp.ndarray
    state_in: jnp.ndarray
    state_out: jnp.ndarray
    ws_marker: jnp.ndarray
    av_p: jnp.ndarray
    jacobi_p: jnp.ndarray
    s_p: jnp.ndarray
    defl_q_p: jnp.ndarray
    real_p: jnp.ndarray


def _rcm_positions(rows_csr, n_local, n_ext):
    """Extended-RCM rank of every extended node of one shard.

    rows_csr : (n_local, n_ext) CSR of the shard's rows over its extended
    column space (locals first). The ordering graph is the symmetrized
    pattern; isolated nodes (padding slots) sort to the end.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    pat = sp.csr_matrix(
        (np.ones_like(rows_csr.data), rows_csr.indices, rows_csr.indptr),
        shape=rows_csr.shape,
    )
    if n_ext == n_local:  # no remote columns: square symmetric pattern
        ext = pat
    else:
        ext = sp.bmat(
            [
                [pat[:, :n_local], pat[:, n_local:]],
                [pat[:, n_local:].T, None],
            ],
            format="csr",
        )
    order = np.asarray(reverse_cuthill_mckee(ext, symmetric_mode=True))
    pos = np.empty(n_ext, dtype=np.int64)
    pos[order] = np.arange(n_ext)
    return pos


def build_sharded_window(
    lap_space,
    v_chunk: int,
    n_parts: int,
    av: np.ndarray,
    jacobi: np.ndarray,
    s_vec: np.ndarray,
    defl_q: np.ndarray,
    real: np.ndarray,
    tile_rows: int | None = None,
    group: int | None = None,
    max_bytes: int = 2 << 30,
):
    """Host-side: per-shard extended-RCM ordering, window tiles, exchange
    codes, and window-layout preconditioner copies.

    lap_space : scipy sparse (V, V) cotan Laplacian in BLOCKED order
        (`parallel.partition.blocked_layout`): shard s owns rows
        [s*v_chunk, (s+1)*v_chunk).
    av / jacobi / s_vec / defl_q / real : preconditioner arrays in blocked
        order (host NumPy), copied out in window layout.

    Returns a ShardedWindow (host NumPy leaves; caller casts/ships) plus a
    meta dict, or None when the tile storage would exceed max_bytes or the
    VMEM budget rejects every candidate.
    """
    import scipy.sparse as sp

    csr = sp.csr_matrix(lap_space).tocsr()
    csr.sum_duplicates()
    v_pad = csr.shape[0]
    assert v_pad == n_parts * v_chunk, (v_pad, n_parts, v_chunk)
    owner = np.arange(v_pad) // v_chunk

    # ---- per-shard extended sets + export lists -----------------------------
    remote_by_shard = []  # global indices of remote columns, sorted
    for s_id in range(n_parts):
        lo, hi = s_id * v_chunk, (s_id + 1) * v_chunk
        cols = csr.indices[csr.indptr[lo] : csr.indptr[hi]]
        remote = np.unique(cols[(cols < lo) | (cols >= hi)])
        remote_by_shard.append(remote)
    # Export list of block o = every remote reference owned by o.
    export_by_block = [
        np.unique(
            np.concatenate(
                [r[owner[r] == o] for r in remote_by_shard]
                + [np.empty(0, dtype=np.int64)]
            )
        )
        for o in range(n_parts)
    ]
    wb = max(-(-max((e.size for e in export_by_block), default=1) // 8) * 8, 8)

    # ---- per-shard extended-RCM ordering ------------------------------------
    pos_by_shard = []  # extended-node -> window rank
    rows_by_shard = []  # shard rows over extended columns (locals first)
    nw = 8
    for s_id in range(n_parts):
        lo = s_id * v_chunk
        remote = remote_by_shard[s_id]
        n_ext = v_chunk + remote.size
        # Map global columns to extended positions (locals, then remotes).
        col_map = {}
        rows = csr[lo : lo + v_chunk]
        cols = rows.indices.copy()
        local_sel = (cols >= lo) & (cols < lo + v_chunk)
        cols[local_sel] -= lo
        if remote.size:
            ridx = np.searchsorted(remote, rows.indices)
            cols[~local_sel] = v_chunk + ridx[~local_sel]
        ext_rows = sp.csr_matrix(
            (rows.data, cols, rows.indptr), shape=(v_chunk, n_ext)
        )
        pos = _rcm_positions(ext_rows, v_chunk, n_ext)
        pos_by_shard.append(pos)
        rows_by_shard.append(ext_rows)
        nw = max(nw, n_ext)
    nw = -(-nw // 8) * 8

    # ---- choose (TV, G) over the summed per-shard traffic -------------------
    tv_grid = (256, 512) if tile_rows is None else (int(tile_rows),)
    g_grid = (1, 2, 4) if group is None else (int(group),)
    n_tiles = -(-v_chunk // min(tv_grid))  # provisional for sizing only

    def shard_tile_geometry(s_id, tv):
        """(width, starts, order) of one shard's tiles in window coords."""
        pos = pos_by_shard[s_id]
        ext_rows = rows_by_shard[s_id]
        # Compressed order: local vertices sorted by window rank.
        local_rank = pos[:v_chunk]
        order = np.argsort(local_rank, kind="stable")  # compressed -> local
        crank = np.empty(v_chunk, dtype=np.int64)
        crank[order] = np.arange(v_chunk)
        n_tiles = -(-v_chunk // tv)
        indptr, indices = ext_rows.indptr, ext_rows.indices
        nnz_rows = np.repeat(np.arange(v_chunk), np.diff(indptr))
        tile_of = crank[nnz_rows] // tv
        wpos = pos[indices]
        lo = np.full(n_tiles, np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(n_tiles, -1, dtype=np.int64)
        np.minimum.at(lo, tile_of, wpos)
        np.maximum.at(hi, tile_of, wpos)
        filled = hi >= 0
        width = int((hi[filled] - lo[filled] + 1).max(initial=8))
        starts = np.where(filled, lo, -1)
        for t in range(1, n_tiles):
            if starts[t] < 0:
                starts[t] = starts[t - 1]
        for t in range(n_tiles - 2, -1, -1):
            if starts[t] < 0:
                starts[t] = starts[t + 1]
        return -(-max(width, 8) // 8) * 8, np.maximum(starts, 0), order

    best = None
    geom_cache = {}
    for tv in tv_grid:
        geo = [shard_tile_geometry(s_id, tv) for s_id in range(n_parts)]
        geom_cache[tv] = geo
        w = max(g[0] for g in geo)
        n_tiles = -(-v_chunk // tv)
        for g in g_grid:
            n_pad = -(-n_tiles // g) * g
            ws = 8
            traffic = 0
            for _, st, _ in geo:
                stp = np.concatenate([st, np.repeat(st[-1:], n_pad - n_tiles)])
                sup = stp.reshape(-1, g)
                s_sup = sup.min(axis=1)
                ws = max(ws, int((sup - s_sup[:, None] + w).max()))
                traffic += v_chunk * w * 4 + s_sup.shape[0] * ws * _LANES * 4
            ws = -(-ws // 8) * 8
            vmem = (2 * ws * _LANES + 2 * g * tv * (w + _LANES)) * 4
            if vmem > _VMEM_BUDGET:
                continue
            if best is None or traffic < best[0]:
                best = (traffic, tv, w, g, ws)
    if best is None:
        return None
    traffic, tv, width, g, ws = best
    n_tiles = -(-v_chunk // tv)
    n_pad = -(-n_tiles // g) * g
    if n_parts * n_pad * tv * width * 4 > max_bytes:
        return None

    # ---- assemble the device arrays -----------------------------------------
    a_tiles = np.zeros((n_parts, n_pad * tv, width), dtype=np.float32)
    starts_all = np.zeros((n_parts, n_pad // g), dtype=np.int32)
    sub_off_all = np.zeros((n_parts, n_pad), dtype=np.int32)
    exp_codes = np.zeros((n_parts, wb), dtype=np.int32)
    win_codes = np.full((n_parts, nw), v_chunk + n_parts * wb, dtype=np.int32)
    state_in = np.zeros((n_parts, v_chunk), dtype=np.int32)
    state_out = np.zeros((n_parts, v_chunk), dtype=np.int32)

    for s_id in range(n_parts):
        lo = s_id * v_chunk
        pos = pos_by_shard[s_id]
        ext_rows = rows_by_shard[s_id]
        remote = remote_by_shard[s_id]
        w_s, st, order = geom_cache[tv][s_id]
        state_in[s_id] = order
        crank = np.empty(v_chunk, dtype=np.int64)
        crank[order] = np.arange(v_chunk)
        state_out[s_id] = crank

        # Export codes: compressed positions of this shard's exported
        # boundary vertices (export lists hold global indices).
        exp = export_by_block[s_id] - lo
        exp_codes[s_id, : exp.size] = crank[exp]
        if exp.size:  # padding repeats a valid position
            exp_codes[s_id, exp.size :] = crank[exp[0]]

        # Window codes: for each window rank, where its value lives in
        # [x_local (compressed) ++ all-gathered export buffer ++ zero].
        n_ext = v_chunk + remote.size
        nodes = np.empty(n_ext, dtype=np.int64)
        nodes[pos] = np.arange(n_ext)  # window rank -> extended node
        is_local = nodes < v_chunk
        codes = np.empty(n_ext, dtype=np.int64)
        codes[is_local] = crank[nodes[is_local]]
        if remote.size:
            rg = remote[nodes[~is_local] - v_chunk]  # global remote index
            own = owner[rg]
            rank_in_owner = np.empty(rg.size, dtype=np.int64)
            for o in np.unique(own):
                m = own == o
                rank_in_owner[m] = np.searchsorted(
                    export_by_block[o], rg[m]
                )
            codes[~is_local] = v_chunk + own * wb + rank_in_owner
        win_codes[s_id, :n_ext] = codes

        # Tiles: rows in compressed order, columns at window positions.
        stp = np.concatenate([st, np.repeat(st[-1:], n_pad - n_tiles)])
        sup_start = stp.reshape(-1, g).min(axis=1)
        starts_all[s_id] = sup_start
        sub_off_all[s_id] = stp - np.repeat(sup_start, g)
        indptr, indices, data = ext_rows.indptr, ext_rows.indices, ext_rows.data
        nnz_rows = np.repeat(np.arange(v_chunk), np.diff(indptr))
        cr = crank[nnz_rows]  # tile-row index of each nonzero
        a_tiles[s_id, cr, pos[indices] - stp[cr // tv]] = data

    # Window-layout preconditioner copies (global blocked index per slot).
    perm_global = (
        np.arange(n_parts)[:, None] * v_chunk + state_in
    ).reshape(-1)
    meta = {
        "tile_rows": int(tv),
        "width": int(width),
        "group": int(g),
        "super_width": int(ws),
        "window": int(nw),
        "export_width": int(wb),
        "traffic_bytes": int(traffic),
    }
    sw = ShardedWindow(
        a_tiles=a_tiles,
        starts=starts_all,
        sub_off=sub_off_all,
        exp_codes=exp_codes,
        win_codes=win_codes,
        state_in=state_in,
        state_out=state_out,
        ws_marker=np.zeros((ws,), dtype=np.int8),
        av_p=np.asarray(av, dtype=np.float32)[perm_global],
        jacobi_p=np.asarray(jacobi, dtype=np.float32)[:, perm_global],
        s_p=np.asarray(s_vec, dtype=np.float32)[perm_global],
        defl_q_p=np.asarray(defl_q, dtype=np.float32)[perm_global],
        real_p=np.asarray(real, dtype=np.float32)[perm_global],
    )
    logging.getLogger(__name__).info(
        "sharded window SpMV: S=%d TV=%d W=%d G=%d Ws=%d Nw=%d Wb=%d "
        "traffic=%d B/matvec",
        n_parts, tv, width, g, ws, nw, wb, traffic,
    )
    return sw, meta


def _shard_abstract_mesh(mesh_axes):
    from dots_socp_tpu.parallel.halo import abstract_mesh

    return abstract_mesh(mesh_axes)


def sharded_window_matvec(
    sw: ShardedWindow, mesh_axes, x, interpret: bool | None = None
):
    """P_blocked L P_blocked^T @ x for x (lead..., V) in WINDOW layout
    (shard-local compressed window order). Returns y in the same layout.

    One shard_map region: boundary export gather, one tiled all-gather,
    window gather, then the two-level Pallas window kernel on the shard's
    tiles. lead axes (the T+1 time modes, <= 128) ride the kernel lanes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_parts, v_chunk = sw.state_in.shape
    wb = sw.exp_codes.shape[1]
    nw = sw.win_codes.shape[1]
    ws = sw.ws_marker.shape[0]
    rows, w = sw.a_tiles.shape[1:]
    n_super = sw.starts.shape[1]
    n_tiles = sw.sub_off.shape[1]
    tv = rows // n_tiles
    g = n_tiles // n_super
    lead = x.shape[:-1]
    lanes = int(np.prod(lead)) if lead else 1
    if lanes > _LANES:
        raise ValueError(
            f"sharded_window_matvec supports at most {_LANES} leading "
            f"modes, got {lanes}"
        )

    def _shard(xs, exp_codes, win_codes, a_tiles, starts, sub_off):
        # xs: (lead..., v_chunk) this shard's window-ordered state.
        exp = xs[..., exp_codes[0]]  # (lead..., Wb)
        buf = jax.lax.all_gather(exp, "space", axis=-1, tiled=True)
        ext = jnp.concatenate(
            [xs, buf, jnp.zeros(lead + (1,), xs.dtype)], axis=-1
        )
        xw = ext[..., win_codes[0]]  # (lead..., Nw)

        # Vertex-major, zero-padded lanes, Ws guard rows (same layout as
        # the single-device kernel's x buffer).
        xt = jnp.zeros((nw + ws, _LANES), jnp.float32)
        xt = xt.at[:nw, :lanes].set(
            jnp.moveaxis(xw, -1, 0).reshape(nw, lanes).astype(jnp.float32)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_super,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((g * tv, w), lambda i, s1, s2: (i, 0)),
            ],
            out_specs=pl.BlockSpec((g * tv, lanes), lambda i, s1, s2: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, ws, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        with jax.enable_x64(False):
            out = pl.pallas_call(
                _window_kernel(w, ws, tv, g, lanes),
                out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(starts[0], sub_off[0], xt, a_tiles[0])
        out = out[:v_chunk].astype(xs.dtype)
        if not lead:
            return out[:, 0]
        return jnp.moveaxis(out.reshape((v_chunk,) + lead), 0, -1)

    lead_spec = (None,) * len(lead)
    return jax.shard_map(
        _shard,
        mesh=_shard_abstract_mesh(mesh_axes),
        in_specs=(
            P(*lead_spec, "space"),
            P("space", None),
            P("space", None),
            P("space", None, None),
            P("space", None),
            P("space", None),
        ),
        out_specs=P(*lead_spec, "space"),
        # pallas_call output avals carry no varying-mesh-axes annotation;
        # the region's only collective is the explicit all_gather above.
        check_vma=False,
    )(x, sw.exp_codes, sw.win_codes, sw.a_tiles, sw.starts, sw.sub_off)


def window_permute(sw: ShardedWindow, mesh_axes, x, inverse=False):
    """Shard-local permute between blocked and window layouts for
    (lead..., V) arrays: forward = blocked -> window (gather by state_in),
    inverse = window -> blocked (gather by state_out)."""
    codes = sw.state_out if inverse else sw.state_in
    lead_spec = (None,) * (x.ndim - 1)

    def _shard(xs, c):
        return xs[..., c[0]]

    return jax.shard_map(
        _shard,
        mesh=_shard_abstract_mesh(mesh_axes),
        in_specs=(P(*lead_spec, "space"), P("space", None)),
        out_specs=P(*lead_spec, "space"),
    )(x, codes)
