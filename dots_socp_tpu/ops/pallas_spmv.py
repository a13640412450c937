"""Pallas TPU kernel for the cotan-Laplacian SpMV: windowed dense matmul.

This is the hot op of the large-mesh CG path (the T+1 shifted spatial
solves that replace the reference's cached SuperLU back-substitutions,
`utils/laplacian_inverse_socp.py:34-59`). Round-2 measurement put the
padded-ELL gather form at ~5% of streaming bandwidth: TPU row gathers
move one (T+1)-lane row per request, so V*D ~ 370k scattered HBM reads
per matvec dominate. Mosaic has no usable global gather (probed: only
equal-shape gathers *within one 8x128 tile* lower), so the kernel trades
gathers for streaming:

  1. Reverse-Cuthill-McKee orders the vertices so each row's neighbors
     fall in a narrow index window (bandwidth ~ sqrt(V) on surface meshes).
  2. Rows are grouped into tiles of TV rows; each tile's neighbor columns
     span at most W consecutive permuted indices (W = TV + 2*bandwidth-ish,
     measured per mesh).
  3. The tile's W x (T+1) slice of x is DMA'd into VMEM at an *element*
     granularity start (double-buffered against the matmul), the tile's
     dense (TV, W) window of L streams through the normal pipeline, and
     one MXU matmul produces the TV output rows for all T+1 time modes.

Everything the kernel touches streams contiguously from HBM: traffic is
V*W*4 bytes of matrix tiles per matvec (vs ~V*(T+1)*D*4 of *scattered*
reads for ELL), and the MXU does the contraction. The x vector must be
pre-permuted into RCM order; `cg_solve` permutes once per solve (entry +
exit), not per matvec, and carries permuted preconditioner arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class WindowOperator(NamedTuple):
    """Windowed dense-tile form of the (V, V) cotan Laplacian, two-level.

    Tiles of TV rows are grouped G at a time into super-tiles that share
    ONE x-window DMA (consecutive tiles' windows overlap by ~W - TV, so
    per-tile DMAs re-stream mostly the same rows); each tile's matmul
    reads its (W)-slice at a dynamic sublane offset inside the shared
    VMEM window.

    a_tiles   : (n_tiles * TV, W) f32 -- dense window rows of P L P^T; row
                t*TV + r holds permuted row t*TV+r over columns
                [starts[t // G] + sub_off[t], ...+ W)
    starts    : (n_super,) i32 -- shared x-window start per super-tile
    sub_off   : (n_tiles,) i32 -- tile window offset inside its super-window
    ws_marker : (Ws,) i8 zeros -- carries the STATIC super-window width in
                its shape (operator arrays are traced jit arguments, so a
                plain int field would not survive; a shape does)
    perm      : (V,) i32 -- new position -> old index (x_p = x[perm])
    iperm     : (V,) i32 -- inverse permutation
    av_p      : (V,) permuted vertex areas (for the shifted-system term)
    jacobi_p  : (T+1, V) permuted Jacobi preconditioner diagonal
    s_p       : (V,) permuted av^{-1/2}
    defl_q_p  : (V, k) row-permuted Ritz vectors

    TV, W, G, Ws are implied by array shapes (static under jit).
    """

    a_tiles: jnp.ndarray
    starts: jnp.ndarray
    sub_off: jnp.ndarray
    ws_marker: jnp.ndarray
    perm: jnp.ndarray
    iperm: jnp.ndarray
    av_p: jnp.ndarray
    jacobi_p: jnp.ndarray
    s_p: jnp.ndarray
    defl_q_p: jnp.ndarray


def _tile_width(p_csr, tv):
    """Padded max window width over tv-row tiles of a permuted CSR matrix."""
    v = p_csr.shape[0]
    n_tiles = -(-v // tv)
    width = 8  # never zero; multiple-of-8 rows DMA cleanly
    for t in range(n_tiles):
        lo, hi = t * tv, min((t + 1) * tv, v)
        cols = p_csr.indices[p_csr.indptr[lo] : p_csr.indptr[hi]]
        if cols.size:
            width = max(width, int(cols.max()) - int(cols.min()) + 1)
    return -(-width // 8) * 8


def build_window_tiles(
    lap_space,
    tile_rows: int | None = None,
    max_bytes: int = 2 << 30,
    coords=None,
    group: int | None = None,
):
    """Host-side: order the Laplacian for narrow windows, densify tiles.

    Candidate orderings (bandwidth reducers):
      natural : identity -- mesh generators often emit near-banded orders
                (the hexagonal `plane` generator is row-major: measured
                window 840 at V=97k/TV=256 vs RCM's 1218)
      rcm     : reverse Cuthill-McKee (robust on arbitrary .off meshes)
      spatial : sort along the dominant PCA axis of `coords` (surface
                meshes: cut width ~sqrt(V) regardless of input order)

    Per-matvec HBM traffic of a candidate is V*W*4 matrix bytes plus
    n_super*Ws*LANES*4 x-window bytes, where G tiles share one Ws-wide
    x-window DMA (Ws ~ W + (G-1)*TV; consecutive windows overlap by
    ~W - TV, so grouping removes most x re-streaming). The cheapest
    (ordering, TV, G) wins. Pass int `tile_rows` / `group` to pin them
    (the race harness sweeps); None tries TV {256, 512} x G {1, 2, 4}.

    Returns (a_tiles, starts, sub_off, ws, perm, iperm, meta) with meta =
    dict of the winning ordering/TV/W/G/Ws/traffic, or None when the dense
    windows would exceed `max_bytes` (pathological orderings).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    csr = sp.csr_matrix(lap_space)
    csr.sum_duplicates()
    v = csr.shape[0]

    candidates = {"natural": np.arange(v, dtype=np.int64)}
    try:
        candidates["rcm"] = np.asarray(
            reverse_cuthill_mckee(csr, symmetric_mode=True), dtype=np.int64
        )
    except Exception:
        pass
    if coords is not None and len(coords) == v:
        c = np.asarray(coords, dtype=np.float64)
        c = c - c.mean(axis=0)
        _, u = np.linalg.eigh(c.T @ c)
        candidates["spatial"] = np.argsort(
            c @ u[:, -1], kind="stable"
        ).astype(np.int64)

    tv_grid = (256, 512) if tile_rows is None else (int(tile_rows),)
    g_grid = (1, 2, 4) if group is None else (int(group),)

    def tile_starts(p, tv):
        n_tiles = -(-v // tv)
        st = np.full(n_tiles, -1, dtype=np.int64)
        for t in range(n_tiles):
            lo, hi = t * tv, min((t + 1) * tv, v)
            cols = p.indices[p.indptr[lo] : p.indptr[hi]]
            if cols.size:
                st[t] = int(cols.min())
        # Structurally empty tiles inherit a neighboring tile's start: a 0
        # start grouped (G>1) with tiles whose starts are near V would
        # inflate the shared super-window Ws to ~V. Forward fill, then
        # backward fill any leading empties; all-empty degenerates to 0.
        for t in range(1, n_tiles):
            if st[t] < 0:
                st[t] = st[t - 1]
        for t in range(n_tiles - 2, -1, -1):
            if st[t] < 0:
                st[t] = st[t + 1]
        return np.maximum(st, 0)

    best = None
    for name, cand in candidates.items():
        p = csr[cand][:, cand].tocsr()
        for tv in tv_grid:
            w = _tile_width(p, tv)
            st = tile_starts(p, tv)
            n_tiles = st.shape[0]
            for g in g_grid:
                n_pad = -(-n_tiles // g) * g
                stp = np.concatenate(
                    [st, np.repeat(st[-1:], n_pad - n_tiles)]
                )
                sup = stp.reshape(-1, g)
                s_sup = sup.min(axis=1)
                ws = int((sup - s_sup[:, None] + w).max())
                ws = -(-ws // 8) * 8
                # Kernel VMEM: the double-buffered x window (2*Ws*128 f32)
                # plus the pipelined a-tile and output blocks. Candidates
                # that exceed the budget would fail to compile (pinned
                # tile_rows/group sweeps can construct them).
                vmem = (2 * ws * _LANES + 2 * g * tv * (w + _LANES)) * 4
                if vmem > _VMEM_BUDGET:
                    continue
                traffic = v * w * 4 + s_sup.shape[0] * ws * _LANES * 4
                if best is None or traffic < best[0]:
                    best = (traffic, name, cand, p, tv, w, g, st)
    if best is None:
        return None
    traffic, name, perm, p, tv, width, g, st = best

    n_tiles = st.shape[0]
    n_pad = -(-n_tiles // g) * g
    if n_pad * tv * width * 4 > max_bytes:
        return None

    st = np.concatenate([st, np.repeat(st[-1:], n_pad - n_tiles)])
    starts = st.reshape(-1, g).min(axis=1).astype(np.int32)  # (n_super,)
    sub_off = (st - np.repeat(starts.astype(np.int64), g)).astype(np.int32)
    ws = int((st + width - np.repeat(starts.astype(np.int64), g)).max())
    ws = -(-ws // 8) * 8

    a_tiles = np.zeros((n_pad * tv, width), dtype=np.float32)
    rows = np.repeat(np.arange(v), np.diff(p.indptr))
    a_tiles[rows, p.indices - st[rows // tv]] = p.data.astype(np.float32)

    iperm = np.empty(v, dtype=np.int32)
    iperm[perm] = np.arange(v, dtype=np.int32)
    meta = {
        "ordering": name,
        "tile_rows": int(tv),
        "width": int(width),
        "group": int(g),
        "super_width": int(ws),
        "traffic_bytes": int(traffic),
    }
    return a_tiles, starts, sub_off, ws, perm.astype(np.int32), iperm, meta


def _window_kernel(w_static, ws_static, tv, g, lanes):
    """Kernel factory closing over the static widths / grouping / lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(starts_ref, sub_off_ref, x_hbm, a_ref, o_ref, xwin_ref, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
        nxt = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

        def window_dma(sup, sl):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(starts_ref[sup], ws_static), :],
                xwin_ref.at[sl],
                sems.at[sl],
            )

        # Warm-up: super-tile 0's window; steady state: prefetch super-tile
        # i+1's window while i's matmuls run (double buffer).
        @pl.when(i == 0)
        def _():
            window_dma(0, slot).start()

        @pl.when(i + 1 < n)
        def _():
            window_dma(i + 1, nxt).start()

        window_dma(i, slot).wait()
        # One matmul per member tile, each reading its W-slice at a dynamic
        # sublane offset inside the shared super-window. Only the first
        # `lanes` of the 128-lane DMA buffer hold data; the static slice
        # keeps the MXU contraction at the real mode count.
        # HIGHEST: plain f32 inputs go through the MXU as single-pass bf16
        # (measured ~7e-4 relative error -- poisons CG below rtol ~1e-3);
        # the multi-pass split recovers f32 accuracy (~3e-7 measured).
        for k in range(g):
            off = sub_off_ref[i * g + k]
            o_ref[k * tv : (k + 1) * tv, :] = jnp.dot(
                a_ref[k * tv : (k + 1) * tv, :],
                xwin_ref[slot, pl.ds(off, w_static), :lanes],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    return kernel


#: Lane width of the kernel's x/output buffers. Mosaic only compiles the
#: manual window DMA for 128-lane destinations (probed: (W, 32) VMEM DMA
#: targets and lane-sliced DMA sources both crash the compiler), so the
#: T+1 time modes are zero-padded up to one full lane register.
_LANES = 128

#: VMEM bytes a window-tile candidate may claim (x double buffer + pipelined
#: a-tile/output blocks); v5 cores have ~16 MiB, leave headroom for Mosaic.
_VMEM_BUDGET = 12 << 20


def window_matvec(op: WindowOperator, x, interpret: bool | None = None):
    """P L P^T @ x for x (..., V) already in PERMUTED (RCM) order.

    Leading axes (the T+1 time modes, <= 128) ride the matmul lanes.
    interpret=None auto-selects the Pallas interpreter off-TPU (tests on
    the CPU backend).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    v = op.perm.shape[0]
    n_super = op.starts.shape[0]
    n_tiles = op.sub_off.shape[0]
    g = n_tiles // n_super
    ws = op.ws_marker.shape[0]
    rows, w = op.a_tiles.shape
    tv = rows // n_tiles
    lead = x.shape[:-1]
    lanes = int(np.prod(lead)) if lead else 1
    if lanes > _LANES:
        raise ValueError(
            f"window_matvec supports at most {_LANES} leading modes, got {lanes}"
        )

    # One fused transpose+pad: vertex-major rows, zero lanes beyond the T+1
    # modes, Ws bounds rows so every super-window slice stays in range.
    xt = jnp.zeros((v + ws, _LANES), jnp.float32)
    xt = xt.at[:v, :lanes].set(
        jnp.moveaxis(x, -1, 0).reshape(v, lanes).astype(jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((g * tv, w), lambda i, s1, s2: (i, 0)),
        ],
        out_specs=pl.BlockSpec((g * tv, lanes), lambda i, s1, s2: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ws, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # Trace the kernel with x64 promotion OFF: under jax_enable_x64 (the
    # mixed-precision refinement enables it globally) Mosaic sees 64-bit
    # index/iota types it cannot legalize ("failed to legalize operation
    # 'func.func'"). Every operand here is explicitly f32/i32, so a local
    # 32-bit trace is semantics-preserving.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _window_kernel(w, ws, tv, g, lanes),
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(op.starts, op.sub_off, xt, op.a_tiles)
    out = out[:v].astype(x.dtype)
    if not lead:
        return out[:, 0]
    return jnp.moveaxis(out.reshape((v,) + lead), 0, -1)
