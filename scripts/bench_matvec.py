"""Race the Laplacian SpMV implementations on the real chip.

Variants (all computing L_space @ x for x of shape (T+1, V)):
  graddiv : matrix-free div(area * grad(x)) through triangle incidence
  ell     : padded-ELL row-layout neighbor gather
  banded  : RCM block-banded dense tiles, shifted batched MXU matmuls
  pallas  : RCM-windowed dense tiles, Pallas kernel (manual double-buffered
            x-window DMA + one MXU matmul per tile); timed in permuted
            space, as the CG loop runs it (permutes amortize per solve)

Each variant is timed as a chain of `iters` dependent applications inside
one dispatch (normalized each step so magnitudes stay bounded), differenced
against a 1-application dispatch so round-trip overhead cancels.

Usage: python scripts/bench_matvec.py --n_space 200 --n_time 31 --iters 50
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Self-bootstrap: runnable without PYTHONPATH (round-3 lost a chip run to a
# bare `python scripts/...` invocation failing the package import).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_space", type=int, default=200)
    ap.add_argument("--n_time", type=int, default=31)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--tile_rows", type=int, default=0,
                    help="window tile rows; 0 = auto (ordering x TV swept "
                    "by the traffic model in build_window_tiles)")
    ap.add_argument("--skip", default="", help="comma-separated variants")
    args = ap.parse_args()

    import jax

    if args.dtype == "float64":
        # Must precede building the operator pytrees: f64 leaves created
        # while x64 is off silently downcast to f32 (build_cg_operator
        # enables the flag itself, but by then build_surface_ops has
        # already materialized its leaves).
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from dots_socp_tpu.geometry.generators import generate_plane_mesh
    from dots_socp_tpu.geometry.surface import (
        cotan_laplacian,
        triangle_quantities,
    )
    from dots_socp_tpu.ops.laplacian import (
        banded_matvec,
        build_banded_operator,
        build_cg_operator,
        ell_matvec,
    )
    from dots_socp_tpu.ops.mesh_ops import build_surface_ops, laplacian_apply

    dtype = jnp.float32 if args.dtype == "float32" else jnp.float64
    vertices, triangles, _ = generate_plane_mesh(n=args.n_space)
    v = vertices.shape[0]
    _, angles, _ = triangle_quantities(vertices, triangles)
    lap = cotan_laplacian(triangles, angles, v)

    with jax.default_device(jax.devices("cpu")[0]):
        ops = build_surface_ops(vertices, triangles, dtype=dtype)
        cg_op = build_cg_operator(
            args.n_time, 1.0 / args.n_time, np.asarray(ops.av), lap,
            dtype=dtype, deflation_k=0, use_pallas_spmv=True,
            spmv_tile_rows=args.tile_rows or None,
            coords=vertices,
            refine=dtype == jnp.float64,
        )
        band = build_banded_operator(lap, dtype=dtype)
    dev = jax.devices()[0]
    ops, cg_op, band = jax.device_put((ops, cg_op, band), dev)
    wop = cg_op.window

    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(
            rng.standard_normal((args.n_time + 1, v)), dtype=dtype
        ),
        dev,
    )

    from dots_socp_tpu.ops.pallas_spmv import window_matvec

    # (operator pytree, matvec, pre-permute, post-permute): pre/post run
    # once per chain, the way cg_solve amortizes the RCM permutation over a
    # whole inner solve. The operator is a jit ARGUMENT, not a closure
    # capture -- captured arrays get serialized into the program body and
    # blow the remote-compile request size limit at large V (HTTP 413).
    identity = lambda o, y: y
    variants = {
        "graddiv": (ops, laplacian_apply, identity, identity),
        "ell": (cg_op, lambda o, y: ell_matvec(o, y), identity, identity),
        "banded": (band, lambda o, y: banded_matvec(o, y), identity, identity),
        "pallas": (
            wop,
            lambda o, y: window_matvec(o, y),
            lambda o, y: y[:, o.perm],
            lambda o, y: y[:, o.iperm],
        ),
    }
    for name in filter(None, args.skip.split(",")):
        variants.pop(name, None)

    results = {}
    for name, (op_tree, mv, pre, post) in variants.items():
        @jax.jit
        def chain(o, y, n, mv=mv, pre=pre, post=post):
            def body(_, y):
                y = mv(o, y)
                return y * jax.lax.rsqrt(jnp.sum(y * y) + 1e-30)
            return post(o, jax.lax.fori_loop(0, n, body, pre(o, y)))

        # compile + warm both trip counts
        np.asarray(chain(op_tree, x0, np.int32(1)))[0, 0]
        np.asarray(chain(op_tree, x0, np.int32(1 + args.iters)))[0, 0]

        t0 = time.perf_counter()
        np.asarray(chain(op_tree, x0, np.int32(1)))[0, 0]
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chain(op_tree, x0, np.int32(1 + args.iters)))[0, 0]
        t_long = time.perf_counter() - t0
        us = (t_long - t_short) / args.iters * 1e6
        results[name] = round(us, 1)

    # Cross-check the variants agree numerically (one application each).
    outs = [
        np.asarray(
            jax.jit(lambda o, y, f=mv, p=pre, q=post: q(o, f(o, p(o, y))))(
                op_tree, x0
            )
        )
        for op_tree, mv, pre, post in variants.values()
    ]
    agree = max(
        (float(np.max(np.abs(outs[0] - o))) for o in outs[1:]), default=0.0
    )
    print(
        json.dumps(
            {
                "metric": f"Laplacian SpMV time (V={v}, T={args.n_time}, "
                f"{args.dtype})",
                "unit": "us/matvec",
                "variants": results,
                "max_disagreement": agree,
                "band_diagonals": int(band.blocks.shape[0]) if band else None,
                "window_width": int(wop.a_tiles.shape[1]) if wop else None,
                "tile_rows": (
                    int(wop.a_tiles.shape[0] // wop.sub_off.shape[0])
                    if wop
                    else args.tile_rows
                ),
                "group": (
                    int(wop.sub_off.shape[0] // wop.starts.shape[0])
                    if wop
                    else None
                ),
                "super_width": int(wop.ws_marker.shape[0]) if wop else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
