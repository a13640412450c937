"""Decompose the phi-solve FIXED cost at large V (round-5 profile finding:
at V=195k the iteration is 620 ms of which the inner CG explains only
~74 ms -- ~500 ms is per-solve fixed overhead inside cg_solve).

Times, as differenced dependent chains on the chip:
  matvec_hi     the f64 true-residual ELL matvec (refinement, per pass)
  matvec_df     the double-float (two-f32) replacement (if available)
  u64_transform the f64 time-eigenbasis transforms (per solve)
  deflate64     the f64 consistency projection + threshold reductions
  inner_f32     one f32 window-kernel matvec (reference point)

Usage: python scripts/refine_cost_bench.py --n_space 410 --ntime 31
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_space", type=int, default=410)
    ap.add_argument("--ntime", type=int, default=31)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as graft
    from dots_socp_tpu.ops.laplacian import ell_matvec
    from dots_socp_tpu.ops.pallas_spmv import window_matvec

    config, data, state = graft._build(
        args.n_space, args.ntime, "float32", pad_multiple=8
    )
    op = data.cg_op
    assert op is not None and op.ell_w_hi is not None, "needs the refine op"
    f64 = jnp.float64
    rhs = jnp.ones((args.ntime + 1, config.n_vertices), jnp.float32)
    x64 = rhs.astype(f64) * 0.5

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*xs))
            best = min(best, time.perf_counter() - t0)
        per = best / args.chain * 1e3
        print(f"  {name:13s}: {per:8.3f} ms/apply", flush=True)
        return per

    def chain(body):
        def run(x):
            def step(_, y):
                y = body(y)
                return y * jax.lax.rsqrt(
                    jnp.sum((y * y).astype(f64)).astype(y.dtype) + 1e-30
                )

            return jax.lax.fori_loop(0, args.chain, step, x)

        return run

    results = {}

    def mv_hi(x):
        lap = ell_matvec(op, x, weights=op.ell_w_hi)
        return -(lap + op.shifts_hi[:, None] * op.av_hi[None, :] * x)

    results["matvec_hi_f64_ms"] = timed("matvec_hi", chain(mv_hi), x64)

    try:
        from dots_socp_tpu.ops.df64 import ell_matvec_df64

        def mv_df(x):
            return ell_matvec_df64(op, x)

        results["matvec_df_ms"] = timed("matvec_df", chain(mv_df), x64)
    except ImportError:
        pass

    ut = op.u_time_hi

    def u64(x):
        return ut @ (ut.T @ x)

    results["u64_transform_ms"] = timed("u64_transform", chain(u64), x64)

    null64 = op.null_row.astype(f64)
    real64 = op.real_mask.astype(f64)
    n_real = real64.sum()

    def defl(x):
        mean = (x * real64[None, :]).sum(axis=1, keepdims=True) / n_real
        x = x - null64[:, None] * mean
        return jnp.where(null64[:, None] > 0, x * real64[None, :], x)

    results["deflate64_ms"] = timed("deflate64", chain(defl), x64)

    wop = op.window
    if wop is not None:
        xp = rhs[:, wop.perm]
        results["window_f32_ms"] = timed(
            "inner_f32", chain(lambda y: window_matvec(wop, y)), xp
        )

    def ell32(x):
        return ell_matvec(op, x)

    results["ell_f32_ms"] = timed("ell_f32", chain(ell32), rhs)

    results["n_vertices"] = config.n_vertices_real
    print(json.dumps({"metric": "refine fixed-cost decomposition", **results}))


if __name__ == "__main__":
    main()
