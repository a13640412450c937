"""Benchmark: iALM iteration throughput on the standard config, real TPU.

Runs the flagship problem (plane example at replication scale: ntime=31,
comparable vertex count to the reference benchmark meshes) and measures
fused-iteration throughput, then prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference implementation's measured
per-iteration wall time on this host's CPU (same problem, same iteration
count), i.e. value / reference_iterations_per_sec. The reference runs via
the dependency shims in tests/reference_shims (numexpr -> numpy eval).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

N_SPACE = 64          # plane mesh: ~4.8k vertices, ~9.3k triangles
N_TIME = 31           # replication protocol (Makefile --ntime=31)
BENCH_ITERS = 5000    # measured fused iterations (one device dispatch --
                      # large enough that the dispatch round trip through
                      # the device link is amortized away and the number
                      # reflects sustained device throughput)
REF_ITERS = 12        # reference iterations to time (CPU, slow)


def build(n_space=N_SPACE, n_time=N_TIME, dtype="float32"):
    import logging

    logging.disable(logging.CRITICAL)
    import __graft_entry__ as graft

    return graft._build(n_space, n_time, dtype, pad_multiple=8)


def bench_tpu():
    import jax

    from dots_socp_tpu.solver.kkt import compute_kkt
    from dots_socp_tpu.solver.step import run_chunk

    config, data, state = build()

    def fetch(s):
        # Force completion with a real device->host transfer: on the remote
        # relay platform block_until_ready can return before the dispatch
        # has executed, which would void wall-clock timing entirely. The
        # transfer is a SCALAR (device-side index first): the relay's data
        # path has been observed degraded to ~0.4 MB/s, where fetching the
        # full f64 phi (12 MB at n200) would take ~30 s per fetch.
        return float(s.phi[0, 0])

    # Warm up / compile.
    state = run_chunk(config, data, state, np.int32(2))
    fetch(state)
    _ = np.asarray(compute_kkt(config, data, state))

    # Difference runs of 2 and 2+N fused iterations: the dispatch round trip,
    # fetch, and any fixed overhead cancel, leaving per-iteration device time.
    t0 = time.perf_counter()
    state = run_chunk(config, data, state, np.int32(2))
    fetch(state)
    t_short = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = run_chunk(config, data, state, np.int32(2 + BENCH_ITERS))
    fetch(state)
    raw_elapsed = time.perf_counter() - t0
    elapsed = max(raw_elapsed - t_short, 1e-9)

    kkt = np.asarray(compute_kkt(config, data, state))
    assert np.all(np.isfinite(kkt[:, 0])), f"bench run diverged: {kkt}"
    return BENCH_ITERS / elapsed, BENCH_ITERS / raw_elapsed, config


LARGE_N_SPACE = 200   # plane n200: V=46,431 -- the contested CG-path size
LARGE_ITERS = 200     # fixed fused-iteration window (VERDICT r3 protocol)
MATVEC_ITERS = 50


def bench_large():
    """Sustained it/s of the production CG+refine path at V=46k, plus the
    window-SpMV kernel us/matvec -- the path where perf is contested
    (round-3 verdict: the tiny-flagship bench made it invisible)."""
    import jax
    import jax.numpy as jnp

    from dots_socp_tpu.solver.step import run_chunk

    config, data, state = build(LARGE_N_SPACE, N_TIME)
    assert config.laplacian_mode == "cg", config.laplacian_mode

    def fetch(s):
        return float(s.phi[0, 0])  # scalar transfer (see bench_tpu.fetch)

    state = run_chunk(config, data, state, np.int32(2))
    fetch(state)

    t0 = time.perf_counter()
    state = run_chunk(config, data, state, np.int32(2))
    fetch(state)
    t_short = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = run_chunk(config, data, state, np.int32(2 + LARGE_ITERS))
    fetch(state)
    elapsed = max(time.perf_counter() - t0 - t_short, 1e-9)
    result = {
        "iters_per_sec": round(LARGE_ITERS / elapsed, 3),
        "n_vertices": config.n_vertices_real,
        "phi_refine": bool(config.phi_refine),
    }

    wop = data.cg_op.window if data.cg_op is not None else None
    if wop is not None:
        from dots_socp_tpu.ops.pallas_spmv import window_matvec

        v = wop.perm.shape[0]
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(
            rng.standard_normal((N_TIME + 1, v)), dtype=jnp.float32
        )
        x0 = jax.device_put(x0, jax.devices()[0])

        @jax.jit
        def chain(o, y, n):
            def body(_, y):
                y = window_matvec(o, y)
                return y * jax.lax.rsqrt(jnp.sum(y * y) + 1e-30)

            return jax.lax.fori_loop(0, n, body, y)

        float(chain(wop, x0, np.int32(1))[0, 0])
        float(chain(wop, x0, np.int32(1 + MATVEC_ITERS))[0, 0])

        def best_of(n_apps, repeats=3):
            # Min over repeats: the remote relay adds multi-ms jitter per
            # dispatch, and a single inflated short-run measurement once
            # produced a nonsense 35 us/matvec by over-subtracting.
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(chain(wop, x0, np.int32(n_apps))[0, 0])
                best = min(best, time.perf_counter() - t0)
            return best

        t_one = best_of(1)
        t_many = best_of(1 + MATVEC_ITERS)
        result["window_matvec_us"] = round(
            max(t_many - t_one, 0.0) / MATVEC_ITERS * 1e6, 1
        )
        result["window_width"] = int(wop.a_tiles.shape[1])
    return result


def bench_reference_cpu():
    """Time the reference solver's per-iteration cost on the same problem.

    Measured at BOTH of the reference's threading configs and reported as
    the best (fair-baseline) rate:
      * is_multi_threads=True -- the documented default: 2-way step overlap
        (Laplacian solve || SOC projection on Python threads,
        `socp/solver_socp.py:674-696`) + numexpr on min(4, cores//2)
        threads (`:131`);
      * is_multi_threads=False -- no overlap, numexpr on min(8, cores).
    The numexpr shim (tests/reference_shims) honors set_num_threads with
    real chunked thread parallelism, so both configs exercise the CPU the
    way real numexpr would.

    Returns {"iters_per_sec": best, "per_config": {...}} or None.
    """
    shim_dir = Path(__file__).parent / "tests" / "reference_shims"
    ref_dir = Path("/root/reference")
    if not ref_dir.exists():
        return None
    sys.path.insert(0, str(shim_dir))
    sys.path.insert(0, str(ref_dir))
    try:
        import logging

        logging.disable(logging.CRITICAL)
        from dot_surface_socp.socp.solver_socp import solver_socp as ref_solver

        from dots_socp_tpu.data.loader import load_example
        from dots_socp_tpu.geometry.normalize import normalize_geometry

        _, geometry, _ = load_example(
            example_name="plane", kwargs_generating_mesh={"n": N_SPACE}
        )
        geometry, _ = normalize_geometry(geometry)

        # Symmetric methodology with bench_tpu (which subtracts the fixed
        # per-dispatch latency): difference two runs at nit=2 and
        # nit=2+REF_ITERS so the reference's one-time setup (factorizations,
        # weight assembly) cancels and only the per-iteration loop remains.
        def run(nit, multi_threads):
            t0 = time.perf_counter()
            ref_solver(
                N_TIME,
                geometry,
                nit=nit,
                tol=1e-14,
                time_limit=600,
                is_multi_threads=multi_threads,
            )
            return time.perf_counter() - t0

        per_config = {}
        for multi_threads in (True, False):
            t_short = run(2, multi_threads)
            t_long = run(2 + REF_ITERS, multi_threads)
            rate = REF_ITERS / max(t_long - t_short, 1e-9)
            per_config[f"is_multi_threads={multi_threads}"] = round(rate, 4)
        return {
            "iters_per_sec": max(per_config.values()),
            "per_config": per_config,
        }
    except Exception:
        return None


def main():
    cache_dir = "/tmp/jax_cache_dots_socp_bench"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

    # Watchdog: the remote relay's data path has been observed to stall
    # outright (readbacks hang indefinitely, 2026-08-21). Emit a JSON error
    # line instead of hanging the driver. Override via BENCH_WATCHDOG_SECS.
    import signal

    budget = int(os.environ.get("BENCH_WATCHDOG_SECS", "2400"))

    def _watchdog(signum, frame):
        print(
            json.dumps(
                {
                    "metric": f"iALM iterations/s (plane n{N_SPACE}, T={N_TIME}, f32)",
                    "value": None,
                    "unit": "iter/s",
                    "vs_baseline": None,
                    "error": (
                        f"bench watchdog fired after {budget}s: the TPU "
                        "relay data path is stalled (see scripts/link_probe.py)"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(2)

    if hasattr(signal, "SIGALRM") and budget > 0:
        signal.signal(signal.SIGALRM, _watchdog)
        signal.alarm(budget)

    iters_per_sec, raw_iters_per_sec, config = bench_tpu()
    try:
        large = bench_large()
    except Exception as exc:  # the headline metric must still print
        large = {"error": f"{type(exc).__name__}: {exc}"}

    ref_file = Path(__file__).parent / ".bench_reference_cpu.json"
    ref_info = None
    if ref_file.exists():
        ref_info = json.loads(ref_file.read_text())
        if "per_config" not in ref_info:
            ref_info = None  # stale single-config cache; re-measure fairly
    if ref_info is None:
        ref_info = bench_reference_cpu()
        if ref_info is not None:
            ref_file.write_text(json.dumps(ref_info))
    ref_iters_per_sec = ref_info["iters_per_sec"] if ref_info else None

    vs_baseline = (
        iters_per_sec / ref_iters_per_sec if ref_iters_per_sec else float("nan")
    )
    print(
        json.dumps(
            {
                "metric": f"iALM iterations/s (plane n{N_SPACE}: "
                f"V={config.n_vertices_real}, F={config.n_triangles_real}, "
                f"T={N_TIME}, f32)",
                "value": round(iters_per_sec, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs_baseline, 3)
                if vs_baseline == vs_baseline
                else None,
                # Methodology: symmetric differencing. Both sides time two
                # runs (2 vs 2+N iterations) and difference them, so setup,
                # dispatch round trips and fetch overhead cancel on the TPU
                # exactly as the reference's setup does on CPU.
                # raw = wall-clock of the long run including the round trip.
                "raw_iters_per_sec": round(raw_iters_per_sec, 3),
                # Fair baseline: best of the reference's two threading
                # configs with a thread-honoring numexpr shim (see
                # bench_reference_cpu docstring).
                "reference_iters_per_sec": round(ref_iters_per_sec, 4)
                if ref_iters_per_sec
                else None,
                "reference_per_config": ref_info.get("per_config")
                if ref_info
                else None,
                # The contested large-mesh CG+refine path (plane n200,
                # V=46k): sustained it/s over a fixed 200-iteration window
                # + the Pallas window-SpMV kernel us/matvec. The reference
                # sustains 0.111 it/s on this problem (1162 iterations /
                # 10,509 s, artifacts/round3/reference_v46k.stdout).
                "large_mesh": large,
            }
        )
    )


if __name__ == "__main__":
    main()
