"""Subprocess worker for the 2-process `jax.distributed` test.

Each process owns ONE virtual CPU device (XLA_FLAGS set by the parent),
calls `jax.distributed.initialize` through the same `initialize_distributed`
entry the CLI uses, and runs the sharded solve on a ("time"=2, "space"=1)
mesh spanning both processes. Process 0 writes the recovered solution for
the parent test to compare against a single-process run.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from dots_socp_tpu.parallel import initialize_distributed, make_solver_mesh

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == args.num_processes, jax.device_count()

    from dots_socp_tpu.data.loader import load_example
    from dots_socp_tpu.geometry.normalize import normalize_geometry
    from dots_socp_tpu.solver import solver_socp

    _, geometry, _ = load_example(
        example_name="plane", kwargs_generating_mesh={"n": 12}
    )
    geometry, _ = normalize_geometry(geometry)
    mesh = make_solver_mesh((2, 1))
    solution, _ = solver_socp(
        6,
        geometry,
        nit=25,
        tol=1e-12,
        time_limit=300,
        precision="float64",
        mesh=mesh,
    )
    if args.process_id == 0:
        np.savez(args.out, mu=solution["mu"], E=solution["E"])
    print("WORKER_OK", args.process_id, flush=True)


if __name__ == "__main__":
    main()
