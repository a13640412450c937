"""Space-sharded Pallas window SpMV (`ops.sharded_window`): the two-level
window kernel per shard under shard_map, with one boundary-sized all-gather
per matvec. Runs in Pallas interpret mode on the virtual 8-device CPU mesh
(conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def blocked_problem():
    """Blocked 4-shard plane problem + its padded Laplacian and a forced
    sharded-window CG operator (auto only builds it on the TPU backend)."""
    from dots_socp_tpu.data.loader import load_example
    from dots_socp_tpu.geometry.normalize import normalize_geometry
    from dots_socp_tpu.geometry.surface import (
        cotan_laplacian,
        triangle_quantities,
    )
    from dots_socp_tpu.ops.laplacian import build_cg_operator
    from dots_socp_tpu.solver.problem import build_problem

    _, geometry, _ = load_example(
        example_name="plane", kwargs_generating_mesh={"n": 40}
    )
    geometry, _ = normalize_geometry(geometry)
    n_time = 6
    config, data, extras = build_problem(
        n_time, geometry, dtype="float32", laplacian_mode="cg",
        cg_deflation_k=16, cg_rtol=1e-7, phi_refine=True,
        space_partitions=4, mesh_axes=(2, 4),
    )
    vtx = np.asarray(geometry["vertices"])
    tri = np.asarray(geometry["triangles"])
    _, angles, _ = triangle_quantities(vtx, tri)
    lap_p = cotan_laplacian(
        extras["vertex_slot"][tri], angles, config.n_vertices
    )
    op = build_cg_operator(
        n_time, config.stepsize_time, np.asarray(data.ops.av, np.float64),
        lap_p, deflation_k=16, rtol=1e-7, use_pallas_spmv=True,
        shard_parts=4, refine=True,
    )
    assert op.swindow is not None
    data = data._replace(cg_op=op)
    return n_time, geometry, config, data, extras, lap_p


def test_sharded_window_matvec_matches_dense(blocked_problem):
    from dots_socp_tpu.ops.sharded_window import (
        sharded_window_matvec,
        window_permute,
    )
    from dots_socp_tpu.parallel.mesh import make_mesh

    n_time, _, config, data, extras, lap_p = blocked_problem
    sw = data.cg_op.swindow
    mesh = make_mesh(8, time_axis=2)
    rng = np.random.default_rng(2)
    xb = rng.standard_normal((n_time + 1, config.n_vertices)).astype(
        np.float32
    )
    xd = jax.device_put(jnp.asarray(xb), NamedSharding(mesh, P(None, "space")))

    @jax.jit
    def mv(x, sw):
        xw = window_permute(sw, (2, 4), x)
        yw = sharded_window_matvec(sw, (2, 4), xw)
        return window_permute(sw, (2, 4), yw, inverse=True)

    y = np.asarray(mv(xd, sw))
    y_ref = xb @ lap_p.toarray().T
    rel = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert rel < 1e-5, rel

    # Round-trip permute is exact.
    xw = window_permute(sw, (2, 4), xd)
    x2 = np.asarray(window_permute(sw, (2, 4), xw, inverse=True))
    np.testing.assert_array_equal(x2, xb)


def test_sharded_window_cg_refined_matches_unsharded(blocked_problem):
    """Refined CG with the per-shard window kernel must reproduce the
    single-device refined solve (the multi-chip production path keeps both
    the kernel and the f64 accuracy story)."""
    from dots_socp_tpu.ops.laplacian import cg_solve
    from dots_socp_tpu.parallel.mesh import make_mesh, shard_problem
    from dots_socp_tpu.solver.problem import build_problem

    n_time, geometry, config, data, extras, _ = blocked_problem
    rng = np.random.default_rng(0)
    v_real = np.asarray(geometry["vertices"]).shape[0]
    rhs_real = rng.standard_normal((n_time + 1, v_real))
    rhs_real -= rhs_real.mean(axis=1, keepdims=True)

    cfg_u, data_u, ex_u = build_problem(
        n_time, geometry, dtype="float32", laplacian_mode="cg",
        cg_deflation_k=16, cg_rtol=1e-7, phi_refine=True,
    )
    rhs_u = np.zeros((n_time + 1, cfg_u.n_vertices), np.float32)
    rhs_u[:, ex_u["vertex_slot"]] = rhs_real
    x_u = np.asarray(
        cg_solve(data_u.ops, data_u.cg_op, jnp.asarray(rhs_u), max_iters=2000)
    )[:, ex_u["vertex_slot"]]

    rhs_s = np.zeros((n_time + 1, config.n_vertices), np.float32)
    rhs_s[:, extras["vertex_slot"]] = rhs_real
    data_sd = shard_problem(make_mesh(8, time_axis=2), data)
    assert data_sd.cg_op.swindow is not None
    x_s = np.asarray(
        cg_solve(
            data_sd.ops, data_sd.cg_op, jnp.asarray(rhs_s), max_iters=2000,
            halo=data_sd.halo, mesh_axes=(2, 4), ops_hi=data_sd.ops_hi,
        )
    )[:, extras["vertex_slot"]]

    rel = np.max(np.abs(x_u - x_s)) / np.max(np.abs(x_u))
    assert rel < 1e-5, rel


def test_sharded_window_collective_is_boundary_sized(blocked_problem):
    """The kernel matvec's only collective is the boundary export
    all-gather: audit the compiled HLO for total collective bytes and
    require them to be a small fraction of the full operand."""
    import re

    from dots_socp_tpu.ops.sharded_window import sharded_window_matvec
    from dots_socp_tpu.parallel.mesh import make_mesh

    n_time, _, config, data, extras, _ = blocked_problem
    sw = data.cg_op.swindow
    mesh = make_mesh(8, time_axis=2)
    x = jax.device_put(
        jnp.zeros((n_time + 1, config.n_vertices), jnp.float32),
        NamedSharding(mesh, P(None, "space")),
    )
    txt = (
        jax.jit(lambda x: sharded_window_matvec(sw, (2, 4), x))
        .lower(x)
        .compile()
        .as_text()
    )
    width = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "pred": 1, "s64": 8}
    total = 0
    for kind in ("all-gather", "all-reduce", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        for m in re.finditer(r"(\w+)\[([\d,]*)\][^=]*\b" + kind + r"\(", txt):
            n = 1
            for d in m.group(2).split(","):
                if d:
                    n *= int(d)
            total += n * width.get(m.group(1), 8)
    operand = (n_time + 1) * config.n_vertices * 4
    assert total < 0.5 * operand, (total, operand)
