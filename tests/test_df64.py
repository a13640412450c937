"""Double-float (two-f32) true-residual matvec (`ops.df64`): must deliver
f64-grade accuracy from pure f32 arithmetic (the TPU refinement path; on
TPU f64 is software-emulated and was measured at 80% of the iALM iteration
at V=195k)."""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def refine_op():
    from dots_socp_tpu.data.loader import load_example
    from dots_socp_tpu.geometry.normalize import normalize_geometry
    from dots_socp_tpu.geometry.surface import (
        cotan_laplacian,
        triangle_quantities,
        vertex_areas,
    )
    from dots_socp_tpu.ops.laplacian import build_cg_operator

    _, geometry, _ = load_example(
        example_name="plane", kwargs_generating_mesh={"n": 60}
    )
    geometry, _ = normalize_geometry(geometry)
    vtx = np.asarray(geometry["vertices"])
    tri = np.asarray(geometry["triangles"])
    v = vtx.shape[0]
    area_f, angles, _ = triangle_quantities(vtx, tri)
    av = vertex_areas(tri, area_f, v) / 3.0
    lap = cotan_laplacian(tri, angles, v)
    op = build_cg_operator(7, 1.0 / 7.0, av, lap, deflation_k=8, refine=True)
    return op, vtx


def test_df64_matches_native_f64(refine_op):
    from dots_socp_tpu.ops.df64 import ell_matvec_df64, shifted_matvec_df64
    from dots_socp_tpu.ops.laplacian import ell_matvec

    op, vtx = refine_op
    v = op.s.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, v)))

    ref = ell_matvec(op, x, weights=op.ell_w_hi)  # native f64 (CPU tests)
    got = ell_matvec_df64(op, x)
    assert got.dtype == jnp.float64
    rel = np.max(np.abs(np.asarray(got - ref))) / np.max(np.abs(np.asarray(ref)))
    assert rel < 1e-12, rel

    ref_s = -(
        ell_matvec(op, x, weights=op.ell_w_hi)
        + op.shifts_hi[:, None] * op.av_hi[None, :] * x
    )
    got_s = shifted_matvec_df64(op, x)
    rel_s = np.max(np.abs(np.asarray(got_s - ref_s))) / np.max(
        np.abs(np.asarray(ref_s))
    )
    assert rel_s < 1e-12, rel_s


def test_df64_beats_f32_floor_in_cancellation_regime(refine_op):
    """The reason df64 exists: for smooth x (the converged-solve regime,
    where L x is tiny against ||L|| ||x||), plain f32 floors the absolute
    error at ~eps32 * |w||x| while df64 must sit ~6 orders below it."""
    from dots_socp_tpu.ops.df64 import ell_matvec_df64
    from dots_socp_tpu.ops.laplacian import ell_matvec

    op, vtx = refine_op
    smooth = np.sin(2 * np.pi * vtx[:, 0]) * np.cos(2 * np.pi * vtx[:, 1])
    x = jnp.asarray(np.outer(np.ones(8), smooth))
    ref = ell_matvec(op, x, weights=op.ell_w_hi)
    scale = float(np.max(np.abs(op.ell_w_hi))) * float(np.max(np.abs(smooth)))

    err_df = np.max(np.abs(np.asarray(ell_matvec_df64(op, x) - ref))) / scale
    err_f32 = (
        np.max(
            np.abs(
                np.asarray(
                    ell_matvec(op, x.astype(jnp.float32)).astype(jnp.float64)
                    - ref
                )
            )
        )
        / scale
    )
    assert err_df < 1e-11, err_df
    assert err_f32 > 1e-8  # the floor df64 is built to beat
    assert err_df < err_f32 * 1e-3


def test_small_matmul_df64_matches_native_f64(refine_op):
    from dots_socp_tpu.ops.df64 import small_matmul_df64

    op, _ = refine_op
    v = op.s.shape[0]
    rng = np.random.default_rng(3)
    u = jnp.asarray(np.linalg.qr(rng.standard_normal((8, 8)))[0])
    x = jnp.asarray(rng.standard_normal((8, v)))
    ref = u @ x
    got = small_matmul_df64(u, x)
    assert got.dtype == jnp.float64
    rel = np.max(np.abs(np.asarray(got - ref))) / np.max(np.abs(np.asarray(ref)))
    assert rel < 1e-12, rel
