"""Double-float (two-float32) true-residual matvec for the refinement path.

TPU v5 has no native f64 ALU: XLA emulates every f64 gather/multiply/add in
software, and the round-5 profile measured the refinement's f64 machinery at
~500 ms per phi solve at V=195k -- 80% of the whole iALM iteration (the f32
inner CG it wraps costs ~74 ms). The reference never faces this: its exact
solves are LAPACK f64 on a CPU (`utils/laplacian_inverse_socp.py:34-59`).

What refinement actually needs from the true residual r = b - A x is NOT
f64 arithmetic -- it needs the product-rounding and accumulation-
cancellation errors of the matvec to sit well below eps32 * ||A|| ||x||
(the f32 floor is eps32 * cond(L) ~ 2e-3 relative at V >= 46k; the target
is ~1e-6). Classic error-free transformations on the fast f32 VPU deliver
exactly that:

  * the f64 operands are split once into (hi, lo) f32 pairs
    (a = hi + lo exactly, |lo| <= eps32 |a|);
  * each hi*hi product is computed EXACTLY as p + e via Dekker's TwoProd
    (no FMA dependency -- 12-bit operand splits, all plain f32 VPU ops);
  * the D-neighbor accumulation runs as a compensated (TwoSum) chain, so
    cancellation across neighbors never loses the low-order bits;
  * first-order cross terms hi*lo are added into the compensation stream;
    the lo*lo term (~eps32^2) is dropped.

Result error ~ D * eps32^2 * sum|w||x| (~1e-13 relative, measured), i.e.
f64-grade for refinement, with only f32 gathers/multiplies on the hot
(V, D, T+1) data -- the emulated-f64 work shrinks to one elementwise pass
over the (T+1, V) output.

XLA note: this relies on XLA not reassociating floating-point arithmetic,
which is its documented default (no fast-math); the parity test pins it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_f64(a64):
    """Exact split a64 = hi + lo with hi, lo float32."""
    hi = a64.astype(jnp.float32)
    lo = (a64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _two_prod(a, b):
    """Dekker TwoProd: exact a*b = p + e for float32 a, b (no FMA)."""
    p = a * b
    c = jnp.float32(4097.0)  # 2^12 + 1 operand splitter
    ab = a * c
    a_hi = ab - (ab - a)
    a_lo = a - a_hi
    bb = b * c
    b_hi = bb - (bb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _two_sum(a, b):
    """Knuth TwoSum: exact a + b = s + e for float32 a, b."""
    s = a + b
    bv = s - a
    e = (a - (s - bv)) + (b - bv)
    return s, e


def ell_matvec_df64(op, x64):
    """L_space @ x for f64 x (..., V), double-float f32 evaluation.

    Uses the padded-ELL form (`op.ell_idx`, f64 weights `op.ell_w_hi`);
    returns float64 with ~eps32^2-grade accuracy (see module docstring).
    The per-neighbor loop is unrolled over the static ELL width D.
    """
    f64 = jnp.float64
    w_hi, w_lo = split_f64(op.ell_w_hi)  # (V, D)
    xt = jnp.moveaxis(x64, -1, 0)  # (V, lead...)
    xh, xl = split_f64(xt)
    g_h = xh[op.ell_idx]  # (V, D, lead...)
    g_l = xl[op.ell_idx]

    d = op.ell_idx.shape[1]
    shape = g_h.shape[:1] + g_h.shape[2:]
    s = jnp.zeros(shape, jnp.float32)
    comp = jnp.zeros(shape, jnp.float32)
    for k in range(d):
        wh = w_hi[:, k]
        wl = w_lo[:, k]
        wh = wh.reshape(wh.shape + (1,) * (len(shape) - 1))
        wl = wl.reshape(wh.shape)
        p, e = _two_prod(wh, g_h[:, k])
        s, e1 = _two_sum(s, p)
        comp = comp + (e1 + e) + (wh * g_l[:, k] + wl * g_h[:, k])
    out = s.astype(f64) + comp.astype(f64)
    return jnp.moveaxis(out, 0, -1)


def small_matmul_df64(u64, x64):
    """(A, B) @ (B, ...) in double-float f32: exact TwoProd products with a
    compensated TwoSum accumulation over the SMALL contraction dim B (the
    time-eigentransform, B = T+1 <= 128; unrolled at trace time).

    Same motivation as `ell_matvec_df64`: the refinement's f64
    time-eigenbasis transforms cost ~21 ms/apply emulated at V=195k; a
    plain f32 MXU pass would floor the transformed RHS's representation
    error at eps32 * ||b||, which refinement then faithfully converges to
    -- the wrong answer. Double-float keeps eps32^2-grade accuracy on VPU
    f32 ops."""
    f64 = jnp.float64
    uh, ul = split_f64(u64)  # (A, B)
    xh, xl = split_f64(x64)  # (B, ...)
    a_dim, b_dim = u64.shape
    lead = (1,) * (x64.ndim - 1)
    shape = (a_dim,) + x64.shape[1:]
    s = jnp.zeros(shape, jnp.float32)
    comp = jnp.zeros(shape, jnp.float32)
    for b in range(b_dim):
        w_h = uh[:, b].reshape((a_dim,) + lead)
        w_l = ul[:, b].reshape((a_dim,) + lead)
        p, e = _two_prod(w_h, xh[b][None])
        s, e1 = _two_sum(s, p)
        comp = comp + (e1 + e) + (w_h * xl[b][None] + w_l * xh[b][None])
    return s.astype(f64) + comp.astype(f64)


def shifted_matvec_df64(op, x64):
    """-(L_space + shift * diag(av)) x, the refinement true-residual
    operator, with the Laplacian part in double-float f32 and the
    (diagonal) shift term in plain f64 -- elementwise f64 over (T+1, V) is
    one cheap emulated pass; it is the gathered (V, D, T+1) work that
    emulation makes expensive."""
    lap = ell_matvec_df64(op, x64)
    return -(lap + op.shifts_hi[:, None] * op.av_hi[None, :] * x64)
