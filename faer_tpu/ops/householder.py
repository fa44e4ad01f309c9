"""Householder reflectors + compact-WY block application.

Reference parity: ``faer/src/linalg/householder.rs`` —
``make_householder_in_place`` (``:117``), T-factor maintenance
(``upgrade_householder_factor`` ``:132``), and the
``apply_block_householder_[sequence_][transpose_]on_the_{left,right}`` family
(``:275-862``). This is the single most load-bearing utility of the dense
stack: QR, bidiagonalization, tridiagonalization, Hessenberg, SVD and EVD
back-transforms all route through it (SURVEY §2.3).

Conventions (LAPACK-compatible, same as faer):
  * ``H = I − τ v vᴴ`` with ``v[0] = 1``; ``Hᴴ x = β e₁`` with β real-signed
    (for real dtypes H is symmetric so ``H x = β e₁`` too).
  * a block of b reflectors is ``Q = H₀ H₁ ⋯ H_{b−1} = I − V T Vᴴ`` with V the
    unit-lower-trapezoidal panel and T upper triangular.

TPU-native design: T is formed *in closed form* — ``T⁻¹ = diag(1/τ) +
strict_upper(VᴴV)`` — one GEMM plus a small matmul-only TRTRI, instead of
faer's per-column recurrence. Block application is two GEMMs and a small
triangular matmul: pure MXU work.
"""
from __future__ import annotations

import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.ops.matmul import matmul
from faer_tpu.ops.triangular import invert_upper_triangular


def make_householder(x):
    """Reflector for a column vector ``x`` (shape (m,)).

    Returns ``(v, tau, beta)`` with ``v[0] = 1`` such that
    ``(I − τ v vᴴ)ᴴ x = β e₁`` (β real). Zero tail → τ = 0 (identity), β = x[0].
    faer ``make_householder_in_place`` (``householder.rs:117``).
    """
    m = x.shape[0]
    dtype = x.dtype
    rdt = dtypes.real_dtype_of(dtype)
    alpha = x[0]
    tail = x[1:]
    tail_sq = jnp.sum(jnp.abs(tail).astype(rdt) ** 2) if m > 1 else jnp.zeros((), rdt)
    alpha_re = jnp.real(alpha).astype(rdt)
    norm = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
    sign = jnp.where(alpha_re >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
    beta_r = -sign * norm
    is_id = (tail_sq == 0) & (jnp.imag(jnp.asarray(alpha)) == 0 if dtypes.is_complex(dtype) else True)
    # guard the identity case against 0/0
    beta = beta_r.astype(dtype)
    s = alpha - beta
    safe_s = jnp.where(is_id, jnp.ones((), dtype), s)
    v_tail = tail / safe_s
    tau = (beta - alpha) / jnp.where(is_id, jnp.ones((), dtype), beta)
    tau = jnp.where(is_id, jnp.zeros((), dtype), tau)
    beta = jnp.where(is_id, alpha, beta)
    v = jnp.concatenate([jnp.ones((1,), dtype), jnp.where(is_id, jnp.zeros_like(v_tail), v_tail)])
    return v, tau, beta


def form_block_t(v, tau):
    """Compact-WY T factor: ``T = (diag(1/τ) + strict_upper(VᴴV))⁻¹``.

    ``v``: (m, b) unit-lower-trapezoidal panel; ``tau``: (b,).
    Replaces faer's incremental ``upgrade_householder_factor``
    (``householder.rs:132``) with one GEMM + matmul-only TRTRI.
    τ = 0 columns (identity reflectors) are handled by substituting a unit
    pivot — the corresponding T row/col contributes nothing because v = e_i.
    """
    b = v.shape[1]
    dtype = v.dtype
    gram = matmul(None, jnp.conj(v).T, v)
    tau_safe = jnp.where(tau == 0, jnp.ones_like(tau), tau)
    tinv = jnp.triu(gram, k=1) + jnp.diag(1.0 / tau_safe)
    t = invert_upper_triangular(tinv, base=tinv.shape[0])
    # zero out rows/cols of identity reflectors
    live = (tau != 0).astype(dtype)
    t = t * live[None, :] * live[:, None]
    del b
    return t


def apply_block_on_left(v, t, b_mat, *, adjoint: bool):
    """``Q B`` or ``Qᴴ B`` with ``Q = I − V T Vᴴ``.

    faer ``apply_block_householder_on_the_left_in_place_with_conj``
    (``householder.rs:275``).
    """
    w = matmul(None, jnp.conj(v).T, b_mat)           # (b, k)
    tw = matmul(None, jnp.conj(t).T if adjoint else t, w)
    return b_mat - matmul(None, v, tw)


def apply_block_on_right(v, t, b_mat, *, adjoint: bool):
    """``B Q`` or ``B Qᴴ``."""
    w = matmul(None, b_mat, v)                        # (k, b)
    tw = matmul(None, w, jnp.conj(t).T if adjoint else t)
    return b_mat - matmul(None, tw, jnp.conj(v).T)


def _extract_panel_v(h_mat, j0: int, b: int):
    """Unit-lower-trapezoidal V for the panel of columns [j0, j0+b)."""
    m = h_mat.shape[0]
    vp = h_mat[j0:, j0:j0 + b]
    mask = jnp.tril(jnp.ones((m - j0, b), dtype=dtypes.real_dtype_of(h_mat.dtype)), k=-1)
    return vp * mask.astype(h_mat.dtype) + jnp.eye(m - j0, b, dtype=h_mat.dtype)


def apply_sequence_on_left(h_mat, t_stack, b_mat, *, adjoint: bool, block: int):
    """Apply ``Q`` / ``Qᴴ`` for ``Q = Π_j (I − V_j T_j V_jᴴ)`` to ``B``.

    ``h_mat``: (m, n) factored matrix whose strict lower trapezoid stores the
    reflector tails; ``t_stack``: list/array of per-panel T factors.
    faer ``apply_block_householder_sequence_on_the_left`` (``householder.rs:724``).
    """
    n = min(h_mat.shape)
    panels = list(range(0, n, block))
    order = panels if adjoint else list(reversed(panels))
    out = b_mat
    for j0 in order:
        bw = min(block, n - j0)
        vj = _extract_panel_v(h_mat, j0, bw)
        tj = t_stack[j0 // block][:bw, :bw]
        tail = apply_block_on_left(vj, tj, out[j0:], adjoint=adjoint)
        out = jnp.concatenate([out[:j0], tail], axis=0) if j0 > 0 else tail
    return out


def apply_sequence_on_right(h_mat, t_stack, b_mat, *, adjoint: bool, block: int):
    """``B Q`` / ``B Qᴴ`` (faer ``householder.rs:826``)."""
    n = min(h_mat.shape)
    panels = list(range(0, n, block))
    order = list(reversed(panels)) if adjoint else panels
    out = b_mat
    for j0 in order:
        bw = min(block, n - j0)
        vj = _extract_panel_v(h_mat, j0, bw)
        tj = t_stack[j0 // block][:bw, :bw]
        right = apply_block_on_right(vj, tj, out[:, j0:], adjoint=adjoint)
        out = jnp.concatenate([out[:, :j0], right], axis=1) if j0 > 0 else right
    return out
