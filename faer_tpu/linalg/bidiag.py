"""Householder bidiagonalization (m ≥ n): A = Q_l B Q_rᴴ with B real bidiagonal.

Reference parity: ``faer/src/linalg/svd/bidiag.rs`` — ``bidiag_in_place``
(``:47``). Real diagonal/superdiagonal even for complex input (real-β
reflectors on both sides, LAPACK ``gebrd`` semantics).

TPU-native design: one masked ``fori_loop``; each step applies one left
reflector (column) and one right reflector (row) as full-size rank-1 updates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.ops.matmul import matmul


def _reflector_from_masked(colvec, at, rows, dtype, rdt):
    """Reflector zeroing colvec below position ``at`` (support rows ≥ at).

    Returns (v, tau, beta) with v[at] = 1, support rows ≥ at.
    """
    on = rows == at
    below = rows > at
    alpha = jnp.sum(jnp.where(on, colvec, jnp.zeros_like(colvec)))
    tail_sq = jnp.sum(jnp.where(below, jnp.abs(colvec).astype(rdt) ** 2, 0))
    norm = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
    sign = jnp.where(jnp.real(alpha) >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
    beta = -sign * norm
    if dtypes.is_complex(dtype):
        is_id = (tail_sq == 0) & (jnp.imag(alpha) == 0)
    else:
        is_id = tail_sq == 0
    betac = beta.astype(dtype)
    s = alpha - betac
    safe_s = jnp.where(is_id, jnp.ones((), dtype), s)
    safe_b = jnp.where(is_id, jnp.ones((), dtype), betac)
    tau = jnp.where(is_id, jnp.zeros((), dtype), (betac - alpha) / safe_b)
    beta_out = jnp.where(is_id, jnp.real(alpha).astype(rdt), beta)
    v = jnp.where(below, colvec / safe_s, jnp.zeros_like(colvec))
    v = jnp.where(is_id, jnp.zeros_like(v), v)
    v = v + jnp.where(on, jnp.ones_like(v), jnp.zeros_like(v))
    return v, tau, beta_out


@jax.jit
def bidiag_in_place(a):
    """Bidiagonalize ``a`` (m ≥ n required): returns
    ``(d, e, vl, taul, vr, taur)`` — real diagonal d (n,), real superdiagonal
    e (n-1,), left reflectors vl (m×n, v_j in column j with support rows ≥ j),
    right reflectors vr (n×(n-1) layout as columns with support rows ≥ j+1).

    ``A = Q_l B Q_rᴴ`` where ``Q_l = H^l_0 ⋯ H^l_{n-1}``,
    ``Q_r = H^r_0 ⋯ H^r_{n-2}`` (the last right reflector is a pure phase for
    complex inputs, identity for real).
    """
    m, n = a.shape
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    vl0 = jnp.zeros((m, n), dtype)
    taul0 = jnp.zeros((n,), dtype)
    vr0 = jnp.zeros((n, max(n - 1, 1)), dtype)
    taur0 = jnp.zeros((max(n - 1, 1),), dtype)
    d0 = jnp.zeros((n,), rdt)
    e0 = jnp.zeros((max(n - 1, 1),), rdt)

    def body(j, state):
        a, vl, taul, vr, taur, d, e = state
        # left reflector on column j (zero below the diagonal)
        v, tau, beta = _reflector_from_masked(a[:, j], j, rows_m, dtype, rdt)
        w = matmul(None, jnp.conj(v)[None, :], a)[0]
        a = a - jnp.conj(tau) * v[:, None] * w[None, :]  # A ← Hᴴ A
        vl = vl.at[:, j].set(v)
        taul = taul.at[j].set(tau)
        d = d.at[j].set(beta)
        # right reflector on row j: zero right of the superdiagonal AND make
        # the superdiagonal entry real (zgebrd semantics — exists for every
        # j < n-1, a pure phase rotation when only one element remains)
        has_right = j < n - 1
        rowv = jnp.conj(a[j, :])  # column version of the row
        vr_j, taur_j, ebeta = _reflector_from_masked(rowv, j + 1, rows_n, dtype, rdt)
        taur_j = jnp.where(has_right, taur_j, jnp.zeros((), dtype))
        # A ← A H  (H = I − τ v vᴴ from the row's conjugate)
        u = matmul(None, a, vr_j[:, None])[:, 0]
        a = a - taur_j * u[:, None] * jnp.conj(vr_j)[None, :]
        if n > 1:
            jj = jnp.minimum(j, n - 2)
            vr = vr.at[:, jj].set(jnp.where(has_right, vr_j, vr[:, jj]))
            taur = taur.at[jj].set(jnp.where(has_right, taur_j, taur[jj]))
            e = e.at[jj].set(jnp.where(has_right, ebeta, e[jj]))
        return a, vl, taul, vr, taur, d, e

    a, vl, taul, vr, taur, d, e = jax.lax.fori_loop(
        0, n, body, (a, vl0, taul0, vr0, taur0, d0, e0))
    return d, e[: max(n - 1, 0)] if n > 1 else jnp.zeros((0,), rdt), vl, taul, vr, taur


@jax.jit
def bidiag_apply_ql(vl, taul, b):
    """Apply Q_l = H_0 ⋯ H_{n-1} to b (m×k)."""
    m, n = vl.shape

    def body(jj, b):
        j = n - 1 - jj
        v = vl[:, j]
        tau = taul[j]
        w = matmul(None, jnp.conj(v)[None, :], b)[0]
        return b - tau * v[:, None] * w[None, :]

    return jax.lax.fori_loop(0, n, body, b)


@jax.jit
def bidiag_apply_qr_mat(vr, taur, b):
    """Apply Q_r = H^r_0 ⋯ H^r_{n-2} to b (n×k)."""
    n, n1 = vr.shape
    if n <= 1:
        return b

    def body(jj, b):
        j = n - 2 - jj
        v = vr[:, j]
        tau = taur[j]
        w = matmul(None, jnp.conj(v)[None, :], b)[0]
        return b - tau * v[:, None] * w[None, :]

    return jax.lax.fori_loop(0, n - 1, body, b)
