"""Hermitian → tridiagonal reduction (Householder).

Reference parity: ``faer/src/linalg/evd/tridiag.rs`` — ``tridiag_in_place``
(``:274``). Produces real (d, e) with the reflectors packed for the
back-transform, exactly like LAPACK ``hetrd`` (real subdiagonal even for
complex input thanks to the real-β reflector construction).

TPU-native design: one masked ``fori_loop``; each step is a full-size Hermitian
rank-2 update ``A ← A − v wᴴ − w vᴴ`` (VPU/HBM bound, static shapes). A blocked
latter-stage (panel + SYR2K trailing update on the MXU) is the planned perf
upgrade; this form is the correctness baseline every other spectral routine
builds on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.ops.matmul import matmul


@jax.jit
def tridiag_in_place(a):
    """Reduce Hermitian ``a`` (full storage) to tridiagonal form.

    Returns ``(d, e, hh, taus)``: real diagonal ``d`` (n,), real subdiagonal
    ``e`` (n-1,), reflector tails ``hh`` (n×n, v_j in column j, rows j+2:,
    with the implicit 1 at row j+1), and ``taus`` (n-1,).
    """
    n = a.shape[0]
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    if n == 1:
        return (jnp.real(jnp.diagonal(a)).astype(rdt), jnp.zeros((0,), rdt),
                jnp.zeros((1, 1), dtype), jnp.zeros((0,), dtype))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(j, state):
        a, hh, taus, e = state
        col = a[:, j]
        below1 = rows > j + 1
        head = jnp.where(rows == j + 1, col, jnp.zeros_like(col))
        alpha = jnp.sum(head)  # col[j+1] without dynamic scalar index
        tail_sq = jnp.sum(jnp.where(below1, jnp.abs(col).astype(rdt) ** 2, 0))
        alpha_re = jnp.real(alpha).astype(rdt)
        norm = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
        sign = jnp.where(alpha_re >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
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
        beta_out = jnp.where(is_id, alpha_re, beta)
        v = jnp.where(below1, col / safe_s, jnp.zeros_like(col))
        v = jnp.where(is_id, jnp.zeros_like(v), v)
        v = v + jnp.where(rows == j + 1, jnp.ones_like(v), jnp.zeros_like(v))
        # Hermitian two-sided update: A ← A − v wᴴ − w vᴴ,
        #   u = A v;  w = τ̄ u − (|τ|² (vᴴu)/2) v
        u = matmul(None, a, v[:, None])[:, 0]
        vhu = jnp.sum(jnp.conj(v) * u)
        w = tau * u - (jnp.conj(tau) * tau * vhu / 2) * v
        a = a - v[:, None] * jnp.conj(w)[None, :] - w[:, None] * jnp.conj(v)[None, :]
        # column j is now β e_{j+1} mathematically and is never read again:
        # d comes from the diagonal, e from the array below
        hh = hh.at[:, j].set(jnp.where(below1, v, jnp.zeros_like(v)))
        taus = taus.at[j].set(tau)
        e = e.at[j].set(beta_out)
        return a, hh, taus, e

    hh0 = jnp.zeros((n, n), dtype)
    taus0 = jnp.zeros((n - 1,), dtype)
    e0 = jnp.zeros((n - 1,), rdt)
    a, hh, taus, e = jax.lax.fori_loop(0, n - 1, body, (a, hh0, taus0, e0))
    d = jnp.real(jnp.diagonal(a)).astype(rdt)
    return d, e, hh, taus


@jax.jit
def tridiag_apply_q(hh, taus, b):
    """Apply ``Q = H_0 H_1 ⋯ H_{n-3}`` (the tridiagonalizing unitary) to ``b``.

    v_j lives in hh[:, j] with the implicit 1 at row j+1 (zeros elsewhere).
    """
    n = hh.shape[0]
    if n <= 1:
        return b
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(jj, b):
        j = n - 2 - jj  # reverse order for Q·b
        v = hh[:, j] + jnp.where(rows == j + 1, jnp.ones((), hh.dtype), jnp.zeros((), hh.dtype))
        tau = taus[j]
        w = matmul(None, jnp.conj(v)[None, :], b)[0]
        return b - tau * v[:, None] * w[None, :]

    return jax.lax.fori_loop(0, n - 1, body, b)
