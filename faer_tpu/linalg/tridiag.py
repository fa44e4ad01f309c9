"""Hermitian → tridiagonal reduction (Householder).

Reference parity: ``faer/src/linalg/evd/tridiag.rs`` — ``tridiag_in_place``
(``:274``). Produces real (d, e) with the reflectors packed for the
back-transform, exactly like LAPACK ``hetrd`` (real subdiagonal even for
complex input thanks to the real-β reflector construction).

TPU-native design: the default is a PANELLED (LAPACK-``latrd``-style)
reduction — per panel, ``b`` Householder steps each cost one trailing matvec
plus O(m·b) corrections, and the rank-2b trailing update runs as two GEMMs on
the MXU.  HBM traffic drops from ~3·n³/3 elements (the unblocked rank-2
update rewrites the trailing matrix every step) to ~n³/3 (matvecs only).
The unblocked single-``fori`` form is kept as the small-n base case.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.ops.matmul import matmul


@jax.jit
def tridiag_in_place_unblocked(a):
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


def _householder_step(c, rows_loc, i, dtype, rdt):
    """Reflector from column ``c`` pivoting at local row ``i+1``:
    returns (v with implicit-1 materialized, tau, beta_real, is_id)."""
    below1 = rows_loc > i + 1
    head = jnp.where(rows_loc == i + 1, c, jnp.zeros_like(c))
    alpha = jnp.sum(head)
    tail_sq = jnp.sum(jnp.where(below1, jnp.abs(c).astype(rdt) ** 2, 0))
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
    v = jnp.where(below1, c / safe_s, jnp.zeros_like(c))
    v = jnp.where(is_id, jnp.zeros_like(v), v)
    v = v + jnp.where(rows_loc == i + 1, jnp.ones_like(v), jnp.zeros_like(v))
    return v, tau, beta_out


def _tridiag_panel(t, bw: int):
    """latrd panel on trailing block ``t`` (m×m): ``bw`` Householder steps
    with deferred trailing update.  Returns (V, W, hh_p, taus_p, e_p, d_p)
    — the caller applies ``t ← t − V Wᴴ − W Vᴴ`` to the rest."""
    m = t.shape[0]
    dtype = t.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rows_loc = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)[0]

    def body(i, st):
        v_p, w_p, hh_p, taus_p, e_p, d_p = st
        col = jax.lax.dynamic_slice(t, (0, i), (m, 1))[:, 0]
        # virtual update of column i: c = (T − V Wᴴ − W Vᴴ) e_i
        wrow = jnp.conj(jax.lax.dynamic_slice(w_p, (i, 0), (1, bw))[0])
        vrow = jnp.conj(jax.lax.dynamic_slice(v_p, (i, 0), (1, bw))[0])
        c = col - matmul(None, v_p, wrow[:, None])[:, 0] \
            - matmul(None, w_p, vrow[:, None])[:, 0]
        d_p = d_p.at[i].set(jnp.real(jnp.sum(
            jnp.where(rows_loc == i, c, jnp.zeros_like(c)))).astype(rdt))
        v, tau, beta = _householder_step(c, rows_loc, i, dtype, rdt)
        # u = (T − V Wᴴ − W Vᴴ) v, three matvecs of which one is m×m
        u = matmul(None, t, v[:, None])[:, 0]
        u = u - matmul(None, v_p, matmul(
            None, jnp.conj(w_p).T, v[:, None]))[:, 0]
        u = u - matmul(None, w_p, matmul(
            None, jnp.conj(v_p).T, v[:, None]))[:, 0]
        vhu = jnp.sum(jnp.conj(v) * u)
        w = tau * u - (jnp.conj(tau) * tau * vhu / 2) * v
        live = cols_b == i
        v_p = jnp.where(live[None, :], v[:, None], v_p)
        w_p = jnp.where(live[None, :], w[:, None], w_p)
        hh_p = jnp.where(live[None, :],
                         jnp.where(rows_loc > i + 1, v, jnp.zeros_like(v))[:, None],
                         hh_p)
        taus_p = taus_p.at[i].set(tau)
        e_p = e_p.at[i].set(beta)
        return v_p, w_p, hh_p, taus_p, e_p, d_p

    st0 = (jnp.zeros((m, bw), dtype), jnp.zeros((m, bw), dtype),
           jnp.zeros((m, bw), dtype), jnp.zeros((bw,), dtype),
           jnp.zeros((bw,), rdt), jnp.zeros((bw,), rdt))
    return jax.lax.fori_loop(0, bw, body, st0)


@functools.partial(jax.jit, static_argnames=("block",))
def tridiag_in_place(a, *, block: int = 128):
    """Blocked Hermitian → tridiagonal reduction; contract identical to
    :func:`tridiag_in_place_unblocked` (LAPACK ``hetrd``; faer
    ``tridiag.rs:274``).  Panels are Python-unrolled with static shrinking
    trailing blocks so matvecs never touch finished rows."""
    n = a.shape[0]
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    if n <= max(2 * block, 256):
        return tridiag_in_place_unblocked(a)
    hh = jnp.zeros((n, n), dtype)
    taus = jnp.zeros((n - 1,), dtype)
    e = jnp.zeros((n - 1,), rdt)
    d = jnp.zeros((n,), rdt)
    t = a
    j0 = 0
    while n - j0 > 2 * block:
        bw = block
        m = n - j0
        v_p, w_p, hh_p, taus_p, e_p, d_p = _tridiag_panel(t, bw)
        hh = jax.lax.dynamic_update_slice(hh, hh_p, (j0, j0))
        taus = jax.lax.dynamic_update_slice(taus, taus_p, (j0,))
        e = jax.lax.dynamic_update_slice(e, e_p, (j0,))
        d = jax.lax.dynamic_update_slice(d, d_p, (j0,))
        # trailing two-sided rank-2b update on the MXU
        v2, w2 = v_p[bw:], w_p[bw:]
        t = t[bw:, bw:] - matmul(None, v2, jnp.conj(w2).T) \
            - matmul(None, w2, jnp.conj(v2).T)
        j0 += bw
    d_t, e_t, hh_t, taus_t = tridiag_in_place_unblocked(t)
    m = n - j0
    hh = jax.lax.dynamic_update_slice(hh, hh_t, (j0, j0))
    taus = jax.lax.dynamic_update_slice(taus, taus_t, (j0,))
    e = jax.lax.dynamic_update_slice(e, e_t, (j0,))
    d = jax.lax.dynamic_update_slice(d, d_t, (j0,))
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
