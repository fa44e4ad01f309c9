"""Householder bidiagonalization (m ≥ n): A = Q_l B Q_rᴴ with B real bidiagonal.

Reference parity: ``faer/src/linalg/svd/bidiag.rs`` — ``bidiag_in_place``
(``:47``). Real diagonal/superdiagonal even for complex input (real-β
reflectors on both sides, LAPACK ``gebrd`` semantics).

TPU-native design: the default is a PANELLED (LAPACK-``labrd``-style)
reduction — per panel, each step costs two trailing matvecs plus O((m+n)·b)
corrections, with the rank-2b trailing update as two GEMMs on the MXU.  The
unblocked single-``fori`` form (one left + one right full rank-1 update per
step) is kept as the small-n base case.
"""
from __future__ import annotations

import functools

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
def bidiag_in_place_unblocked(a):
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


def _bidiag_panel(a0, bw: int):
    """labrd panel on trailing block ``a0`` (mp×np): ``bw`` left+right
    reflector steps with deferred updates ``A = A0 − VL Yᴴ − X VRᴴ``.
    Returns (VL, Y, X, VR, taul_p, taur_p, d_p, e_p)."""
    mp, np_ = a0.shape
    dtype = a0.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)[:, 0]
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)[:, 0]
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)[0]

    def _mm(x, y):
        return matmul(None, x, y)

    def body(i, st):
        vl_p, y_p, x_p, vr_p, taul_p, taur_p, d_p, e_p = st
        # virtual column i: c = (A0 − VL Yᴴ − X VRᴴ) e_i
        col = jax.lax.dynamic_slice(a0, (0, i), (mp, 1))[:, 0]
        yrow = jnp.conj(jax.lax.dynamic_slice(y_p, (i, 0), (1, bw))[0])
        vrrow = jnp.conj(jax.lax.dynamic_slice(vr_p, (i, 0), (1, bw))[0])
        c = col - _mm(vl_p, yrow[:, None])[:, 0] - _mm(x_p, vrrow[:, None])[:, 0]
        v, taul, beta_d = _reflector_from_masked(c, i, rows_m, dtype, rdt)
        # w = conj(τ) vᴴ A_virt  (stored as Y[:, i] = wᴴ)
        vh = jnp.conj(v)[None, :]
        wrow = _mm(vh, a0)[0] \
            - _mm(_mm(vh, vl_p), jnp.conj(y_p).T)[0] \
            - _mm(_mm(vh, x_p), jnp.conj(vr_p).T)[0]
        wrow = jnp.conj(taul) * wrow
        live = cols_b == i
        vl_p = jnp.where(live[None, :], v[:, None], vl_p)
        y_p = jnp.where(live[None, :], jnp.conj(wrow)[:, None], y_p)
        taul_p = taul_p.at[i].set(taul)
        d_p = d_p.at[i].set(beta_d)
        # virtual row i (now including the left reflector just applied)
        arow = jax.lax.dynamic_slice(a0, (i, 0), (1, np_))[0]
        vlrow = jax.lax.dynamic_slice(vl_p, (i, 0), (1, bw))[0]
        xrow = jax.lax.dynamic_slice(x_p, (i, 0), (1, bw))[0]
        r = arow - _mm(vlrow[None, :], jnp.conj(y_p).T)[0] \
            - _mm(xrow[None, :], jnp.conj(vr_p).T)[0]
        u, taur, beta_e = _reflector_from_masked(jnp.conj(r), i + 1, rows_n,
                                                 dtype, rdt)
        # x = τr · A_virt u
        xv = _mm(a0, u[:, None])[:, 0] \
            - _mm(vl_p, _mm(jnp.conj(y_p).T, u[:, None]))[:, 0] \
            - _mm(x_p, _mm(jnp.conj(vr_p).T, u[:, None]))[:, 0]
        xv = taur * xv
        vr_p = jnp.where(live[None, :], u[:, None], vr_p)
        x_p = jnp.where(live[None, :], xv[:, None], x_p)
        taur_p = taur_p.at[i].set(taur)
        e_p = e_p.at[i].set(beta_e)
        return vl_p, y_p, x_p, vr_p, taul_p, taur_p, d_p, e_p

    st0 = (jnp.zeros((mp, bw), dtype), jnp.zeros((np_, bw), dtype),
           jnp.zeros((mp, bw), dtype), jnp.zeros((np_, bw), dtype),
           jnp.zeros((bw,), dtype), jnp.zeros((bw,), dtype),
           jnp.zeros((bw,), rdt), jnp.zeros((bw,), rdt))
    return jax.lax.fori_loop(0, bw, body, st0)


@functools.partial(jax.jit, static_argnames=("block",))
def bidiag_in_place(a, *, block: int = 128):
    """Blocked bidiagonalization; contract identical to
    :func:`bidiag_in_place_unblocked` (LAPACK ``gebrd``; faer
    ``bidiag.rs:47``).  Panels are Python-unrolled with static shrinking
    trailing blocks; the trailing rank-2b update runs on the MXU."""
    m, n = a.shape
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    if n <= max(2 * block, 256):
        return bidiag_in_place_unblocked(a)
    vl = jnp.zeros((m, n), dtype)
    taul = jnp.zeros((n,), dtype)
    vr = jnp.zeros((n, n - 1), dtype)
    taur = jnp.zeros((n - 1,), dtype)
    d = jnp.zeros((n,), rdt)
    e = jnp.zeros((n - 1,), rdt)
    t = a
    j0 = 0
    while n - j0 > 2 * block:
        bw = block
        vl_p, y_p, x_p, vr_p, taul_p, taur_p, d_p, e_p = _bidiag_panel(t, bw)
        vl = jax.lax.dynamic_update_slice(vl, vl_p, (j0, j0))
        vr = jax.lax.dynamic_update_slice(vr, vr_p, (j0, j0))
        taul = jax.lax.dynamic_update_slice(taul, taul_p, (j0,))
        taur = jax.lax.dynamic_update_slice(taur, taur_p, (j0,))
        d = jax.lax.dynamic_update_slice(d, d_p, (j0,))
        e = jax.lax.dynamic_update_slice(e, e_p, (j0,))
        t = t[bw:, bw:] - matmul(None, vl_p[bw:], jnp.conj(y_p[bw:]).T) \
            - matmul(None, x_p[bw:], jnp.conj(vr_p[bw:]).T)
        j0 += bw
    d_t, e_t, vl_t, taul_t, vr_t, taur_t = bidiag_in_place_unblocked(t)
    vl = jax.lax.dynamic_update_slice(vl, vl_t, (j0, j0))
    taul = jax.lax.dynamic_update_slice(taul, taul_t, (j0,))
    d = jax.lax.dynamic_update_slice(d, d_t, (j0,))
    nt = n - j0
    if nt > 1:
        vr = jax.lax.dynamic_update_slice(vr, vr_t, (j0, j0))
        taur = jax.lax.dynamic_update_slice(taur, taur_t, (j0,))
        e = jax.lax.dynamic_update_slice(e, e_t, (j0,))
    return d, e, vl, taul, vr, taur


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
