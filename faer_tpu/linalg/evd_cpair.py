"""Complex eigendecomposition on the complex-free TPU runtime: the uniform
single-shift complex Schur pipeline of ``evd.py``, re-expressed over
(re, im) PAIRS of real arrays (``core.cpair``).

Reference parity: ``faer/src/linalg/evd/schur/complex_schur.rs:631``
(single-shift implicit QR with deflation) and ``hessenberg.rs:549`` — the
same algorithms as the native-complex path in ``evd.py``, line for line,
with the scalar field swapped for split-complex arithmetic so every op
lowers to real VPU/MXU work (VERDICT round-1 item 3).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.cpair import (
    cabs,
    cabs2,
    cadd,
    cconj,
    cdiv,
    cmul,
    cscale,
    csqrt,
    csub,
    cwhere,
)
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.ops.matmul import matmul


def _cpair_matmul(a, b, *, conj_a=False):
    """(re, im) matrix product via 4 real GEMMs."""
    ar, ai = a
    br, bi = b
    if conj_a:
        ar, ai = ar, -ai
    rr = matmul(None, ar, br) - matmul(None, ai, bi)
    ri = matmul(None, ar, bi) + matmul(None, ai, br)
    return rr, ri


def hessenberg_pair(ar, ai):
    """Unitary Hessenberg reduction of A = ar + i·ai: returns (h, q) as
    pairs with A = Q H Qᴴ (mirror of ``evd.hessenberg_in_place``)."""
    n = ar.shape[0]
    rdt = ar.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    qr0 = jnp.eye(n, dtype=rdt)
    qi0 = jnp.zeros((n, n), rdt)
    if n <= 2:
        return (ar, ai), (qr0, qi0)

    def body(j, state):
        (ar, ai), (qr_, qi_) = state
        col = (ar[:, j], ai[:, j])
        below1 = rows > j + 1
        is_head = rows == j + 1
        alpha = (jnp.sum(jnp.where(is_head, col[0], 0.0)),
                 jnp.sum(jnp.where(is_head, col[1], 0.0)))
        tail_sq = jnp.sum(jnp.where(below1, cabs2(col), 0.0))
        norm = jnp.sqrt(cabs2(alpha) + tail_sq)
        sign = jnp.where(alpha[0] >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
        beta = (-sign * norm, jnp.zeros((), rdt))
        is_id = (tail_sq == 0) & (alpha[1] == 0)
        s = csub(alpha, beta)
        safe_s = cwhere(is_id, (jnp.ones((), rdt), jnp.zeros((), rdt)), s)
        safe_b = cwhere(is_id, (jnp.ones((), rdt), jnp.zeros((), rdt)), beta)
        tau = cwhere(is_id, (jnp.zeros((), rdt), jnp.zeros((), rdt)),
                     cdiv(csub(beta, alpha), safe_b))
        v = cwhere(below1, cdiv(col, safe_s), (jnp.zeros_like(col[0]),) * 2)
        v = cwhere(is_id, (jnp.zeros_like(v[0]), jnp.zeros_like(v[1])), v)
        v = (v[0] + jnp.where(is_head, 1.0, 0.0), v[1])
        # A ← Hᴴ A H,  H = I − τ v vᴴ;  w = vᴴ A (row vector)
        w = _cpair_matmul((v[0][None, :], -v[1][None, :]), (ar, ai))
        w = (w[0][0], w[1][0])
        tconj = cconj(tau)
        tv = (tconj[0] * v[0] - tconj[1] * v[1],
              tconj[0] * v[1] + tconj[1] * v[0])          # τ̄·v
        ar = ar - (tv[0][:, None] * w[0][None, :] - tv[1][:, None] * w[1][None, :])
        ai = ai - (tv[0][:, None] * w[1][None, :] + tv[1][:, None] * w[0][None, :])
        u = _cpair_matmul((ar, ai), (v[0][:, None], v[1][:, None]))
        tu = (tau[0] * u[0][:, 0] - tau[1] * u[1][:, 0],
              tau[0] * u[1][:, 0] + tau[1] * u[0][:, 0])
        vc = (v[0], -v[1])
        ar = ar - (tu[0][:, None] * vc[0][None, :] - tu[1][:, None] * vc[1][None, :])
        ai = ai - (tu[0][:, None] * vc[1][None, :] + tu[1][:, None] * vc[0][None, :])
        uq = _cpair_matmul((qr_, qi_), (v[0][:, None], v[1][:, None]))
        tq = (tau[0] * uq[0][:, 0] - tau[1] * uq[1][:, 0],
              tau[0] * uq[1][:, 0] + tau[1] * uq[0][:, 0])
        qr_ = qr_ - (tq[0][:, None] * vc[0][None, :] - tq[1][:, None] * vc[1][None, :])
        qi_ = qi_ - (tq[0][:, None] * vc[1][None, :] + tq[1][:, None] * vc[0][None, :])
        return (ar, ai), (qr_, qi_)

    (ar, ai), (qr_, qi_) = jax.lax.fori_loop(0, n - 2, body,
                                             ((ar, ai), (qr0, qi0)))
    mask = (rows[:, None] - rows[None, :]) <= 1
    ar = jnp.where(mask, ar, 0.0)
    ai = jnp.where(mask, ai, 0.0)
    return (ar, ai), (qr_, qi_)


def _cgivens_pair(x, z):
    """Complex Givens on pairs: c real, s complex with Gᴴ[x, z]ᵀ = [r, 0]ᵀ."""
    ax = cabs(x)
    az = cabs(z)
    r = jnp.sqrt(ax * ax + az * az)
    safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
    c = jnp.where(r == 0, jnp.ones_like(ax), ax / safe_r)
    safe_ax = jnp.where(ax == 0, jnp.ones_like(ax), ax)
    phase = cwhere(ax == 0, (jnp.ones_like(x[0]), jnp.zeros_like(x[1])),
                   cscale(1.0 / safe_ax, x))
    s = cwhere(r == 0, (jnp.zeros_like(z[0]), jnp.zeros_like(z[1])),
               cscale(1.0 / safe_r, cmul(cconj(phase), z)))
    c = jnp.where(az == 0, jnp.ones_like(c), c)
    s = cwhere(az == 0, (jnp.zeros_like(s[0]), jnp.zeros_like(s[1])), s)
    return c, s


def complex_schur_pair(h, q, *, max_sweeps_factor: int = 30):
    """Schur form of upper-Hessenberg pair ``h``: returns (t, q, info) with
    ``A = Q T Qᴴ``, T upper triangular — ``evd.complex_schur`` over pairs."""
    hr, hi = h
    qr_, qi_ = q
    n = hr.shape[0]
    rdt = hr.dtype
    eps = dtypes.eps(rdt)
    if n == 1:
        return h, q, SpectralInfo(converged=jnp.ones((), bool),
                                  iterations=jnp.zeros((), jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    max_iters = max_sweeps_factor * n
    hnorm0 = jnp.maximum(jnp.max(jnp.abs(hr)), jnp.max(jnp.abs(hi)))
    smlnum = eps * jnp.maximum(hnorm0, jnp.asarray(dtypes.min_positive(rdt), rdt))
    # dtype-aware cap: loosened floor stays <= sqrt(eps)*||H||
    _stall_cap = dtypes.deflation_stall_cap(rdt)

    def subdiag(hr, hi):
        return jnp.diagonal(hr, -1), jnp.diagonal(hi, -1)

    def body(state):
        hr, hi, qr_, qi_, hi_idx, it, stall = state
        sd = subdiag(hr, hi)
        dmag = cabs((jnp.diagonal(hr), jnp.diagonal(hi)))
        # progressive deflation floor (see real_schur.py): guarantees
        # progress on stuck interior couplings; resets with the stall counter
        floor = smlnum * (2.0 ** jnp.minimum(stall // 5, _stall_cap))
        tol = jnp.maximum(eps * (dmag[:-1] + dmag[1:]), floor)
        negligible = cabs(sd) <= tol
        can_deflate = (hi_idx > 0) & negligible[jnp.maximum(hi_idx - 1, 0)]

        def deflate(ops):
            return ops

        def do_sweep(ops):
            hr, hi, qr_, qi_ = ops
            cand = jnp.where((idx < hi_idx) & negligible, idx + 1, 0)
            lo = jnp.max(cand).astype(jnp.int32)
            a11 = (hr[hi_idx - 1, hi_idx - 1], hi[hi_idx - 1, hi_idx - 1])
            a12 = (hr[hi_idx - 1, hi_idx], hi[hi_idx - 1, hi_idx])
            a21 = (hr[hi_idx, hi_idx - 1], hi[hi_idx, hi_idx - 1])
            a22 = (hr[hi_idx, hi_idx], hi[hi_idx, hi_idx])
            tr = cadd(a11, a22)
            det = csub(cmul(a11, a22), cmul(a12, a21))
            disc = csqrt(csub(cmul(tr, tr), cscale(4.0, det)))
            r1 = cscale(0.5, cadd(tr, disc))
            r2 = cscale(0.5, csub(tr, disc))
            mu = cwhere(cabs(csub(r1, a22)) < cabs(csub(r2, a22)), r1, r2)
            exc = cadd(a22, (0.75 * cabs(a21), jnp.zeros((), rdt)))
            mu = cwhere((stall % 10) == 9, exc, mu)
            x0 = csub((hr[lo, lo], hi[lo, lo]), mu)
            z0 = (hr[lo + 1, lo], hi[lo + 1, lo])

            def chase(i, st):
                hr, hi, qr_, qi_, x, z = st
                active = (i >= lo) & (i < hi_idx)
                c, s = _cgivens_pair(x, z)
                c = jnp.where(active, c, jnp.ones_like(c))
                s = cwhere(active, s, (jnp.zeros_like(s[0]),) * 2)
                sc = cconj(s)
                # rows i, i+1: row_i' = c·row_i + s̄·row_{i+1}
                ri = (hr[i, :], hi[i, :])
                rj = (hr[i + 1, :], hi[i + 1, :])
                new_ri = cadd(cscale(c, ri), cmul(sc, rj))
                new_rj = csub(cscale(c, rj), cmul(s, ri))
                hr = hr.at[i, :].set(new_ri[0])
                hi = hi.at[i, :].set(new_ri[1])
                hr = hr.at[i + 1, :].set(new_rj[0])
                hi = hi.at[i + 1, :].set(new_rj[1])
                # cols i, i+1: col_i' = c·col_i + s·col_{i+1}
                ci_ = (hr[:, i], hi[:, i])
                cj = (hr[:, i + 1], hi[:, i + 1])
                new_ci = cadd(cscale(c, ci_), cmul(s, cj))
                new_cj = csub(cscale(c, cj), cmul(sc, ci_))
                hr = hr.at[:, i].set(new_ci[0])
                hi = hi.at[:, i].set(new_ci[1])
                hr = hr.at[:, i + 1].set(new_cj[0])
                hi = hi.at[:, i + 1].set(new_cj[1])
                qi_col = (qr_[:, i], qi_[:, i])
                qj_col = (qr_[:, i + 1], qi_[:, i + 1])
                new_qi = cadd(cscale(c, qi_col), cmul(s, qj_col))
                new_qj = csub(cscale(c, qj_col), cmul(sc, qi_col))
                qr_ = qr_.at[:, i].set(new_qi[0])
                qi_ = qi_.at[:, i].set(new_qi[1])
                qr_ = qr_.at[:, i + 1].set(new_qj[0])
                qi_ = qi_.at[:, i + 1].set(new_qj[1])
                nx = (hr[jnp.minimum(i + 1, n - 1), i], hi[jnp.minimum(i + 1, n - 1), i])
                nzr = hr[jnp.minimum(i + 2, n - 1), jnp.minimum(i, n - 1)]
                nzi = hi[jnp.minimum(i + 2, n - 1), jnp.minimum(i, n - 1)]
                nz = (jnp.where(i + 2 <= hi_idx, nzr, 0.0),
                      jnp.where(i + 2 <= hi_idx, nzi, 0.0))
                x = cwhere(active, nx, x)
                z = cwhere(active, nz, z)
                return hr, hi, qr_, qi_, x, z

            hr, hi, qr_, qi_, _, _ = jax.lax.fori_loop(
                lo, hi_idx, chase, (hr, hi, qr_, qi_, x0, z0))
            return hr, hi, qr_, qi_

        hr, hi, qr_, qi_ = jax.lax.cond(can_deflate, deflate, do_sweep,
                                        (hr, hi, qr_, qi_))
        hi_idx = jnp.where(can_deflate, hi_idx - 1, hi_idx)
        stall = jnp.where(can_deflate, 0, stall + 1)
        return hr, hi, qr_, qi_, hi_idx, it + 1, stall

    def cond(state):
        _, _, _, _, hi_idx, it, _ = state
        return (hi_idx > 0) & (it < max_iters)

    state = (hr, hi, qr_, qi_, jnp.asarray(n - 1, jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    hr, hi, qr_, qi_, hi_idx, it, _ = jax.lax.while_loop(cond, body, state)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tr_ = jnp.where(rows <= cols, hr, 0.0)
    ti_ = jnp.where(rows <= cols, hi, 0.0)
    return (tr_, ti_), (qr_, qi_), SpectralInfo(converged=hi_idx == 0,
                                                iterations=it)


def triangular_eigenvectors_cpair(t):
    """Right eigenvectors of an upper-triangular pair ``t`` — the batched
    row-scan of ``eigvec.triangular_eigenvectors`` over split complex."""
    tr_, ti_ = t
    n = tr_.shape[0]
    rdt = tr_.dtype
    eps = dtypes.eps(rdt)
    diag = (jnp.diagonal(tr_), jnp.diagonal(ti_))
    tnorm = jnp.maximum(jnp.max(jnp.abs(tr_)), jnp.max(jnp.abs(ti_)))
    floor = eps * jnp.maximum(tnorm, jnp.ones((), rdt))
    ks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    xr0 = jnp.eye(n, dtype=rdt)
    xi0 = jnp.zeros((n, n), rdt)

    def step(carry, j):
        xr, xi = carry
        rhs_r = -(tr_[j, :] @ xr - ti_[j, :] @ xi)
        rhs_i = -(tr_[j, :] @ xi + ti_[j, :] @ xr)
        den = (tr_[j, j] - diag[0], ti_[j, j] - diag[1])
        small = cabs(den) < floor
        den = (jnp.where(small, floor, den[0]),
               jnp.where(small, jnp.zeros_like(den[1]), den[1]))
        sol = cdiv((rhs_r, rhs_i), den)
        keep = j < ks
        xr = xr.at[j, :].set(jnp.where(keep, sol[0], xr[j, :]))
        xi = xi.at[j, :].set(jnp.where(keep, sol[1], xi[j, :]))
        return (xr, xi), None

    (xr, xi), _ = jax.lax.scan(step, (xr0, xi0), jnp.arange(n - 1, -1, -1))
    norms = jnp.sqrt(jnp.sum(xr * xr + xi * xi, axis=0))
    norms = jnp.where(norms == 0, jnp.ones_like(norms), norms)
    return xr / norms[None, :], xi / norms[None, :]


#: route n ≥ this through the multishift+AED pair path (single-shift pays
#: O(n) full-width sweeps per eigenvalue — impractical on chip past ~1k)
_MULTISHIFT_MIN_N = 128


def _schur_auto(h, q, max_sweeps_factor: int):
    """Schur of a Hessenberg pair: multishift+AED for large n, single-shift
    below (faer ``complex_schur.rs:631`` routes identically by size)."""
    if h[0].shape[0] >= _MULTISHIFT_MIN_N:
        from faer_tpu.linalg.schur_multishift_cpair import (
            multishift_complex_schur_pair,
        )

        return multishift_complex_schur_pair(h, q,
                                             lahqr_sweeps=max_sweeps_factor)
    return complex_schur_pair(h, q, max_sweeps_factor=max_sweeps_factor)


@functools.partial(jax.jit, static_argnames=("max_sweeps_factor",))
def evd_cpair(ar, ai, *, max_sweeps_factor: int = 30):
    """General eigendecomposition of complex ``A = ar + i·ai`` as pairs —
    fully jittable on the complex-free TPU runtime.

    Returns ``((wr, wi), (vr, vi), info)``; faer ``evd_cplx``
    (``evd/mod.rs:1180``) behavior.
    """
    h, q = hessenberg_pair(ar, ai)
    t, qs, info = _schur_auto(h, q, max_sweeps_factor)
    wr = jnp.diagonal(t[0])
    wi = jnp.diagonal(t[1])
    xr, xi = triangular_eigenvectors_cpair(t)
    vr, vi = _cpair_matmul(qs, (xr, xi))
    return (wr, wi), (vr, vi), info


@functools.partial(jax.jit, static_argnames=("max_sweeps_factor",))
def eigenvalues_cpair(ar, ai, *, max_sweeps_factor: int = 30):
    h, q = hessenberg_pair(ar, ai)
    t, _, _ = _schur_auto(h, q, max_sweeps_factor)
    return jnp.diagonal(t[0]), jnp.diagonal(t[1])
