"""QZ (generalized Schur) over split-(re, im) pairs — the complex-free TPU
path for the generalized eigenproblem.

Reference parity: ``faer/src/linalg/gevd`` — ``generalized_hessenberg``
(``gen_hessenberg/mod.rs:223``), ``hessenberg_to_qz`` (``qz_cplx/mod.rs:1140``)
— the same single-shift Moler–Stewart iteration as ``qz.py``, with the scalar
field swapped for ``core.cpair`` split-complex arithmetic (VERDICT round-1
item 3: every decomposition available on the TPU runtime).

The generalized eigenvector phase is one batched ``lax.scan`` over rows
(two GEMVs per row across all eigenvalue columns), not a per-column
trace-time loop.
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
from faer_tpu.linalg.evd_cpair import _cgivens_pair, _cpair_matmul


def _rot_rows_p(m, i, c, s):
    """rows (i, i+1) ← Gᴴ · rows on a pair m = (mr, mi)."""
    mr, mi = m
    sc = cconj(s)
    ri = (mr[i, :], mi[i, :])
    rj = (mr[i + 1, :], mi[i + 1, :])
    new_ri = cadd(cscale(c, ri), cmul(sc, rj))
    new_rj = csub(cscale(c, rj), cmul(s, ri))
    mr = mr.at[i, :].set(new_ri[0]).at[i + 1, :].set(new_rj[0])
    mi = mi.at[i, :].set(new_ri[1]).at[i + 1, :].set(new_rj[1])
    return mr, mi


def _rot_cols_p(m, i, c, s):
    """cols (i, i+1) ← cols · G."""
    mr, mi = m
    sc = cconj(s)
    ci = (mr[:, i], mi[:, i])
    cj = (mr[:, i + 1], mi[:, i + 1])
    new_ci = cadd(cscale(c, ci), cmul(s, cj))
    new_cj = csub(cscale(c, cj), cmul(sc, ci))
    mr = mr.at[:, i].set(new_ci[0]).at[:, i + 1].set(new_cj[0])
    mi = mi.at[:, i].set(new_ci[1]).at[:, i + 1].set(new_cj[1])
    return mr, mi


def _rot_cols_rev_p(m, i, c, s):
    """cols (i+1, i) rotation zeroing an (·, i) entry against (·, i+1)."""
    mr, mi = m
    sc = cconj(s)
    ci = (mr[:, i], mi[:, i])
    cj = (mr[:, i + 1], mi[:, i + 1])
    new_cj = cadd(cscale(c, cj), cmul(s, ci))
    new_ci = csub(cscale(c, ci), cmul(sc, cj))
    mr = mr.at[:, i + 1].set(new_cj[0]).at[:, i].set(new_ci[0])
    mi = mi.at[:, i + 1].set(new_cj[1]).at[:, i].set(new_ci[1])
    return mr, mi


def _qr_triangularize_pair(b, a, q):
    """Householder-triangularize B (pair), applying the same unitary to A
    from the left and accumulating into Q (Q ← Q·H): n-step fori with
    masked pair reflectors (mirror of ``evd_cpair.hessenberg_pair``)."""
    br, bi = b
    n = br.shape[0]
    rdt = br.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(j, state):
        (br, bi), (ar, ai), (qr_, qi_) = state
        col = (br[:, j], bi[:, j])
        below = rows > j
        at_j = rows == j
        alpha = (jnp.sum(jnp.where(at_j, col[0], 0.0)),
                 jnp.sum(jnp.where(at_j, col[1], 0.0)))
        tail_sq = jnp.sum(jnp.where(below, cabs2(col), 0.0))
        norm = jnp.sqrt(cabs2(alpha) + tail_sq)
        sign = jnp.where(alpha[0] >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
        beta = (-sign * norm, jnp.zeros((), rdt))
        is_id = (tail_sq == 0) & (alpha[1] == 0)
        one = (jnp.ones((), rdt), jnp.zeros((), rdt))
        s = csub(alpha, beta)
        safe_s = cwhere(is_id, one, s)
        safe_b = cwhere(is_id, one, beta)
        tau = cwhere(is_id, (jnp.zeros((), rdt), jnp.zeros((), rdt)),
                     cdiv(csub(beta, alpha), safe_b))
        v = cwhere(below, cdiv(col, safe_s),
                   (jnp.zeros_like(col[0]), jnp.zeros_like(col[1])))
        v = cwhere(is_id, (jnp.zeros_like(v[0]), jnp.zeros_like(v[1])), v)
        v = (v[0] + jnp.where(at_j, 1.0, 0.0), v[1])

        def apply_left(mr, mi):
            # M ← Hᴴ M = M − τ̄ v (vᴴ M)
            w = _cpair_matmul((v[0][None, :], -v[1][None, :]), (mr, mi))
            w = (w[0][0], w[1][0])
            tc = cconj(tau)
            tv = (tc[0] * v[0] - tc[1] * v[1], tc[0] * v[1] + tc[1] * v[0])
            mr = mr - (tv[0][:, None] * w[0][None, :] - tv[1][:, None] * w[1][None, :])
            mi = mi - (tv[0][:, None] * w[1][None, :] + tv[1][:, None] * w[0][None, :])
            return mr, mi

        br, bi = apply_left(br, bi)
        ar, ai = apply_left(ar, ai)
        # Q ← Q H = Q − (Q v) τ vᴴ
        u = _cpair_matmul((qr_, qi_), (v[0][:, None], v[1][:, None]))
        tu = (tau[0] * u[0][:, 0] - tau[1] * u[1][:, 0],
              tau[0] * u[1][:, 0] + tau[1] * u[0][:, 0])
        vc = (v[0], -v[1])
        qr_ = qr_ - (tu[0][:, None] * vc[0][None, :] - tu[1][:, None] * vc[1][None, :])
        qi_ = qi_ - (tu[0][:, None] * vc[1][None, :] + tu[1][:, None] * vc[0][None, :])
        return (br, bi), (ar, ai), (qr_, qi_)

    return jax.lax.fori_loop(0, n - 1, body, (b, a, q))


def hessenberg_triangular_pair(a, b):
    """(A, B) → (H, R) with H Hessenberg, R triangular: A = Q H Zᴴ,
    B = Q R Zᴴ — pair mirror of ``qz.hessenberg_triangular``."""
    ar, ai = a
    n = ar.shape[0]
    rdt = ar.dtype
    q0 = (jnp.eye(n, dtype=rdt), jnp.zeros((n, n), rdt))
    z0 = (jnp.eye(n, dtype=rdt), jnp.zeros((n, n), rdt))
    b, a, q = _qr_triangularize_pair(b, a, q0)
    h, r, z = a, b, z0
    if n <= 2:
        return h, r, q, z

    def col_body(j, state):
        h, r, q, z = state

        def row_body(t, st):
            h, r, q, z = st
            i = (n - 2) - t
            active = i >= j + 1
            c, s = _cgivens_pair((h[0][i, j], h[1][i, j]),
                                 (h[0][i + 1, j], h[1][i + 1, j]))
            c = jnp.where(active, c, jnp.ones_like(c))
            s = cwhere(active, s, (jnp.zeros_like(s[0]), jnp.zeros_like(s[1])))
            h = _rot_rows_p(h, i, c, s)
            r = _rot_rows_p(r, i, c, s)
            q = _rot_cols_p(q, i, c, s)
            c2, s2 = _cgivens_pair(cconj((r[0][i + 1, i + 1], r[1][i + 1, i + 1])),
                                   cconj((r[0][i + 1, i], r[1][i + 1, i])))
            c2 = jnp.where(active, c2, jnp.ones_like(c2))
            s2 = cwhere(active, s2,
                        (jnp.zeros_like(s2[0]), jnp.zeros_like(s2[1])))
            r = _rot_cols_rev_p(r, i, c2, s2)
            h = _rot_cols_rev_p(h, i, c2, s2)
            z = _rot_cols_rev_p(z, i, c2, s2)
            return h, r, q, z

        return jax.lax.fori_loop(0, n - 2 - j, row_body, (h, r, q, z))

    h, r, q, z = jax.lax.fori_loop(0, n - 2, col_body, (h, r, q, z))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    h = (jnp.where(rows <= cols + 1, h[0], 0.0),
         jnp.where(rows <= cols + 1, h[1], 0.0))
    r = (jnp.where(rows <= cols, r[0], 0.0),
         jnp.where(rows <= cols, r[1], 0.0))
    return h, r, q, z


def qz_iteration_pair(h, r, q, z, *, max_sweeps_factor: int = 30):
    """Single-shift Moler–Stewart QZ on a Hessenberg/triangular pair of
    pairs — mirror of ``qz.qz_iteration``."""
    n = h[0].shape[0]
    rdt = h[0].dtype
    eps = dtypes.eps(rdt)
    if n == 1:
        return h, r, q, z, SpectralInfo(converged=jnp.ones((), bool),
                                        iterations=jnp.zeros((), jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    max_iters = max_sweeps_factor * n
    hnorm0 = jnp.maximum(jnp.max(jnp.abs(h[0])), jnp.max(jnp.abs(h[1])))
    smlnum = eps * jnp.maximum(hnorm0, jnp.asarray(dtypes.min_positive(rdt), rdt))
    # dtype-aware cap: loosened floor stays <= sqrt(eps)*||H||
    _stall_cap = dtypes.deflation_stall_cap(rdt)

    def body(state):
        hr, hi, rr, ri, qr_, qi_, zr, zi, hi_idx, it, stall = state
        h = (hr, hi)
        r = (rr, ri)
        q = (qr_, qi_)
        z = (zr, zi)
        sd = (jnp.diagonal(hr, -1), jnp.diagonal(hi, -1))
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
            h, r, q, z = ops
            cand = jnp.where((idx < hi_idx) & negligible, idx + 1, 0)
            lo = jnp.max(cand).astype(jnp.int32)

            def pick(m, i, j):
                return (m[0][i, j], m[1][i, j])

            def safe(x):
                bad = cabs(x) < smlnum
                return (jnp.where(bad, smlnum, x[0]),
                        jnp.where(bad, jnp.zeros_like(x[1]), x[1]))

            r11 = safe(pick(r, hi_idx - 1, hi_idx - 1))
            r22 = safe(pick(r, hi_idx, hi_idx))
            m11 = cdiv(pick(h, hi_idx - 1, hi_idx - 1), r11)
            m12 = cdiv(csub(pick(h, hi_idx - 1, hi_idx),
                            cmul(m11, pick(r, hi_idx - 1, hi_idx))), r22)
            m21 = cdiv(pick(h, hi_idx, hi_idx - 1), r11)
            m22 = cdiv(csub(pick(h, hi_idx, hi_idx),
                            cmul(m21, pick(r, hi_idx - 1, hi_idx))), r22)
            tr = cadd(m11, m22)
            det = csub(cmul(m11, m22), cmul(m12, m21))
            disc = csqrt(csub(cmul(tr, tr), cscale(4.0, det)))
            e1 = cscale(0.5, cadd(tr, disc))
            e2 = cscale(0.5, csub(tr, disc))
            mu = cwhere(cabs(csub(e1, m22)) < cabs(csub(e2, m22)), e1, e2)
            exc = cadd(m22, (0.75 * cabs(m21), jnp.zeros((), rdt)))
            mu = cwhere((stall % 10) == 9, exc, mu)
            x0 = csub(pick(h, lo, lo), cmul(mu, pick(r, lo, lo)))
            z0 = pick(h, lo + 1, lo)

            def chase(i, st):
                h, r, q, z, x, bz = st
                active = (i >= lo) & (i < hi_idx)
                c, s = _cgivens_pair(x, bz)
                c = jnp.where(active, c, jnp.ones_like(c))
                s = cwhere(active, s,
                           (jnp.zeros_like(s[0]), jnp.zeros_like(s[1])))
                h = _rot_rows_p(h, i, c, s)
                r = _rot_rows_p(r, i, c, s)
                q = _rot_cols_p(q, i, c, s)
                c2, s2 = _cgivens_pair(
                    cconj((r[0][i + 1, i + 1], r[1][i + 1, i + 1])),
                    cconj((r[0][i + 1, i], r[1][i + 1, i])))
                c2 = jnp.where(active, c2, jnp.ones_like(c2))
                s2 = cwhere(active, s2,
                            (jnp.zeros_like(s2[0]), jnp.zeros_like(s2[1])))
                h = _rot_cols_rev_p(h, i, c2, s2)
                r = _rot_cols_rev_p(r, i, c2, s2)
                z = _rot_cols_rev_p(z, i, c2, s2)
                i1 = jnp.minimum(i + 1, n - 1)
                i2 = jnp.minimum(i + 2, n - 1)
                nx = (h[0][i1, i], h[1][i1, i])
                nz = (jnp.where(i + 2 <= hi_idx, h[0][i2, jnp.minimum(i, n - 1)], 0.0),
                      jnp.where(i + 2 <= hi_idx, h[1][i2, jnp.minimum(i, n - 1)], 0.0))
                x = cwhere(active, nx, x)
                bz = cwhere(active, nz, bz)
                return h, r, q, z, x, bz

            h, r, q, z, _, _ = jax.lax.fori_loop(
                lo, hi_idx, chase, (h, r, q, z, x0, z0))
            return h, r, q, z

        h, r, q, z = jax.lax.cond(can_deflate, deflate, do_sweep, (h, r, q, z))
        hi_idx = jnp.where(can_deflate, hi_idx - 1, hi_idx)
        stall = jnp.where(can_deflate, 0, stall + 1)
        return (h[0], h[1], r[0], r[1], q[0], q[1], z[0], z[1],
                hi_idx, it + 1, stall)

    def cond(state):
        return (state[8] > 0) & (state[9] < max_iters)

    state = (h[0], h[1], r[0], r[1], q[0], q[1], z[0], z[1],
             jnp.asarray(n - 1, jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    hr, hi, rr, ri, qr_, qi_, zr, zi, hi_idx, it, _ = out
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s_ = (jnp.where(rows <= cols, hr, 0.0), jnp.where(rows <= cols, hi, 0.0))
    t_ = (jnp.where(rows <= cols, rr, 0.0), jnp.where(rows <= cols, ri, 0.0))
    return s_, t_, (qr_, qi_), (zr, zi), SpectralInfo(converged=hi_idx == 0,
                                                      iterations=it)


#: route n ≥ this through multishift+AED QZ (single-shift pays O(n)
#: full-width sweeps per generalized eigenvalue — impractical past ~1k)
_MULTISHIFT_MIN_N = 128


@functools.partial(jax.jit, static_argnames=("max_sweeps_factor",))
def qz_pair(ar, ai, br, bi, *, max_sweeps_factor: int = 30):
    """Full generalized Schur over pairs: (S, T, Q, Z, info) with
    ``A = Q S Zᴴ``, ``B = Q T Zᴴ`` — jittable on the complex-free TPU.

    Large pencils route through the batched multishift+AED QZ
    (:mod:`~faer_tpu.linalg.qz_multishift_cpair`, faer
    ``qz_cplx/mod.rs:1140`` parity); small ones use the single-shift
    Moler–Stewart iteration above.
    """
    h, r, q, z = hessenberg_triangular_pair((ar, ai), (br, bi))
    if ar.shape[0] >= _MULTISHIFT_MIN_N:
        from faer_tpu.linalg.qz_multishift_cpair import multishift_qz_pair

        return multishift_qz_pair(h, r, q, z,
                                  lahqr_sweeps=max_sweeps_factor)
    return qz_iteration_pair(h, r, q, z, max_sweeps_factor=max_sweeps_factor)


def _gen_eigvec_scan(s_, t_, alpha, beta):
    """Right eigenvectors of the triangular pencil (βS − αT) per column,
    solved for ALL columns by one scan over rows (bottom-up)."""
    n = s_[0].shape[0]
    rdt = s_[0].dtype
    eps = dtypes.eps(rdt)
    snorm = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(s_[0])), jnp.max(jnp.abs(s_[1]))),
                        jnp.maximum(jnp.max(jnp.abs(t_[0])), jnp.max(jnp.abs(t_[1]))))
    floor = eps * jnp.maximum(snorm, jnp.ones((), rdt))
    ks = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    xr0 = jnp.eye(n, dtype=rdt)
    xi0 = jnp.zeros((n, n), rdt)
    sdiag = (jnp.diagonal(s_[0]), jnp.diagonal(s_[1]))
    tdiag = (jnp.diagonal(t_[0]), jnp.diagonal(t_[1]))

    def step(carry, j):
        xr, xi = carry
        # m^k[j, l] = β_k S[j, l] − α_k T[j, l]; rhs_j = −Σ_{l>j} m[j,l] x_l
        sx = (s_[0][j, :] @ xr - s_[1][j, :] @ xi,
              s_[0][j, :] @ xi + s_[1][j, :] @ xr)
        tx = (t_[0][j, :] @ xr - t_[1][j, :] @ xi,
              t_[0][j, :] @ xi + t_[1][j, :] @ xr)
        rhs = csub(cmul(alpha, tx), cmul(beta, sx))
        den = csub(cmul(beta, (s_[0][j, j], s_[1][j, j])),
                   cmul(alpha, (t_[0][j, j], t_[1][j, j])))
        small = cabs(den) < floor
        den = (jnp.where(small, floor, den[0]),
               jnp.where(small, jnp.zeros_like(den[1]), den[1]))
        sol = cdiv(rhs, den)
        keep = j < ks
        xr = xr.at[j, :].set(jnp.where(keep, sol[0], xr[j, :]))
        xi = xi.at[j, :].set(jnp.where(keep, sol[1], xi[j, :]))
        return (xr, xi), None

    (xr, xi), _ = jax.lax.scan(step, (xr0, xi0), jnp.arange(n - 1, -1, -1))
    del sdiag, tdiag
    norms = jnp.sqrt(jnp.sum(xr * xr + xi * xi, axis=0))
    norms = jnp.where(norms == 0, jnp.ones_like(norms), norms)
    return xr / norms[None, :], xi / norms[None, :]


@functools.partial(jax.jit, static_argnames=("max_sweeps_factor",))
def gevd_qz_pair(ar, ai, br, bi, *, max_sweeps_factor: int = 30):
    """Generalized eigendecomposition via QZ over pairs: returns
    ``((alpha_r, alpha_i), (beta_r, beta_i), (vr, vi), info)`` with
    ``A v β = B v α`` column-wise."""
    s_, t_, q, z, info = qz_pair(ar, ai, br, bi,
                                 max_sweeps_factor=max_sweeps_factor)
    alpha = (jnp.diagonal(s_[0]), jnp.diagonal(s_[1]))
    beta = (jnp.diagonal(t_[0]), jnp.diagonal(t_[1]))
    xr, xi = _gen_eigvec_scan(s_, t_, alpha, beta)
    vr, vi = _cpair_matmul(z, (xr, xi))
    norms = jnp.sqrt(jnp.sum(vr * vr + vi * vi, axis=0))
    norms = jnp.where(norms == 0, jnp.ones_like(norms), norms)
    return alpha, beta, (vr / norms[None, :], vi / norms[None, :]), info
