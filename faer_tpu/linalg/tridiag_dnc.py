"""Divide & conquer symmetric tridiagonal eigensolver.

Reference parity: ``faer/src/linalg/evd/tridiag_evd.rs`` —
``divide_and_conquer`` (``:608``) with secular-equation root finding and
deflation (SURVEY §2.4 / §7 hard parts).

TPU-native design: Python (trace-time) recursion over static halves; each
merge solves the rank-one-update eigenproblem ``D + ρ z zᵀ``:

* all n secular roots found simultaneously with a fixed-iteration *vmapped*
  bisection (64 steps in the gap-relative coordinate — robust for f32/f64);
* eigenvector components rebuilt from the computed roots via the Löwner
  formula (Gu–Eisenstat ẑ), which restores orthogonality without explicit
  deflation bookkeeping;
* near-degenerate poles are spread by an eps·‖T‖ perturbation (a
  backward-stable change) so interlacing stays strict;
* the back-transform is one blockdiag(Q1, Q2) GEMM per merge — the O(n³)
  work lands on the MXU, unlike the QR-iteration path's rotation chains.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.ops.matmul import matmul

_LEAF = 64


def _secular_solve(d, z2, rho, n_iter: int = 64):
    """Roots of ``f(λ) = 1 + ρ Σ z2_j/(d_j − λ)`` with ``rho > 0`` in
    gap-local coordinates (LAPACK dlaed4-style).

    Root i lives in gap (d_i, d_{i+1}); it is bisected in LOG coordinates
    relative to the nearer gap endpoint — ``t = 2^{−s}`` off the lower pole
    when f(mid) > 0, ``1 − t = 2^{−s}`` off the upper pole otherwise — so the
    pole–root distance is resolved with uniform *relative* precision all the
    way to underflow (an absolute-t bisection floors at gap·2^{−iters},
    leaving √ backward error in the Löwner ẑ for near-pole roots). All
    pole differences enter as exact shifted forms against the owning
    endpoint. Returns ``(lam, diff)`` with ``diff[j, i] = d_j − λ_i``
    computed in those shifted forms.
    """
    n = d.shape[0]
    dt = d.dtype
    zsum = jnp.sum(z2)
    # REAL deflation: a z_j = 0 pole contributes no secular term, so its
    # "gap" is dead — the root there is exactly d_j, and live roots must
    # bisect against the NEXT ACTIVE pole as their upper endpoint (else the
    # dead-gap search collapses onto the deflated pole and duplicates its
    # eigenvector — same defect as in bidiag_dnc, observed there as a ~1.0
    # orthogonality error).
    active = z2 > 0
    # top-root bound with 2× slack: at d_max + 2ρ·zsum, f ≥ 1/2 robustly
    # (the tight Weyl bound d_max + ρ·zsum has f ≥ 0 only to ~eps — fp noise
    # can flip its sign and collapse the top root's bisection onto the bound)
    big = d[-1] + 2 * rho * zsum + dtypes.eps(dt)
    d_act = jnp.where(active, d, jnp.asarray(jnp.inf, dt))
    sufmin = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(d_act)))
    nxt = jnp.concatenate([sufmin[1:], jnp.asarray([jnp.inf], dt)])
    jhat = jnp.searchsorted(d, nxt, side="left").astype(jnp.int32)  # n if inf
    upper = jnp.where(jnp.isinf(nxt), big, nxt)
    g = upper - d                                   # (n,) gap per root
    delta_lo = d[:, None] - d[None, :]              # (j, i): d_j − d_i
    delta_hi = d[:, None] - upper[None, :]          # (j, i): d_j − upper_i
    # the root's own gap endpoints: pole i (low side) and the next-active
    # pole (high side); pin their denominators to ∓t·g DIRECTLY — computing
    # them as delta − t·g gives 0 − (+0) = +0 when t·g underflows (f32 hits
    # this at the very first bisection midpoints), flipping the pole term to
    # +∞ and driving the bisection the wrong way. −(t·g) keeps IEEE −0.
    eye0 = jnp.eye(n, dtype=bool)                   # (i, i): own lower pole
    pin_hi = jax.nn.one_hot(jhat, n, dtype=jnp.float32).T.astype(bool)
    zdead = (z2 == 0)[:, None]

    def _denom_lo(t):
        tg = t * g
        return jnp.where(eye0, jnp.broadcast_to((-tg)[None, :], (n, n)),
                         delta_lo - tg[None, :])    # (j, i): d_j − λ_i

    def _denom_hi(u):
        ug = u * g
        return jnp.where(pin_hi, jnp.broadcast_to(ug[None, :], (n, n)),
                         delta_hi + ug[None, :])

    def _terms(denom):
        # dead poles have numerator 0; guard their 0/0 when a midpoint lands
        # exactly on one (active poles keep IEEE ±0 → ±inf semantics)
        denom = jnp.where(zdead & (denom == 0), jnp.ones_like(denom), denom)
        return z2[:, None] / denom

    def f_lo(t):
        return 1.0 + rho * jnp.sum(_terms(_denom_lo(t)), axis=0)

    def f_hi(u):                                    # u = 1 − t
        return 1.0 + rho * jnp.sum(_terms(_denom_hi(u)), axis=0)

    two = jnp.asarray(2.0, dt)
    s_max = jnp.asarray(1100.0, dt)                 # past f64 subnormals
    ones = jnp.ones_like(d)

    def body(_, state):
        lo_l, hi_l, lo_h, hi_h = state
        # low side: f_lo(2^−s) decreasing in s; f>0 → root at larger s
        mid_l = 0.5 * (lo_l + hi_l)
        fm_l = f_lo(two ** (-mid_l))
        lo_l = jnp.where(fm_l > 0, mid_l, lo_l)
        hi_l = jnp.where(fm_l > 0, hi_l, mid_l)
        # high side: f_hi(2^−s) increasing in s; f<0 → root at larger s
        mid_h = 0.5 * (lo_h + hi_h)
        fm_h = f_hi(two ** (-mid_h))
        lo_h = jnp.where(fm_h < 0, mid_h, lo_h)
        hi_h = jnp.where(fm_h < 0, hi_h, mid_h)
        return lo_l, hi_l, lo_h, hi_h

    init = (ones, ones * s_max, ones, ones * s_max)
    lo_l, hi_l, lo_h, hi_h = jax.lax.fori_loop(0, n_iter, body, init)
    t = two ** (-0.5 * (lo_l + hi_l))
    u = two ** (-0.5 * (lo_h + hi_h))
    use_lo = f_lo(0.5 * ones) > 0                   # root below gap midpoint
    lam = jnp.where(use_lo, d + t * g, upper - u * g)
    diff = jnp.where(use_lo[None, :], _denom_lo(t), _denom_hi(u))
    # deflated (z_j = 0) roots: exactly the pole, exact shifted differences
    lam = jnp.where(active, lam, d)
    diff = jnp.where(active[None, :], diff, delta_lo)
    return lam, diff


def _merge(d1, q1, d2, q2, beta, want_vectors: bool,
           hi: bool = False):
    """Eigen of ``blkdiag(T1, T2) + β (e_k + e_{k+1})(e_k + e_{k+1})ᵀ`` given
    the sub-solutions, following the standard rank-one-tear formulation."""
    n1 = d1.shape[0]
    n2 = d2.shape[0]
    n = n1 + n2
    out_dt = d1.dtype
    # the secular solve and Löwner reconstruction are precision-critical
    # (pole separations shrink toward eps); when x64 is available run them in
    # f64 — O(n²) elementwise work, negligible next to the merge GEMMs — and
    # cast the resulting vectors back for the MXU back-transform. Without x64
    # (TPU) the pipeline runs in the input dtype (pure f32 validated).
    rdt = jnp.float64 if jax.config.jax_enable_x64 else d1.dtype
    # z = [last row of Q1, first row of Q2] (the tear vector in eigenbasis)
    if want_vectors:
        z = jnp.concatenate([q1[n1 - 1, :], q2[0, :]])
    else:
        z = jnp.concatenate([q1, q2])  # rows passed directly (leaf mode)
    d = jnp.concatenate([d1, d2])
    rho = beta
    sgn = jnp.where(rho >= 0, 1.0, -1.0).astype(rdt)
    # for rho < 0 solve the mirrored problem −(D + ρ z zᵀ) = (−D) + |ρ| z zᵀ
    d_eff = jnp.where(sgn > 0, d, -d)
    order = jnp.argsort(d_eff)
    d_s = d_eff[order]
    z_s = z[order]
    z2 = z_s * z_s
    # spread near-degenerate poles: strict interlacing needs positive gaps
    scale = jnp.maximum(jnp.max(jnp.abs(d_s)), jnp.asarray(1.0, rdt))
    min_gap = dtypes.eps(rdt) * scale * 8
    # Gu–Eisenstat pair deflation: for (near-)equal adjacent poles, rotate the
    # pair so the second z component vanishes — the Löwner formula is O(1)
    # wrong otherwise (log of ~eps pole differences). The rotation's dropped
    # off-diagonal coupling is O(gap) ≤ tol_d (backward stable).
    tol_d = dtypes.eps(rdt) * scale * 64
    close = jnp.concatenate([(d_s[1:] - d_s[:-1]) <= tol_d,
                             jnp.zeros((1,), bool)])

    def defl_step(zc, xs):
        z_next, close_j = xs
        r = jnp.sqrt(zc * zc + z_next * z_next)
        safe_r = jnp.where(r == 0, 1.0, r)
        c = jnp.where(close_j, jnp.where(r == 0, 1.0, zc / safe_r), 1.0)
        s = jnp.where(close_j, jnp.where(r == 0, 0.0, z_next / safe_r), 0.0)
        z_out = jnp.where(close_j, r, zc)
        carry = jnp.where(close_j, 0.0, z_next)
        return carry, (z_out, c, s)

    z_last, (z_head, c_defl, s_defl) = jax.lax.scan(
        defl_step, z_s[0], (z_s[1:], close[:-1]))
    z_s = jnp.concatenate([z_head, z_last[None]])
    z2 = z_s * z_s
    # spread ONLY where gaps are below min_gap (cummax form keeps
    # well-separated poles exact, so eigenvalue perturbation stays local)
    ramp = min_gap * jnp.arange(n, dtype=rdt)
    d_s = jax.lax.cummax(d_s - ramp) + ramp
    rho_a = jnp.abs(rho)

    lam, diff_jl = _secular_solve(d_s, z2, rho_a)   # diff[j,i] = d_j − λ_i

    # cast the (possibly f64) secular results back so the output dtype matches
    # the input and the merge GEMMs stay on the MXU fast path
    w = jnp.where(sgn > 0, lam, -lam).astype(out_dt)
    if not want_vectors:
        srt = jnp.argsort(w)
        return w[srt], None

    # Löwner/Gu-Eisenstat ẑ: |ẑ_j|² = ∏_i (λ_i − d_j) / (ρ ∏_{i≠j} (d_i − d_j))
    # and eigenvector components u_ji = ẑ_j / (d_j − λ_i). Built ENTIRELY in
    # log space with a per-column max-log shift before exponentiating: a root
    # collapsed onto a z=0 pole has |d_j − λ| at (or below) the subnormal
    # floor, where the direct exp-then-divide chain under/overflows (observed:
    # ẑ² underflow zeroed the dominant component on XLA CPU, which flushes
    # subnormals) — log space keeps the dominant/junk RATIO exact regardless
    # of absolute scale.
    denom = diff_jl
    dist = jnp.abs(denom)                       # (pole j, root i)
    near_j = jnp.argmin(dist, axis=0)
    near_d = jnp.min(dist, axis=0)
    deflated = near_d == 0                      # exact collapse: vector is e_j
    safe = jnp.where(denom == 0, jnp.ones_like(denom), denom)
    log_diff = jnp.log(jnp.abs(safe))           # (j, i): log|d_j − λ_i|
    diff_d = d_s[None, :] - d_s[:, None]        # (j, i): d_i − d_j
    eye = jnp.eye(n, dtype=bool)
    log_num = jnp.sum(log_diff, axis=1)         # per pole j: Σ_i log|λ_i − d_j|
    log_den = jnp.sum(jnp.where(eye, 0.0,
                                jnp.log(jnp.abs(jnp.where(eye, 1.0, diff_d)))),
                      axis=1)
    log_rho = jnp.log(jnp.where(rho_a == 0, jnp.ones_like(rho_a), rho_a))
    log_zhat = 0.5 * (log_num - log_den - log_rho)          # per pole j
    # sign(0) would be 0 — a never-zero sign keeps a z=0 pole's dominant
    # (self-healing) component alive
    zsgn = jnp.where(z_s >= 0, 1.0, -1.0).astype(rdt)
    sgn_u = zsgn[:, None] * jnp.where(safe >= 0, 1.0, -1.0).astype(rdt)
    log_u = log_zhat[:, None] - log_diff                     # (j, i)
    mx = jnp.max(log_u, axis=0)
    u = sgn_u * jnp.exp(log_u - mx[None, :])
    onehot = jax.nn.one_hot(near_j, n, dtype=rdt).T   # (n, n): e_{near_j(i)}
    # a pole that absorbed an exact collapse has true ẑ_j = 0 (its log_num
    # factor log|λ_c − d_j| = −∞ was masked by `safe`): zero its row in every
    # column, then restore the collapsed columns' e_j entries
    row_defl = jnp.any(onehot.astype(bool) & deflated[None, :], axis=1)
    u = jnp.where(row_defl[:, None], 0.0, u)
    u = jnp.where(deflated[None, :], onehot, u)
    norms = jnp.sqrt(jnp.sum(u * u, axis=0))
    u = u / jnp.where(norms == 0, 1.0, norms)[None, :]
    # undo the pair-deflation rotations on rows: u ← Gᵀ u with
    # G = R_{n-2}···R_0 → apply Rᵀ_j for j descending
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    del rows_i

    def undefl(t, u):
        j = n - 2 - t
        c = c_defl[j]
        s = s_defl[j]
        rj = jax.lax.dynamic_slice_in_dim(u, j, 2, axis=0)
        top = c * rj[0] - s * rj[1]
        bot = s * rj[0] + c * rj[1]
        return jax.lax.dynamic_update_slice_in_dim(
            u, jnp.stack([top, bot]), j, axis=0)

    u = jax.lax.fori_loop(0, n - 1, undefl, u)
    # undo the sort permutation on rows, then back-transform with blockdiag Q
    inv = jnp.argsort(order)
    u = u[inv, :].astype(out_dt)
    # top-level merge pins full-f32 back-transform GEMMs (see bidiag_dnc)
    prec = jax.lax.Precision.HIGHEST if hi else None
    qu_top = matmul(None, q1, u[:n1, :], precision=prec)
    qu_bot = matmul(None, q2, u[n1:, :], precision=prec)
    v = jnp.concatenate([qu_top, qu_bot], axis=0)
    srt = jnp.argsort(w)
    return w[srt], v[:, srt]


def tridiag_evd_dnc(d, e, *, want_vectors: bool = True,
                    hi: bool = True):
    """D&C eigendecomposition of tridiag(d, e). Returns (w, z, info)."""
    n = d.shape[0]
    from faer_tpu.linalg.tridiag_evd import tridiag_evd

    if n <= _LEAF:
        return tridiag_evd(d, e, want_vectors=want_vectors)

    k = n // 2
    beta = e[k - 1]
    # tear: T = blkdiag(T1, T2) + β (e_k−1 + e_k)(…)ᵀ with corrected diagonals
    d1 = d[:k].at[k - 1].add(-beta)
    d2 = d[k:].at[0].add(-beta)
    w1, q1, i1 = tridiag_evd_dnc(d1, e[: k - 1], want_vectors=True,
                                 hi=False)
    w2, q2, i2 = tridiag_evd_dnc(d2, e[k:], want_vectors=True, hi=False)
    w, v = _merge(w1, q1, w2, q2, beta, True, hi=hi)
    if not want_vectors:
        v = None
    info = SpectralInfo(converged=i1.converged & i2.converged,
                        iterations=i1.iterations + i2.iterations)
    return w, v, info
