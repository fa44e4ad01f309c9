"""Divide & conquer bidiagonal SVD.

Reference parity: ``faer/src/linalg/svd/bidiag_svd.rs`` —
``divide_and_conquer`` (``:1005``), secular equation (``:707``), deflation
(``:794``) (SURVEY §2.4 / §7 hard parts, VERDICT item 5).

TPU-native design: the LAPACK ``dlasd``-style row-tear recursion.  A
(m, m+sqre) upper bidiagonal splits at its middle row; substituting the
sub-SVDs turns the merge into the SVD of ``M = [diag-col-pattern] + e₁ zᵀ``
whose singular values solve the secular equation
``f(σ) = 1 + Σ z_j²/((d_j − σ)(d_j + σ))``.  The solve runs in UNSQUARED
coordinates (dlasd4-style) with the log-coordinate bisection of
``tridiag_dnc._secular_solve`` adapted to the product denominators — a
squared-coordinate (Gram) formulation would put deflation/spreading
tolerances at ε·‖B‖², which is a √ε·‖B‖ backward error on the small
singular values.  Right vectors via the Gu–Eisenstat ẑ/Löwner formula, left
vectors via ``u ∝ (−1, d_j ẑ_j/((d_j−σ)(d_j+σ)))``; all O(n³) work is
block-diagonal GEMMs on the MXU; the recursion is trace-time Python over
static halves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.ops.matmul import matmul

_LEAF = 64


def _secular_solve_svd(d, z2, n_iter: int = 64):
    """Roots of ``f(σ) = 1 + Σ_j z2_j/((d_j − σ)(d_j + σ))`` for ``d``
    ascending ≥ 0 with strict gaps.  Root i lives in (d_i, d_{i+1}); it is
    bisected in LOG coordinates off the nearer gap endpoint exactly as in
    ``tridiag_dnc._secular_solve``, with every pole difference kept in
    shifted form.  Returns ``(sig, dms, dps)`` with
    ``dms[j, i] = d_j − σ_i`` (shifted-exact) and ``dps[j, i] = d_j + σ_i``.
    """
    n = d.shape[0]
    dt = d.dtype
    znorm = jnp.sqrt(jnp.sum(z2))
    # REAL deflation: a z_j = 0 pole contributes no secular term, so its
    # "gap" is dead — the root there is exactly d_j, and live roots must
    # bisect against the NEXT ACTIVE pole as their upper endpoint (else the
    # dead-gap search collapses onto the deflated pole and duplicates its
    # eigenvector — observed as a ~1.0 orthogonality defect).
    active = z2 > 0
    big = d[-1] + 2 * znorm + dtypes.eps(dt)        # Weyl bound, 2× slack
    d_act = jnp.where(active, d, jnp.asarray(jnp.inf, dt))
    sufmin = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(d_act)))
    nxt = jnp.concatenate([sufmin[1:], jnp.asarray([jnp.inf], dt)])
    jhat = jnp.searchsorted(d, nxt, side="left").astype(jnp.int32)  # n if inf
    upper = jnp.where(jnp.isinf(nxt), big, nxt)
    g = upper - d
    delta_lo = d[:, None] - d[None, :]              # (j, i): d_j − d_i
    delta_hi = d[:, None] - upper[None, :]
    sum_lo = d[:, None] + d[None, :]                # (j, i): d_j + d_i
    sum_hi = d[:, None] + upper[None, :]
    eye0 = jnp.eye(n, dtype=bool)
    pin_hi = jax.nn.one_hot(jhat, n, dtype=jnp.float32).T.astype(bool)
    zdead = (z2 == 0)[:, None]

    def _dms_lo(t):
        tg = t * g
        return jnp.where(eye0, jnp.broadcast_to((-tg)[None, :], (n, n)),
                         delta_lo - tg[None, :])

    def _dps_lo(t):
        return sum_lo + (t * g)[None, :]

    def _dms_hi(u):
        ug = u * g
        return jnp.where(pin_hi, jnp.broadcast_to(ug[None, :], (n, n)),
                         delta_hi + ug[None, :])

    def _dps_hi(u):
        return sum_hi - (u * g)[None, :]

    def _terms(dms, dps):
        prod = dms * dps
        # dead poles have numerator 0; guard their 0/0 when a midpoint lands
        # exactly on one (active poles keep IEEE ±0 → ±inf semantics)
        prod = jnp.where(zdead & (prod == 0), jnp.ones_like(prod), prod)
        return z2[:, None] / prod

    def f_lo(t):
        return 1.0 + jnp.sum(_terms(_dms_lo(t), _dps_lo(t)), axis=0)

    def f_hi(u):
        return 1.0 + jnp.sum(_terms(_dms_hi(u), _dps_hi(u)), axis=0)

    two = jnp.asarray(2.0, dt)
    s_max = jnp.asarray(1100.0, dt)
    ones = jnp.ones_like(d)

    def body(_, state):
        lo_l, hi_l, lo_h, hi_h = state
        mid_l = 0.5 * (lo_l + hi_l)
        fm_l = f_lo(two ** (-mid_l))
        lo_l = jnp.where(fm_l > 0, mid_l, lo_l)
        hi_l = jnp.where(fm_l > 0, hi_l, mid_l)
        mid_h = 0.5 * (lo_h + hi_h)
        fm_h = f_hi(two ** (-mid_h))
        lo_h = jnp.where(fm_h < 0, mid_h, lo_h)
        hi_h = jnp.where(fm_h < 0, hi_h, mid_h)
        return lo_l, hi_l, lo_h, hi_h

    init = (ones, ones * s_max, ones, ones * s_max)
    lo_l, hi_l, lo_h, hi_h = jax.lax.fori_loop(0, n_iter, body, init)
    t = two ** (-0.5 * (lo_l + hi_l))
    u = two ** (-0.5 * (lo_h + hi_h))
    use_lo = f_lo(0.5 * ones) > 0
    sig = jnp.where(use_lo, d + t * g, upper - u * g)
    dms = jnp.where(use_lo[None, :], _dms_lo(t), _dms_hi(u))
    dps = jnp.where(use_lo[None, :], _dps_lo(t), _dps_hi(u))
    # deflated (z_j = 0) roots: exactly the pole, exact shifted differences
    sig = jnp.where(active, sig, d)
    dms = jnp.where(active[None, :], dms, delta_lo)
    dps = jnp.where(active[None, :], dps, sum_lo)
    return sig, dms, dps


def _chase_extra_column(d, e):
    """Reduce a wide (m, m+1) upper bidiagonal to square: returns
    ``(d', e', w0)`` with ``B_wide @ w0 = [B_square | 0]`` (w0 orthogonal,
    (m+1)×(m+1)).  Right Givens rotations on columns (j, m) zero the last
    column bottom-up (the fill climbs the last column)."""
    m = d.shape[0]
    rdt = d.dtype
    w0 = jnp.eye(m + 1, dtype=rdt)

    def body(t, state):
        d, e, w0, f = state
        j = m - 1 - t
        dj = d[j]
        r = jnp.sqrt(dj * dj + f * f)
        safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
        c = jnp.where(r == 0, jnp.ones_like(r), dj / safe_r)
        s = jnp.where(r == 0, jnp.zeros_like(r), f / safe_r)
        d = d.at[j].set(r)
        jm1 = jnp.maximum(j - 1, 0)
        ej = e[jm1]
        has_prev = j > 0
        newf = jnp.where(has_prev, -s * ej, jnp.zeros_like(s))
        e = e.at[jm1].set(jnp.where(has_prev, c * ej, ej))
        cj = w0[:, j]
        cm = w0[:, m]
        w0 = w0.at[:, j].set(c * cj + s * cm)
        w0 = w0.at[:, m].set(-s * cj + c * cm)
        return d, e, w0, newf

    d, e, w0, _ = jax.lax.fori_loop(0, m, body, (d, e, w0, e[m - 1]))
    return d, e[: m - 1] if m > 1 else e[:0], w0


def _leaf(d, e, sqre: int):
    """Direct solve for small blocks: QR-iteration bidiagonal SVD (plus the
    extra-column chase for the wide case).  Returns (u, s, w) with s
    descending, ``B = u @ [diag(s) | 0_sqre] @ wᵀ``."""
    from faer_tpu.linalg.bidiag_svd import bidiag_svd

    m = d.shape[0]
    if sqre == 0:
        s, u, v, _ = bidiag_svd(d, e, want_u=True, want_v=True)
        return u, s, v
    d2, e2, w0 = _chase_extra_column(d, e)
    s, u, v, _ = bidiag_svd(d2, e2, want_u=True, want_v=True)
    w = matmul(None, w0[:, :m], v)
    w = jnp.concatenate([w, w0[:, m:]], axis=1)
    return u, s, w


def _svd_merge(u1, s1, w1, u2, s2, w2, alpha, beta, sqre: int,
               hi: bool = False):
    """Combine the sub-SVDs across the torn middle row.

    The merged matrix in the permuted column order
    [W1-null, σ1…, σ2…(, W2-null)] is ``M' = [diag(d)-pattern] + e₁ zᵀ``
    with d = (0, s1, s2[, 0]); its singular values solve the UNSQUARED
    secular equation (see module docstring), its vectors follow from the
    Gu–Eisenstat ẑ/Löwner closed forms.
    """
    k = s1.shape[0]          # rows of left sub
    m2 = s2.shape[0]         # rows of right sub
    mm = k + 1 + m2          # merged rows
    nt = mm + sqre           # merged cols
    out_dt = s1.dtype
    rdt = jnp.float64 if jax.config.jax_enable_x64 else out_dt

    zw1 = alpha * w1[k, :]                     # (k+1,)
    zw2 = beta * w2[0, :]                      # (m2+sqre,)
    z = jnp.concatenate([zw1[k:k + 1], zw1[:k], zw2]).astype(rdt)
    dd = jnp.concatenate([
        jnp.zeros((1,), rdt), s1.astype(rdt), s2.astype(rdt),
        jnp.zeros((sqre,), rdt)])
    # row r of M' ↔ pole j for 1 ≤ j ≤ mm−1 (σ entries); pole 0 (and the
    # trailing zero pole when sqre=1) have no row; M' row 0 is the z-row.

    order = jnp.argsort(dd)
    d_s = dd[order]
    z_s = z[order]
    # pole owns a U row iff its unsorted M'-index is a σ row (1..mm−1); the
    # zero poles (index 0, and nt−1 when sqre=1) have none
    has_row = (order >= 1) & (order < mm)
    scale = jnp.maximum(jnp.max(d_s), jnp.asarray(1.0, rdt))
    min_gap = dtypes.eps(rdt) * scale * 8
    tol_d = dtypes.eps(rdt) * scale * 64
    close = jnp.concatenate([(d_s[1:] - d_s[:-1]) <= tol_d,
                             jnp.zeros((1,), bool)])
    # pair-deflate only poles of the SAME class (both row-owning or both
    # row-less): a mixed rotation can move z-mass onto a row-less pole and a
    # later deflated column's U-row rotation then lands on a dropped row
    # (observed as an all-but-zero U column).  Mixed near-coincidences stay
    # active; the min-gap spread + log-coordinate bisection resolve them.
    same_class = jnp.concatenate([has_row[1:] == has_row[:-1],
                                  jnp.zeros((1,), bool)])
    close = close & same_class

    # Gu–Eisenstat pair deflation (same scheme as tridiag_dnc._merge)
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
    ramp = min_gap * jnp.arange(nt, dtype=rdt)
    d_s = jax.lax.cummax(d_s - ramp) + ramp

    s_all, dms, dps = _secular_solve_svd(d_s, z2)

    # ---- Gu–Eisenstat ẑ / Löwner vectors, all in log space, with every
    # squared difference (d_j² − σ_i²) kept as the product dms·dps
    dist = jnp.abs(dms)
    near_j = jnp.argmin(dist, axis=0)
    near_d = jnp.min(dist, axis=0)
    deflated = near_d == 0
    safe_m = jnp.where(dms == 0, jnp.ones_like(dms), dms)
    safe_p = jnp.where(dps == 0, jnp.ones_like(dps), dps)
    log_diff = jnp.log(jnp.abs(safe_m)) + jnp.log(jnp.abs(safe_p))
    diff_d = d_s[None, :] - d_s[:, None]
    sum_d = d_s[None, :] + d_s[:, None]
    eye = jnp.eye(nt, dtype=bool)
    log_num = jnp.sum(log_diff, axis=1)
    log_den = jnp.sum(
        jnp.where(eye, 0.0,
                  jnp.log(jnp.abs(jnp.where(eye, 1.0, diff_d)))
                  + jnp.log(jnp.abs(jnp.where(eye, 1.0, sum_d)))),
        axis=1)
    log_zhat = 0.5 * (log_num - log_den)         # rho = 1
    zsgn = jnp.where(z_s >= 0, 1.0, -1.0).astype(rdt)
    sgn_u = zsgn[:, None] * jnp.where(safe_m >= 0, 1.0, -1.0).astype(rdt)

    # right vectors: v_ji ∝ ẑ_j / ((d_j − σ_i)(d_j + σ_i))
    log_v = log_zhat[:, None] - log_diff
    mxv = jnp.max(log_v, axis=0)
    v = sgn_u * jnp.exp(log_v - mxv[None, :])
    onehot = jax.nn.one_hot(near_j, nt, dtype=rdt).T
    row_defl = jnp.any(onehot.astype(bool) & deflated[None, :], axis=1)
    v = jnp.where(row_defl[:, None], 0.0, v)
    v = jnp.where(deflated[None, :], onehot, v)
    vnorm = jnp.sqrt(jnp.sum(v * v, axis=0))
    v = v / jnp.where(vnorm == 0, 1.0, vnorm)[None, :]

    # left vectors: u ∝ (−1 [z-row], d_j · ẑ_j / ((d_j − σ_i)(d_j + σ_i)))
    neg_inf = jnp.asarray(-1e30, rdt)
    log_p_half = jnp.where(d_s > 0, jnp.log(jnp.where(d_s > 0, d_s, 1.0)),
                           neg_inf)
    log_ul = log_p_half[:, None] + log_zhat[:, None] - log_diff  # (nt, nt)
    const_row = jnp.zeros((1, nt), rdt)          # log|−1| = 0
    logs = jnp.concatenate([const_row, log_ul], axis=0)          # (nt+1, nt)
    sgns = jnp.concatenate([-jnp.ones((1, nt), rdt), sgn_u], axis=0)
    mxu = jnp.max(logs, axis=0)
    ue = sgns * jnp.exp(logs - mxu[None, :])
    # deflated columns: left vector = e_{row of the absorbing pole} — but
    # ONLY for nonzero poles (which own a U row).  A root collapsing onto a
    # ZERO pole (σ = 0: the z-row/null direction) keeps the closed-form
    # column, whose limit (−1 constant row + ẑ_j/d_j) is the correct left
    # vector; the onehot would select a dropped row and zero the column.
    defl_nz = deflated & has_row[near_j]
    ue = ue.at[0, :].set(jnp.where(defl_nz, 0.0, ue[0, :]))
    ue = ue.at[1:, :].set(jnp.where(row_defl[:, None], 0.0, ue[1:, :]))
    ue = ue.at[1:, :].set(jnp.where(defl_nz[None, :], onehot, ue[1:, :]))
    unorm = jnp.sqrt(jnp.sum(ue * ue, axis=0))
    ue = ue / jnp.where(unorm == 0, 1.0, unorm)[None, :]

    # undo the pair-deflation rotations.  Unlike the tridiagonal similarity
    # case this is NOT right-side-only: with d_j ≈ d_{j+1} = d̄ the rotated
    # diagonal block is d̄·G, which is diagonal again only after rotating the
    # matching ROWS by the same G — so both V's rows and U's pole rows get
    # the inverse rotation (LAPACK dlasd2 rotates U and Vᵀ alike).
    def undefl(t, vv):
        j = nt - 2 - t
        c = c_defl[j]
        s = s_defl[j]
        rj = jax.lax.dynamic_slice_in_dim(vv, j, 2, axis=0)
        top = c * rj[0] - s * rj[1]
        bot = s * rj[0] + c * rj[1]
        return jax.lax.dynamic_update_slice_in_dim(
            vv, jnp.stack([top, bot]), j, axis=0)

    v = jax.lax.fori_loop(0, nt - 1, undefl, v)
    ue_poles = jax.lax.fori_loop(0, nt - 1, undefl, ue[1:, :])

    # unsort pole rows back to M'-column order / M'-row order
    inv = jnp.argsort(order)
    v = v[inv, :].astype(out_dt)                 # (nt, nt): M'-col space
    ue_p = ue_poles[inv, :].astype(out_dt)       # pole rows, M'-col index
    # U' rows: row 0 = z-row (constant component), rows 1..mm−1 = poles
    # 1..mm−1 (zero poles at index 0 and nt−1 have no rows; their formula
    # components are exactly 0)
    u_m = jnp.concatenate([ue[0:1, :].astype(out_dt), ue_p[1:mm, :]], axis=0)

    # a root collapsed onto a row-less (zero) pole is a null/singular
    # direction: its true σ is 0 (the spread moved the pole by ~ε); pin it so
    # the descending sort deterministically puts it last
    s_all = jnp.where(deflated & ~has_row[near_j], jnp.zeros_like(s_all), s_all)

    # sort descending; the null-direction column (σ≈0) lands last
    srt = jnp.argsort(-s_all)
    s_all = s_all[srt].astype(out_dt)
    u_m = u_m[:, srt][:, :mm]     # wide case: drop the null root's left col
    v = v[:, srt]

    # map M' rows/cols back to M order and apply the block back-transforms
    # rowp: M' row i ↔ M row rowp[i] = [k, 0..k−1, k+1..mm−1]
    # colp: M' col c ↔ M col colp[c] = [k, 0..k−1, k+1..mm−1+sqre]
    rowp = jnp.concatenate([
        jnp.asarray([k], jnp.int32),
        jnp.arange(0, k, dtype=jnp.int32),
        jnp.arange(k + 1, mm, dtype=jnp.int32)])
    colp = jnp.concatenate([
        jnp.asarray([k], jnp.int32),
        jnp.arange(0, k, dtype=jnp.int32),
        jnp.arange(k + 1, nt, dtype=jnp.int32)])
    u_m = jnp.zeros_like(u_m).at[rowp, :].set(u_m)
    v = jnp.zeros_like(v).at[colp, :].set(v)

    # the top-level merge back-transforms pin full-f32 GEMMs: the bf16x3
    # tile-kernel policy costs ~9e-3 orthU at n=600 on chip (round-2 weak
    # #4); HIGHEST only at the final level keeps the Amdahl cost ~1.3x
    prec = jax.lax.Precision.HIGHEST if hi else None
    u_top = matmul(None, u1, u_m[:k, :], precision=prec)
    u_mid = u_m[k:k + 1, :]
    u_bot = matmul(None, u2, u_m[k + 1:, :], precision=prec)
    u_out = jnp.concatenate([u_top, u_mid, u_bot], axis=0)
    w_top = matmul(None, w1, v[: k + 1, :], precision=prec)
    w_bot = matmul(None, w2, v[k + 1:, :], precision=prec)
    w_out = jnp.concatenate([w_top, w_bot], axis=0)
    return u_out, s_all, w_out


def _dnc(d, e, sqre: int, hi: bool = False):
    """Recursive solve of the (m, m+sqre) upper bidiagonal ``B``:
    returns ``(u, s, w)`` with s descending (length m+sqre, trailing entry
    the ~0 null root when sqre=1), ``B = u @ [diag(s[:m]) | 0] @ wᵀ``."""
    m = d.shape[0]
    if m <= _LEAF:
        u, s, w = _leaf(d, e, sqre)
        if sqre:
            s = jnp.concatenate([s, jnp.zeros((1,), d.dtype)])
        return u, s, w
    k = m // 2
    u1, s1, w1 = _dnc(d[:k], e[:k], 1)
    u2, s2, w2 = _dnc(d[k + 1:], e[k + 1:], sqre)
    alpha = d[k]
    beta = e[k]
    # sub-contract: s includes the wide-case trailing null root; the merge
    # wants only the m genuine singular values of each sub-block
    return _svd_merge(u1, s1[:k], w1, u2, s2[: m - k - 1], w2,
                      alpha, beta, sqre, hi=hi)


def bidiag_svd_dnc(d, e, *, want_u: bool = True, want_v: bool = True):
    """D&C SVD of the SQUARE upper bidiagonal ``B = bidiag(d, e)``.

    Returns ``(s, u, v, info)`` with ``B = U diag(s) Vᵀ``, s descending ≥ 0
    (same contract as ``bidiag_svd.bidiag_svd``).
    """
    n = d.shape[0]
    # normalize scale (secular tolerances assume O(1) entries)
    nrm = jnp.maximum(jnp.max(jnp.abs(d)),
                      jnp.max(jnp.abs(e)) if n > 1 else jnp.zeros((), d.dtype))
    nrm = jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
    u, s, w = _dnc(d / nrm, e / nrm, 0, hi=True)
    info = SpectralInfo(converged=jnp.ones((), bool),
                        iterations=jnp.zeros((), jnp.int32))
    return s * nrm, (u if want_u else None), (w if want_v else None), info
