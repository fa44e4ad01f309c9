"""Real double-shift QZ (generalized Schur) for real pencils (A, B).

Reference parity: ``faer/src/linalg/gevd/qz_real/mod.rs:1508``
(``hessenberg_to_qz<RealField>``) — real Moler–Stewart QZ with implicit
double shifts, 1×1/2×2 deflation blocks, and ad-hoc infinite-eigenvalue
deflation (zero diagonal of T chased off the active block).  Closes VERDICT
round-2 missing #2: real pencils previously paid a 4× FLOP complexification
tax through ``qz_cpair`` and had no infinite-eigenvalue handling.

TPU-native design: same skeleton as ``real_schur.py`` — one ``lax.while_loop``
whose body either deflates (1×1, 2×2, or one infinite eigenvalue), pushes an
interior zero T diagonal down by one row, or runs one full double-shift sweep
as a ``fori_loop`` bulge chase.  Every transform is a static-size 3-row /
3-column Householder or 2-column Givens applied through ``dynamic_slice``
windows on zero-padded carries.

Per chase step (LAPACK ``dhgeqz`` structure):
  * 3-row Householder from the left annihilates the H bulge column,
  * a reversed 3-column Householder zeroes the fill row ``T[i+2, i:i+2]``,
  * a 2-column Givens zeroes ``T[i+1, i]`` — T stays exactly triangular.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.linalg.real_schur import _house3


def _givens(a, b):
    """Real Givens (c, s): [c s; -s c]ᵀ (a, b)ᵀ = (r, 0)ᵀ."""
    r = jnp.sqrt(a * a + b * b)
    safe = jnp.where(r == 0, jnp.ones_like(r), r)
    c = jnp.where(r == 0, jnp.ones_like(a), a / safe)
    s = jnp.where(r == 0, jnp.zeros_like(b), b / safe)
    return c, s


def _lrot(m, i, c, s, width):
    """rows (i, i+1) ← G · rows with G = [[c, s], [-s, c]]."""
    R = jax.lax.dynamic_slice(m, (i, i * 0), (2, width))
    R2 = jnp.stack([c * R[0] + s * R[1], -s * R[0] + c * R[1]])
    return jax.lax.dynamic_update_slice(m, R2, (i, i * 0))


def _rrot(m, j, c, s, height):
    """cols (j, j+1) ← cols · Gᵀ: col_j' = c·col_j + s·col_{j+1}."""
    C = jax.lax.dynamic_slice(m, (j * 0, j), (height, 2))
    C2 = jnp.stack([c * C[:, 0] + s * C[:, 1], -s * C[:, 0] + c * C[:, 1]],
                   axis=1)
    return jax.lax.dynamic_update_slice(m, C2, (j * 0, j))


def real_qz_iteration(h, t, q, z, *, max_sweeps_factor: int = 30):
    """Real QZ on a Hessenberg/triangular pencil: returns
    ``(s, t, q, z, info)`` with S quasi-triangular (1×1/2×2 blocks), T upper
    triangular, ``A = Q S Zᵀ``, ``B = Q T Zᵀ``."""
    n = h.shape[0]
    dtype = h.dtype
    rdt = dtypes.real_dtype_of(dtype)
    eps = dtypes.eps(dtype)
    if n == 1:
        return h, t, q, z, SpectralInfo(converged=jnp.ones((), bool),
                                        iterations=jnp.zeros((), jnp.int32))
    max_iters = max_sweeps_factor * n

    np2 = n + 3
    hp = jnp.zeros((np2, np2), dtype).at[:n, :n].set(h)
    tp = jnp.zeros((np2, np2), dtype).at[:n, :n].set(t)
    qp = jnp.zeros((n, np2), dtype).at[:, :n].set(q)
    zp = jnp.zeros((n, np2), dtype).at[:, :n].set(z)

    hnorm0 = jnp.max(jnp.abs(h))
    tnorm0 = jnp.max(jnp.abs(t))
    tiny = jnp.asarray(dtypes.min_positive(rdt), rdt)
    smlnum = eps * jnp.maximum(hnorm0, tiny)
    smlnum_t = eps * jnp.maximum(tnorm0, tiny)
    _stall_cap = dtypes.deflation_stall_cap(rdt)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    idxn = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (np2, np2), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (np2, np2), 1)
    sub_mask = rows2 == cols2 + 1
    diag_mask = rows2 == cols2

    def body(state):
        hp, tp, qp, zp, hi, it, stall = state
        d = jnp.diagonal(hp)[:n]
        sd = jnp.diagonal(hp, -1)[: n - 1]
        floor = smlnum * (2.0 ** jnp.minimum(stall // 5, _stall_cap))
        tol = jnp.maximum(eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:])), floor)
        negligible = jnp.abs(sd) <= tol
        neg_full = jnp.zeros((np2,), bool).at[:n - 1].set(negligible)
        hp = jnp.where(sub_mask & neg_full[cols2], jnp.zeros((), dtype), hp)
        sd = jnp.diagonal(hp, -1)[: n - 1]
        # zero negligible T diagonals (infinite eigenvalue candidates) — the
        # floor does NOT loosen with the stall counter: a loosened T floor
        # manufactures spurious infinite eigenvalues (observed on a rank-11
        # 12×12 B: 3 "infinite" eigenvalues instead of 1)
        td = jnp.diagonal(tp)[:n]
        t_negl = jnp.abs(td) <= smlnum_t
        tneg_full = jnp.zeros((np2,), bool).at[:n].set(t_negl)
        tp = jnp.where(diag_mask & tneg_full[cols2], jnp.zeros((), dtype), tp)
        td = jnp.diagonal(tp)[:n]

        cand = jnp.where((idx < hi) & (sd == 0), idx + 1, 0)
        lo = jnp.max(cand).astype(jnp.int32)
        nr = hi - lo + 1

        # zero T diagonal inside [lo, hi]: only actionable where the incoming
        # H coupling permits a clean split (LAPACK dhgeqz ILAZRO/ILAZR2
        # gating) — at jz == lo the coupling H[lo, lo-1] is exactly 0; at an
        # interior jz it must be ≤ the (progressively loosened) floor so the
        # dropped fill is a bounded perturbation; jz == hi deflates directly
        tzero = (idxn >= lo) & (idxn <= hi) & (td == 0)
        hsub_prev = jnp.concatenate(
            [jnp.zeros((1,), rdt), jnp.abs(sd)])          # |H[j, j-1]|
        eligible = tzero & ((idxn == hi) | (idxn == lo)
                            | (hsub_prev <= floor))
        has_tzero = jnp.any(eligible)
        jz = jnp.min(jnp.where(eligible, idxn, n)).astype(jnp.int32)

        def deflate1(ops):
            return ops

        def deflate2(ops):
            """Standardize the 2×2 pencil block at (lo, lo) — dlagv2-lite:
            triangularize exactly when the generalized eigenvalues are real
            (rotate A·adj(T)'s eigenvector into e1 on the left, restore T on
            the right); leave genuinely complex 2×2 blocks coupled."""
            hp, tp, qp, zp = ops
            a11 = hp[lo, lo]
            a12 = hp[lo, lo + 1]
            a21 = hp[lo + 1, lo]
            a22 = hp[lo + 1, lo + 1]
            b11 = tp[lo, lo]
            b12 = tp[lo, lo + 1]
            b22 = tp[lo + 1, lo + 1]
            # C = A adj(B): same eigenvectors as A B⁻¹ (det(B) scale only,
            # disc scales by det(B)² so the real/complex test is unchanged)
            c11 = a11 * b22
            c12 = -a11 * b12 + a12 * b11
            c21 = a21 * b22
            c22 = -a21 * b12 + a22 * b11
            m = 0.5 * (c11 + c22)
            pp = 0.5 * (c11 - c22)
            disc = pp * pp + c12 * c21
            is_real = disc >= 0
            sq = jnp.sqrt(jnp.abs(disc))
            lam = m + jnp.where(pp >= 0, sq, -sq)
            x1 = lam - c22
            x2 = c21
            cL, sL = _givens(x1, x2)
            one = jnp.ones_like(cL)
            zero = jnp.zeros_like(sL)
            cL = jnp.where(is_real, cL, one)
            sL = jnp.where(is_real, sL, zero)
            # left rotation G (G e₁ ∝ eigenvector) acts on rows via Gᵀ =
            # [[cL, sL], [-sL, cL]]; Q picks up G on the right; then restore
            # T's triangularity with an independent right rotation on (H,T,Z)
            hp = _lrot(hp, lo, cL, sL, np2)
            tp = _lrot(tp, lo, cL, sL, np2)
            qp = _rrot(qp, lo, cL, sL, n)
            cR, sR = _givens(tp[lo + 1, lo + 1], tp[lo + 1, lo])
            cR = jnp.where(is_real, cR, one)
            sRr = jnp.where(is_real, -sR, zero)
            hp = _rrot(hp, lo, cR, sRr, np2)
            tp = _rrot(tp, lo, cR, sRr, np2)
            zp = _rrot(zp, lo, cR, sRr, n)
            hp = hp.at[lo + 1, lo].set(
                jnp.where(is_real, jnp.zeros((), dtype), hp[lo + 1, lo]))
            tp = tp.at[lo + 1, lo].set(jnp.zeros((), dtype))
            return hp, tp, qp, zp

        def inf_step(ops):
            """Zero-T-diagonal handling (LAPACK ``dhgeqz`` structure): with
            T[jz, jz] = 0 and jz < hi, a left Givens zeroing H[jz+1, jz]
            SPLITS the active block at jz+1 (column jz of T is entirely zero
            at rows jz, jz+1, so T stays triangular); the [jz+1, hi] block
            then converges normally and when hi descends to jz the
            ``deflate_inf`` branch removes the infinite eigenvalue."""
            hp, tp, qp, zp = ops

            def push_down(o):
                hp, tp, qp, zp = o
                # rows (jz, jz+1): zero H[jz+1, jz] against H[jz, jz]
                cc, ss = _givens(hp[jz, jz], hp[jz + 1, jz])
                hp2 = _lrot(hp, jz, cc, ss, np2)
                tp2 = _lrot(tp, jz, cc, ss, np2)
                qp2 = _rrot(qp, jz, cc, ss, n)
                hp2 = hp2.at[jz + 1, jz].set(jnp.zeros((), dtype))
                tp2 = tp2.at[jz, jz].set(jnp.zeros((), dtype))
                # interior split (jz > lo): the row mix scales H[jz, jz-1] by
                # cc and leaves -ss·H[jz, jz-1] fill at (jz+1, jz-1) — the
                # eligibility gate bounds it by the deflation floor, so drop
                # it (LAPACK ILAZR2 'H(jch,jch-1)*C' trick)
                jm = jnp.maximum(jz - 1, 0)
                keep = jz == lo
                hp2 = hp2.at[jz + 1, jm].set(
                    jnp.where(keep, hp2[jz + 1, jm], jnp.zeros((), dtype)))
                return hp2, tp2, qp2, zp

            def deflate_inf(o):
                hp, tp, qp, zp = o
                jm = jnp.maximum(hi - 1, 0)
                c2, s2 = _givens(hp[hi, hi], hp[hi, jm])
                hp2 = _rrot(hp, jm, c2, -s2, np2)
                tp2 = _rrot(tp, jm, c2, -s2, np2)
                zp2 = _rrot(zp, jm, c2, -s2, n)
                hp2 = hp2.at[hi, jm].set(jnp.zeros((), dtype))
                return hp2, tp2, qp, zp2

            return jax.lax.cond(jz >= hi, deflate_inf, push_down,
                                (hp, tp, qp, zp))

        def sweep(ops):
            hp, tp, qp, zp = ops

            def safe(x, ref):
                return jnp.where(jnp.abs(x) < ref, jnp.where(x < 0, -ref, ref), x)

            # shifts: eigenvalues of the trailing 2×2 of H T^{-1}
            t11 = safe(tp[hi - 1, hi - 1], smlnum_t)
            t22 = safe(tp[hi, hi], smlnum_t)
            t12 = tp[hi - 1, hi]
            m11 = hp[hi - 1, hi - 1] / t11
            m21 = hp[hi, hi - 1] / t11
            m12 = (hp[hi - 1, hi] - m11 * t12) / t22
            m22 = (hp[hi, hi] - m21 * t12) / t22
            exc = (stall % 10) == 9
            se = jnp.abs(m21) + jnp.abs(m12)
            m11 = jnp.where(exc, 0.75 * se + m22, m11)
            m12 = jnp.where(exc, -0.4375 * se, m12)
            m21 = jnp.where(exc, se, m21)
            s = m11 + m22
            p = m11 * m22 - m12 * m21
            # first column of (W² − sW + pI) e₁ with W = H T^{-1}, exploiting
            # Hessenberg H / triangular T: only rows lo..lo+2 are nonzero
            s11 = safe(tp[lo, lo], smlnum_t)
            s22 = safe(tp[lo + 1, lo + 1], smlnum_t)
            s12 = tp[lo, lo + 1]
            u1 = hp[lo, lo] / s11               # (W e₁)[lo]
            u2 = hp[lo + 1, lo] / s11           # (W e₁)[lo+1]
            # y = T^{-1}[lo:lo+2, lo:lo+2] (u1, u2)ᵀ
            y2 = u2 / s22
            y1 = (u1 - s12 * y2) / s11
            w1 = hp[lo, lo] * y1 + hp[lo, lo + 1] * y2
            w2 = hp[lo + 1, lo] * y1 + hp[lo + 1, lo + 1] * y2
            w3 = hp[lo + 2, lo + 1] * y2
            v1 = w1 - s * u1 + p
            v2 = w2 - s * u2
            v3 = w3
            scale = jnp.maximum(jnp.maximum(jnp.abs(v1), jnp.abs(v2)),
                                jnp.maximum(jnp.abs(v3), tiny))
            v1, v2, v3 = v1 / scale, v2 / scale, v3 / scale

            def chase(i, st):
                hp, tp, qp, zp, v1, v2, v3 = st
                zi = i * 0
                active = (i >= lo) & (i <= hi - 1)
                v3e = jnp.where(i == hi - 1, jnp.zeros_like(v3), v3)
                tau, u2, u3 = _house3(v1, v2, v3e)
                tau = jnp.where(active, tau, jnp.zeros_like(tau))
                # left: rows i..i+2 of H and T
                R = jax.lax.dynamic_slice(hp, (i, zi), (3, np2))
                w = R[0] + u2 * R[1] + u3 * R[2]
                hp = jax.lax.dynamic_update_slice(
                    hp, R - tau * jnp.stack([w, u2 * w, u3 * w]), (i, zi))
                R = jax.lax.dynamic_slice(tp, (i, zi), (3, np2))
                w = R[0] + u2 * R[1] + u3 * R[2]
                tp = jax.lax.dynamic_update_slice(
                    tp, R - tau * jnp.stack([w, u2 * w, u3 * w]), (i, zi))
                Cq = jax.lax.dynamic_slice(qp, (zi, i), (n, 3))
                wq = Cq[:, 0] + u2 * Cq[:, 1] + u3 * Cq[:, 2]
                qp = jax.lax.dynamic_update_slice(
                    qp, Cq - tau * jnp.stack([wq, u2 * wq, u3 * wq], axis=1),
                    (zi, i))
                # right 1: reversed 3-col Householder zeroing T[i+2, i:i+2]
                x3 = tp[i + 2, i + 2]
                x2_ = tp[i + 2, i + 1]
                x1_ = tp[i + 2, i]
                tau2, r2, r1 = _house3(x3, x2_, x1_)   # reversed order
                tau2 = jnp.where(active & (i + 2 <= hi), tau2,
                                 jnp.zeros_like(tau2))
                uv = jnp.stack([r1, r2, jnp.ones_like(r1)])  # (3,) rev vector

                def rapply(m, height):
                    C = jax.lax.dynamic_slice(m, (zi, i), (height, 3))
                    wc = C[:, 0] * uv[0] + C[:, 1] * uv[1] + C[:, 2]
                    return jax.lax.dynamic_update_slice(
                        m, C - tau2 * wc[:, None] * uv[None, :], (zi, i))

                hp = rapply(hp, np2)
                tp = rapply(tp, np2)
                zp = rapply(zp, n)
                tp = tp.at[i + 2, i].set(
                    jnp.where(tau2 != 0, jnp.zeros((), dtype), tp[i + 2, i]))
                tp = tp.at[i + 2, i + 1].set(
                    jnp.where(tau2 != 0, jnp.zeros((), dtype),
                              tp[i + 2, i + 1]))
                # right 2: 2-col Givens zeroing T[i+1, i]
                cg, sg = _givens(tp[i + 1, i + 1], tp[i + 1, i])
                cg = jnp.where(active, cg, jnp.ones_like(cg))
                sg = jnp.where(active, sg, jnp.zeros_like(sg))
                hp = _rrot(hp, i, cg, -sg, np2)
                tp = _rrot(tp, i, cg, -sg, np2)
                zp = _rrot(zp, i, cg, -sg, n)
                tp = tp.at[i + 1, i].set(
                    jnp.where(active, jnp.zeros((), dtype), tp[i + 1, i]))
                # next bulge column of H
                nv1 = hp[i + 1, i]
                nv2 = hp[i + 2, i]
                nv3 = jnp.where(i + 3 <= hi, hp[jnp.minimum(i + 3, np2 - 1), i],
                                jnp.zeros_like(v3))
                v1 = jnp.where(active, nv1, v1)
                v2 = jnp.where(active, nv2, v2)
                v3 = jnp.where(active, nv3, v3)
                return hp, tp, qp, zp, v1, v2, v3

            hp, tp, qp, zp, _, _, _ = jax.lax.fori_loop(
                lo, hi, chase, (hp, tp, qp, zp, v1, v2, v3))
            return hp, tp, qp, zp

        # dispatch: 1×1 deflate / infinite-eigenvalue step / 2×2 / sweep
        case = jnp.where(nr == 1, 0,
                         jnp.where(has_tzero, 1,
                                   jnp.where(nr == 2, 2, 3)))
        hp, tp, qp, zp = jax.lax.switch(
            case, [deflate1, inf_step, deflate2, sweep], (hp, tp, qp, zp))
        inf_deflated = (case == 1) & (jz >= hi)
        hi = jnp.where(nr == 1, hi - 1,
                       jnp.where(inf_deflated, hi - 1,
                                 jnp.where(case == 2, lo - 1, hi)))
        progressed = (nr == 1) | inf_deflated | (case == 2)
        stall = jnp.where(progressed, 0, stall + 1)
        return hp, tp, qp, zp, hi, it + 1, stall

    def cond(state):
        _, _, _, _, hi, it, _ = state
        return (hi >= 1) & (it < max_iters)

    state = (hp, tp, qp, zp, jnp.asarray(n - 1, jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    hp, tp, qp, zp, hi, it, _ = jax.lax.while_loop(cond, body, state)
    s_ = hp[:n, :n]
    t_ = tp[:n, :n]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s_ = jnp.where(rows <= cols + 1, s_, jnp.zeros((), dtype))
    t_ = jnp.where(rows <= cols, t_, jnp.zeros((), dtype))
    # final negligible pass on the H subdiagonal
    dd = jnp.diagonal(s_)
    sdd = jnp.diagonal(s_, -1)
    tol = jnp.maximum(eps * (jnp.abs(dd[:-1]) + jnp.abs(dd[1:])), smlnum)
    neg = jnp.zeros((n,), bool).at[: n - 1].set(jnp.abs(sdd) <= tol)
    s_ = jnp.where((rows == cols + 1) & neg[cols], jnp.zeros((), dtype), s_)
    return s_, t_, qp[:, :n], zp[:, :n], SpectralInfo(converged=hi < 1,
                                                      iterations=it)


def real_qz(a, b, *, max_sweeps_factor: int = 30):
    """Full real generalized Schur: ``A = Q S Zᵀ``, ``B = Q T Zᵀ`` with S
    quasi-triangular and T upper triangular — all real arithmetic, TPU-native
    (no complexification tax)."""
    from faer_tpu.linalg.qz import hessenberg_triangular

    h, t, q, z = hessenberg_triangular(a, b)
    return real_qz_iteration(h, t, q, z, max_sweeps_factor=max_sweeps_factor)


def qz_eigenvalues_pair(s, t):
    """(α_re, α_im, β) triples from a real quasi-triangular pair (S, T).

    1×1 blocks: (S_kk, 0, T_kk) — β = 0 encodes an infinite eigenvalue.
    2×2 blocks (S_{k+1,k} ≠ 0): complex pair of the 2×2 pencil via the
    quadratic det(S₂ − λT₂) = 0, returned with β = det(T₂) ≥ 0 normalized
    into ``(α, β)`` as α = λβ.
    """
    n = s.shape[0]
    d = jnp.diagonal(s)
    td = jnp.diagonal(t)
    if n == 1:
        return d, jnp.zeros_like(d), td
    sd = jnp.diagonal(s, -1)
    sup = jnp.diagonal(s, 1)
    tsup = jnp.diagonal(t, 1)
    a11, a22 = d[:-1], d[1:]
    a12, a21 = sup, sd
    b11, b22 = td[:-1], td[1:]
    b12 = tsup
    # det(A − λB) = c2 λ² − c1 λ + c0
    c2 = b11 * b22
    c1 = a11 * b22 + a22 * b11 - a21 * b12
    c0 = a11 * a22 - a12 * a21
    disc = c1 * c1 - 4 * c2 * c0
    sq = jnp.sqrt(jnp.abs(disc))
    safe_c2 = jnp.where(c2 == 0, jnp.ones_like(c2), c2)
    re_pair = c1 / (2 * safe_c2)
    im_pair = sq / (2 * jnp.abs(safe_c2))
    blk = sd != 0
    z1 = jnp.zeros((1,), s.dtype)
    is_top = jnp.concatenate([blk, z1.astype(bool)])
    is_bot = jnp.concatenate([z1.astype(bool), blk])
    re_t = jnp.concatenate([re_pair, z1])
    re_b = jnp.concatenate([z1, re_pair])
    im_t = jnp.concatenate([im_pair, z1])
    im_b = jnp.concatenate([z1, im_pair])
    c2_t = jnp.concatenate([c2, z1])
    c2_b = jnp.concatenate([z1, c2])
    # in-block: α = λ·β with β = |c2| (sign folded into α)
    sgn_t = jnp.where(c2_t < 0, -jnp.ones_like(c2_t), jnp.ones_like(c2_t))
    sgn_b = jnp.where(c2_b < 0, -jnp.ones_like(c2_b), jnp.ones_like(c2_b))
    ar = jnp.where(is_top, re_t * c2_t * sgn_t,
                   jnp.where(is_bot, re_b * c2_b * sgn_b, d))
    ai = jnp.where(is_top, im_t * jnp.abs(c2_t),
                   jnp.where(is_bot, -im_b * jnp.abs(c2_b),
                             jnp.zeros_like(d)))
    be = jnp.where(is_top, jnp.abs(c2_t),
                   jnp.where(is_bot, jnp.abs(c2_b), td))
    return ar, ai, be
