"""Real Schur decomposition: Francis double-shift implicit QR.

Reference parity (SURVEY §2.4, VERDICT item 4):
* ``faer/src/linalg/evd/schur/real_schur.rs:2117`` (``multishift_qr``) /
  ``:2353`` (``lahqr``) — real Hessenberg → quasi-triangular Schur form with
  1×1 and 2×2 diagonal blocks, Francis double-shift bulge chasing,
  exceptional shifts, 2×2 block standardization (``lahqr_schur22``,
  ``real_schur.rs:121``);
* eigenvalues of the quasi-triangular form as (re, im) pairs
  (``real_schur.rs:418`` ``lahqr_eig22``).

TPU-native design: everything runs in REAL arithmetic (this TPU runtime has
no complex element types), with (re, im) pairs surfaced where eigenvalues are
genuinely complex.  The whole iteration is one ``lax.while_loop``; each
iteration either deflates a converged 1×1/2×2 block or performs one full
double-shift sweep as a masked ``fori_loop`` bulge chase over static-shape
3-row/3-column Householder applications (``lax.dynamic_slice`` windows on a
zero-padded carry, so no data-dependent shapes ever reach XLA).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo


def _house3(v1, v2, v3):
    """Branchless 3-vector Householder: returns (tau, u2, u3) with implicit
    u = (1, u2, u3) and (I - tau u uᵀ)(v1,v2,v3)ᵀ = (β, 0, 0)ᵀ."""
    tail2 = v2 * v2 + v3 * v3
    nrm = jnp.sqrt(v1 * v1 + tail2)
    is_id = tail2 == 0
    beta = jnp.where(v1 >= 0, -nrm, nrm)
    denom = jnp.where(is_id, jnp.ones_like(v1), v1 - beta)
    u2 = jnp.where(is_id, jnp.zeros_like(v2), v2 / denom)
    u3 = jnp.where(is_id, jnp.zeros_like(v3), v3 / denom)
    safe_beta = jnp.where(is_id, jnp.ones_like(beta), beta)
    tau = jnp.where(is_id, jnp.zeros_like(beta), (beta - v1) / safe_beta)
    return tau, u2, u3


def _standardize_2x2(a, b, c, d):
    """Rotation (cs, sn) standardizing the 2×2 block [[a,b],[c,d]]
    (faer ``lahqr_schur22``, ``real_schur.rs:121`` behavior): after the
    similarity Gᵀ·B·G with G = [[cs,-sn],[sn,cs]], the block is either upper
    triangular (real eigenvalues) or has equal diagonal entries with
    b'·c' < 0 (complex pair).  Returns (cs, sn, is_real)."""
    m = 0.5 * (a + d)
    pp = 0.5 * (a - d)
    disc = pp * pp + b * c
    is_real = disc >= 0
    # --- real eigenvalues: rotate the eigenvector for λ = m + sign(pp)·√disc
    # into e1 (then Gᵀ B G e1 = λ e1 → lower-left entry 0)
    sq = jnp.sqrt(jnp.abs(disc))
    lam = m + jnp.where(pp >= 0, sq, -sq)
    x1 = lam - d
    x2 = c
    r = jnp.sqrt(x1 * x1 + x2 * x2)
    safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
    cs_r = jnp.where(r == 0, jnp.ones_like(r), x1 / safe_r)
    sn_r = jnp.where(r == 0, jnp.zeros_like(r), x2 / safe_r)
    # --- complex pair: equalize the diagonal.  With G(θ),
    # B'₁₁ − B'₂₂ = cos2θ·(a−d) + sin2θ·(b+c) = 0 → θ = ½·atan2(d−a, b+c)
    theta = 0.5 * jnp.arctan2(d - a, b + c)
    cs_c = jnp.cos(theta)
    sn_c = jnp.sin(theta)
    cs = jnp.where(is_real, cs_r, cs_c)
    sn = jnp.where(is_real, sn_r, sn_c)
    return cs, sn, is_real


def real_schur(h, q, *, max_sweeps_factor: int = 30):
    """Real Schur form of upper-Hessenberg ``h``: returns ``(t, q, info)``
    with ``A = Q T Qᵀ``, ``T`` quasi-triangular (1×1/2×2 diagonal blocks).

    faer ``multishift_qr``/``lahqr`` (``real_schur.rs:2117/:2353``) behavior:
    Francis double shift from the trailing 2×2, exceptional shifts every 10
    stalled sweeps, ε·‖H‖-floored deflation, 2×2 standardization on deflate.
    """
    n = h.shape[0]
    dtype = h.dtype
    eps = dtypes.eps(dtype)
    if n == 1:
        return h, q, SpectralInfo(converged=jnp.ones((), bool),
                                  iterations=jnp.zeros((), jnp.int32))
    max_iters = max_sweeps_factor * n

    # zero-padded carries: 3-wide dynamic windows never clamp
    hp = jnp.zeros((n + 2, n + 2), dtype).at[:n, :n].set(h)
    qp = jnp.zeros((n, n + 2), dtype).at[:, :n].set(q)

    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n + 2, n + 2), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n + 2, n + 2), 1)
    sub_mask = rows2 == cols2 + 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]

    hnorm0 = jnp.max(jnp.abs(h))
    rdt = dtypes.real_dtype_of(dtype)
    smlnum = eps * jnp.maximum(hnorm0, jnp.asarray(dtypes.min_positive(rdt), rdt))
    # dtype-aware cap: loosened floor stays <= sqrt(eps)*||H||
    _stall_cap = dtypes.deflation_stall_cap(rdt)

    def body(state):
        hp, qp, hi, it, stall = state
        d = jnp.diagonal(hp)[:n]
        sd = jnp.diagonal(hp, -1)[: n - 1]
        # progressive deflation: the plateau of a stuck interior coupling can
        # sit a small factor above ε·‖H‖ (observed 18× on a Krylov 12×12,
        # stalling the sweep forever).  Loosening the absolute floor
        # exponentially with the stall counter guarantees progress with a
        # bounded backward perturbation, while non-stalling matrices keep
        # the tight tolerance (stall resets on every deflation).
        floor = smlnum * (2.0 ** jnp.minimum(stall // 5, _stall_cap))
        tol = jnp.maximum(eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:])), floor)
        negligible = jnp.abs(sd) <= tol
        # zero negligible subdiagonal entries (backward-stable perturbation)
        neg_full = jnp.zeros((n + 2,), bool).at[:n - 1].set(negligible)
        hp = jnp.where(sub_mask & neg_full[cols2], jnp.zeros((), dtype), hp)
        sd = jnp.diagonal(hp, -1)[: n - 1]
        # lo = start of the unreduced block ending at hi
        cand = jnp.where((idx < hi) & (sd == 0), idx + 1, 0)
        lo = jnp.max(cand).astype(jnp.int32)
        nr = hi - lo + 1

        def deflate1(ops):
            return ops

        def deflate2(ops):
            hp, qp = ops
            a = hp[lo, lo]
            b = hp[lo, lo + 1]
            c = hp[lo + 1, lo]
            dd = hp[lo + 1, lo + 1]
            cs, sn, is_real = _standardize_2x2(a, b, c, dd)
            r0 = hp[lo, :]
            r1 = hp[lo + 1, :]
            hp = hp.at[lo, :].set(cs * r0 + sn * r1)
            hp = hp.at[lo + 1, :].set(-sn * r0 + cs * r1)
            c0 = hp[:, lo]
            c1 = hp[:, lo + 1]
            hp = hp.at[:, lo].set(cs * c0 + sn * c1)
            hp = hp.at[:, lo + 1].set(-sn * c0 + cs * c1)
            # triangularized exactly when real; equal-diagonal when complex
            hp = hp.at[lo + 1, lo].set(
                jnp.where(is_real, jnp.zeros((), dtype), hp[lo + 1, lo]))
            mean = 0.5 * (hp[lo, lo] + hp[lo + 1, lo + 1])
            hp = hp.at[lo, lo].set(jnp.where(is_real, hp[lo, lo], mean))
            hp = hp.at[lo + 1, lo + 1].set(
                jnp.where(is_real, hp[lo + 1, lo + 1], mean))
            q0 = qp[:, lo]
            q1 = qp[:, lo + 1]
            qp = qp.at[:, lo].set(cs * q0 + sn * q1)
            qp = qp.at[:, lo + 1].set(-sn * q0 + cs * q1)
            return hp, qp

        def sweep(ops):
            hp, qp = ops
            h11 = hp[hi - 1, hi - 1]
            h12 = hp[hi - 1, hi]
            h21 = hp[hi, hi - 1]
            h22 = hp[hi, hi]
            # exceptional shift every 10 stalled sweeps (LAPACK dlahqr trick)
            exc = (stall % 10) == 9
            se = jnp.abs(h21) + jnp.abs(hp[jnp.maximum(hi - 1, 1), jnp.maximum(hi - 2, 0)])
            h11 = jnp.where(exc, 0.75 * se + h22, h11)
            h12 = jnp.where(exc, -0.4375 * se, h12)
            h21 = jnp.where(exc, se, h21)
            h22 = jnp.where(exc, 0.75 * se + hp[hi, hi], h22)
            s = h11 + h22
            p = h11 * h22 - h12 * h21
            # LAPACK dlahqr's sweep-start search: begin the bulge chase at
            # the LARGEST m in (lo, hi−2] where the bulge introduction is
            # negligible against H(m, m−1) — without this, a tiny-but-not-
            # deflatable mid-block coupling poisons the shifts and the
            # iteration stalls (observed: 360 sweeps without convergence on
            # a 12×12 Krylov Hessenberg with a 5e-14 interior coupling).
            if n <= 2:
                # no interior start candidates on a 2×2 (the search arrays
                # below would be zero-size); the chase begins at ``lo``
                m_start = lo
            else:
                dv = jnp.diagonal(hp)[:n]
                sdv = jnp.diagonal(hp, -1)[: n - 1]
                supv = jnp.diagonal(hp, 1)[: n - 1]
                mI = jax.lax.broadcasted_iota(jnp.int32, (n - 2, 1), 0)[:, 0]
                h11m = dv[: n - 2]
                h22m = dv[1: n - 1]
                h21m = sdv[: n - 2]
                h12m = supv[: n - 2]
                h32m = sdv[1: n - 1]
                v1m = h11m * h11m + h12m * h21m - s * h11m + p
                v2m = h21m * (h11m + h22m - s)
                v3m = h21m * h32m
                prev_sd = jnp.concatenate([jnp.zeros((1,), rdt), sdv[: n - 3]]) \
                    if n > 3 else jnp.zeros((n - 2,), rdt)
                prev_d = jnp.concatenate([jnp.zeros((1,), rdt), dv[: n - 3]]) \
                    if n > 3 else jnp.zeros((n - 2,), rdt)
                cond = (jnp.abs(prev_sd) * (jnp.abs(v2m) + jnp.abs(v3m))
                        <= eps * jnp.abs(v1m)
                        * (jnp.abs(prev_d) + jnp.abs(h11m) + jnp.abs(h22m)))
                valid = (mI > lo) & (mI <= hi - 2) & cond
                m_start = jnp.maximum(jnp.max(jnp.where(valid, mI, 0)), lo)
            # first column of H² − sH + pI at the sweep start
            a0 = hp[m_start, m_start]
            b0 = hp[m_start, m_start + 1]
            c0 = hp[m_start + 1, m_start]
            d0 = hp[m_start + 1, m_start + 1]
            e0 = hp[m_start + 2, m_start + 1]
            v1 = a0 * a0 + b0 * c0 - s * a0 + p
            v2 = c0 * (a0 + d0 - s)
            v3 = c0 * e0
            scale = jnp.maximum(
                jnp.maximum(jnp.abs(v1), jnp.abs(v2)),
                jnp.maximum(jnp.abs(v3), jnp.asarray(dtypes.min_positive(rdt), rdt)))
            v1, v2, v3 = v1 / scale, v2 / scale, v3 / scale
            lo_sweep = m_start

            def chase(i, st):
                hp, qp, v1, v2, v3 = st
                zi = i * 0          # a zero of the induction dtype (traced
                                    # bounds make i int32 even under x64)
                active = (i >= lo_sweep) & (i <= hi - 1)
                v3e = jnp.where(i == hi - 1, jnp.zeros_like(v3), v3)
                tau, u2, u3 = _house3(v1, v2, v3e)
                tau = jnp.where(active, tau, jnp.zeros_like(tau))
                # rows i..i+2
                R = jax.lax.dynamic_slice(hp, (i, zi), (3, n + 2))
                w = R[0] + u2 * R[1] + u3 * R[2]
                R = R - tau * jnp.stack(
                    [w, u2 * w, u3 * w], axis=0)
                hp = jax.lax.dynamic_update_slice(hp, R, (i, zi))
                # cols i..i+2
                C = jax.lax.dynamic_slice(hp, (zi, i), (n + 2, 3))
                wc = C[:, 0] + u2 * C[:, 1] + u3 * C[:, 2]
                C = C - tau * jnp.stack([wc, u2 * wc, u3 * wc], axis=1)
                hp = jax.lax.dynamic_update_slice(hp, C, (zi, i))
                Cq = jax.lax.dynamic_slice(qp, (zi, i), (n, 3))
                wq = Cq[:, 0] + u2 * Cq[:, 1] + u3 * Cq[:, 2]
                Cq = Cq - tau * jnp.stack([wq, u2 * wq, u3 * wq], axis=1)
                qp = jax.lax.dynamic_update_slice(qp, Cq, (zi, i))
                # next bulge column
                nv1 = hp[i + 1, i]
                nv2 = hp[i + 2, i]
                nv3 = jnp.where(i + 3 <= hi, hp[jnp.minimum(i + 3, n + 1), i],
                                jnp.zeros_like(v3))
                v1 = jnp.where(active, nv1, v1)
                v2 = jnp.where(active, nv2, v2)
                v3 = jnp.where(active, nv3, v3)
                return hp, qp, v1, v2, v3

            # traced bounds: only [m_start, hi) is chased (the masked
            # 0..n-1 version paid the full sweep even for a 3-wide block)
            hp, qp, _, _, _ = jax.lax.fori_loop(
                lo_sweep, hi, chase, (hp, qp, v1, v2, v3))
            return hp, qp

        case = jnp.where(nr == 1, 0, jnp.where(nr == 2, 1, 2))
        hp, qp = jax.lax.switch(case, [deflate1, deflate2, sweep], (hp, qp))
        hi = jnp.where(nr == 1, hi - 1, jnp.where(nr == 2, lo - 1, hi))
        stall = jnp.where(nr <= 2, 0, stall + 1)
        return hp, qp, hi, it + 1, stall

    def cond(state):
        _, _, hi, it, _ = state
        return (hi >= 1) & (it < max_iters)

    state = (hp, qp, jnp.asarray(n - 1, jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    hp, qp, hi, it, _ = jax.lax.while_loop(cond, body, state)
    t = hp[:n, :n]
    q = qp[:, :n]
    # drop sub-band chase residues (ε-scale); subdiagonal keeps the retained
    # 2×2 couplings, everything below it is exactly zero
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    t = jnp.where(rows <= cols + 1, t, jnp.zeros((), dtype))
    # final negligible pass: full-width deflation rotations smear ε-scale
    # sub-band residues onto already-deflated subdiagonal entries, and the
    # loop may exit before the next in-loop zeroing cleans them
    d = jnp.diagonal(t)
    sd = jnp.diagonal(t, -1)
    tol = jnp.maximum(eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:])), smlnum)
    neg = jnp.zeros((n,), bool).at[: n - 1].set(jnp.abs(sd) <= tol)
    t = jnp.where((rows == cols + 1) & neg[cols], jnp.zeros((), dtype), t)
    return t, q, SpectralInfo(converged=hi < 1, iterations=it)


def schur_eigenvalues_pair(t):
    """Eigenvalues of a real quasi-triangular Schur ``t`` as ``(re, im)``
    real arrays (faer ``lahqr_eig22``, ``real_schur.rs:418`` semantics)."""
    n = t.shape[0]
    d = jnp.diagonal(t)
    if n == 1:
        return d, jnp.zeros_like(d)
    sd = jnp.diagonal(t, -1)
    sup = jnp.diagonal(t, 1)
    m = 0.5 * (d[:-1] + d[1:])
    pp = 0.5 * (d[:-1] - d[1:])
    disc = pp * pp + sup * sd
    sq = jnp.sqrt(jnp.abs(disc))
    blk = sd != 0
    z = jnp.zeros((1,), t.dtype)
    is_top = jnp.concatenate([blk, z.astype(bool)])
    is_bot = jnp.concatenate([z.astype(bool), blk])
    m_t = jnp.concatenate([m, z])
    m_b = jnp.concatenate([z, m])
    sq_t = jnp.concatenate([sq, z])
    sq_b = jnp.concatenate([z, sq])
    disc_t = jnp.concatenate([disc, z])
    disc_b = jnp.concatenate([z, disc])
    wr = jnp.where(is_top, jnp.where(disc_t >= 0, m_t + sq_t, m_t),
                   jnp.where(is_bot, jnp.where(disc_b >= 0, m_b - sq_b, m_b), d))
    wi = jnp.where(is_top & (disc_t < 0), sq_t,
                   jnp.where(is_bot & (disc_b < 0), -sq_b, jnp.zeros_like(d)))
    return wr, wi
