"""Multishift QR + AED for COMPLEX matrices over (re, im) pairs.

Reference parity (VERDICT round-3 missing #3):
``faer/src/linalg/evd/schur/complex_schur.rs:631`` — faer's complex Schur is
multishift with aggressive early deflation, exactly like the real path; the
repo's previous complex route (``evd_cpair.complex_schur_pair``) is
single-shift, O(n) sweeps per eigenvalue — impractical on chip past n ≈ 1k.

TPU-native design: the batched bulge chain + windowed far-field structure of
:mod:`~faer_tpu.linalg.schur_multishift` (see its module docstring for why
the batching is exact), instantiated over split-complex (re, im) pairs so
every operation lowers to real VPU/MXU work on the complex-free TPU runtime:

* 3-row bulges carry TWO complex shifts each (LAPACK ``zlaqr5`` geometry);
  shifts need not be conjugate pairs, so the shift quadratic coefficients
  ``s1 + s2`` / ``s1·s2`` are complex pairs;
* the complex Schur is triangular (no 2×2 blocks), which makes the AED
  deflation test a plain per-eigenvalue spike check — simpler than real;
* the AED window Schur reuses the single-shift pair path (windows are
  ≤ 3·ns/2, small enough for the O(w²)-sweep algorithm).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.cpair import cabs, cabs2, cconj, cdiv, cmul, csub, cwhere
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.linalg.evd_cpair import complex_schur_pair
from faer_tpu.ops.matmul import matmul as _mm


def _mm_hi(a, b):
    return _mm(None, a, b, precision=jax.lax.Precision.HIGHEST)


def _pmm(a, b, *, adj_a: bool = False):
    """Pair matmul at full f32 accumulation (similarity updates compound)."""
    ar, ai = a
    br, bi = b
    if adj_a:
        ar, ai = ar.T, -ai.T
    return (_mm_hi(ar, br) - _mm_hi(ai, bi), _mm_hi(ar, bi) + _mm_hi(ai, br))


def _params_for(n: int) -> tuple[int, int]:
    if n < 590:
        ns = 32
    elif n < 3000:
        ns = 64
    else:
        ns = 128
    return ns, (3 * ns) // 2


def _chouse3_batch(v1, v2, v3):
    """Batched complex 3-vector Householder over pairs (zlarfg semantics).

    Returns ``(tau, u2, u3)`` (complex pairs) with u1 = 1 and
    ``(I − τ̄ u uᴴ) v = β e₁`` (β real).  Zero tails give τ = 0.
    """
    tail2 = cabs2(v2) + cabs2(v3)
    a2 = cabs2(v1)
    nrm = jnp.sqrt(a2 + tail2)
    is_id = (tail2 == 0) & (v1[1] == 0)
    sign = jnp.where(v1[0] >= 0, 1.0, -1.0)
    beta = -sign * nrm                                  # real
    one = (jnp.ones_like(beta), jnp.zeros_like(beta))
    denom = (v1[0] - beta, v1[1])                       # α − β
    denom = cwhere(is_id, one, denom)
    u2 = cdiv(v2, denom)
    u3 = cdiv(v3, denom)
    safe_b = jnp.where(is_id, jnp.ones_like(beta), beta)
    tau = ((beta - v1[0]) / safe_b, -v1[1] / safe_b)
    tau = cwhere(is_id, (jnp.zeros_like(beta), jnp.zeros_like(beta)), tau)
    zz = (jnp.zeros_like(u2[0]), jnp.zeros_like(u2[1]))
    u2 = cwhere(is_id, zz, u2)
    u3 = cwhere(is_id, zz, u3)
    return tau, u2, u3


def _take_pair(p, idx, axis):
    return (jnp.take(p[0], idx, axis=axis), jnp.take(p[1], idx, axis=axis))


# ---------------------------------------------------------------------------
# multishift sweep (pair field)
# ---------------------------------------------------------------------------


def _sweep(hp, qp, lo, hi, sb, pb, *, off: int, n: int, nb: int, step: int):
    """One sweep chasing ``nb`` 2-shift bulges through ``[lo, hi]``.

    ``hp``/``qp`` are padded pairs; ``sb``/``pb`` are complex pairs (per
    bulge): s₁+s₂ and s₁·s₂.  Structure mirrors the real ``_sweep``; every
    reflector application is the complex similarity A ← Hᴴ A H.
    """
    rdt = hp[0].dtype
    W = step + 3 * nb + 1
    bidx = jnp.arange(nb, dtype=jnp.int32)
    li_base = 1 + 3 * (nb - 1 - bidx)
    r3 = jnp.arange(3, dtype=jnp.int32)

    total = hi - lo + 3 * nb
    nchunks = (total + step - 1) // step

    def chunk(c, st):
        hp, qp = st
        t0 = c * step
        a = off + lo + t0 - 3 * (nb - 1) - 1
        d = tuple(jax.lax.dynamic_slice(h, (a, a), (W, W)) for h in hp)
        u = (jnp.eye(W, dtype=rdt), jnp.zeros((W, W), rdt))

        def inner(tt, st2):
            d, u = st2
            t = t0 + tt
            ib = lo + t - 3 * bidx
            li = tt + li_base
            active = (t - 3 * bidx >= 0) & (ib <= hi - 1)
            intro = ib == lo

            def at(i, j):
                return (d[0][i, j], d[1][i, j])

            d11 = at(li, li)
            d12 = at(li, li + 1)
            d21 = at(li + 1, li)
            d22 = at(li + 1, li + 1)
            d32 = at(li + 2, li + 1)
            # first column of (H − s₁)(H − s₂) on the 3-row head
            pv1 = csub(cadd3(cmul(d11, d11), cmul(d12, d21), pb),
                       cmul(sb, d11))
            pv2 = cmul(d21, csub(cadd2(d11, d22), sb))
            pv3 = cmul(d21, d32)
            cv1 = at(li, li - 1)
            cv2 = at(li + 1, li - 1)
            cv3 = at(li + 2, li - 1)
            v1 = cwhere(intro, pv1, cv1)
            v2 = cwhere(intro, pv2, cv2)
            v3 = cwhere(intro, pv3, cv3)
            zz = (jnp.zeros_like(v3[0]), jnp.zeros_like(v3[1]))
            v3 = cwhere(ib == hi - 1, zz, v3)
            scale = jnp.maximum(jnp.maximum(cabs(v1), cabs(v2)), cabs(v3))
            scale = jnp.where(scale == 0, jnp.ones_like(scale), scale)
            inv = 1.0 / scale
            tau, u2, u3 = _chouse3_batch(
                (v1[0] * inv, v1[1] * inv),
                (v2[0] * inv, v2[1] * inv),
                (v3[0] * inv, v3[1] * inv))
            tau = cwhere(active, tau, (jnp.zeros_like(tau[0]),) * 2)
            tauc = cconj(tau)
            u2c = cconj(u2)
            u3c = cconj(u3)

            rows3 = (li[:, None] + r3[None, :]).reshape(-1)

            # left: rows ← (I − τ̄ u uᴴ) rows  (w = uᴴ R = R₁ + ū₂R₂ + ū₃R₃)
            R = tuple(jnp.take(dk, rows3, axis=0).reshape(nb, 3, W) for dk in d)
            R1 = (R[0][:, 0], R[1][:, 0])
            R2 = (R[0][:, 1], R[1][:, 1])
            R3 = (R[0][:, 2], R[1][:, 2])
            wv = cadd3(R1, cmul((u2c[0][:, None], u2c[1][:, None]), R2),
                       cmul((u3c[0][:, None], u3c[1][:, None]), R3))
            f1 = cmul((tauc[0][:, None], tauc[1][:, None]), wv)
            f2 = cmul((u2[0][:, None], u2[1][:, None]), f1)
            f3 = cmul((u3[0][:, None], u3[1][:, None]), f1)
            Rn = (jnp.stack([R1[0] - f1[0], R2[0] - f2[0], R3[0] - f3[0]], 1),
                  jnp.stack([R1[1] - f1[1], R2[1] - f2[1], R3[1] - f3[1]], 1))
            d = (d[0].at[rows3, :].set(Rn[0].reshape(-1, W)),
                 d[1].at[rows3, :].set(Rn[1].reshape(-1, W)))

            # right: cols ← cols (I − τ u uᴴ)  (wc = C u)
            def right_apply(m):
                C = tuple(jnp.take(mk, rows3, axis=1).reshape(W, nb, 3)
                          for mk in m)
                C1 = (C[0][:, :, 0], C[1][:, :, 0])
                C2 = (C[0][:, :, 1], C[1][:, :, 1])
                C3 = (C[0][:, :, 2], C[1][:, :, 2])
                wc = cadd3(C1, cmul((u2[0][None, :], u2[1][None, :]), C2),
                           cmul((u3[0][None, :], u3[1][None, :]), C3))
                g1 = cmul((tau[0][None, :], tau[1][None, :]), wc)
                g2 = cmul((u2c[0][None, :], u2c[1][None, :]), g1)
                g3 = cmul((u3c[0][None, :], u3c[1][None, :]), g1)
                Cn = (jnp.stack([C1[0] - g1[0], C2[0] - g2[0],
                                 C3[0] - g3[0]], 2),
                      jnp.stack([C1[1] - g1[1], C2[1] - g2[1],
                                 C3[1] - g3[1]], 2))
                return (m[0].at[:, rows3].set(Cn[0].reshape(W, -1)),
                        m[1].at[:, rows3].set(Cn[1].reshape(W, -1)))

            d = right_apply(d)
            u = right_apply(u)
            return d, u

        d, u = jax.lax.fori_loop(0, step, inner, (d, u))

        # far field: stripes via pair GEMMs, interior overwrite
        z = jnp.zeros_like(a)
        col = tuple(jax.lax.dynamic_slice(h, (z, a), (hp[0].shape[0], W))
                    for h in hp)
        colu = _pmm(col, u)
        hp = tuple(jax.lax.dynamic_update_slice(h, cu, (z, a))
                   for h, cu in zip(hp, colu))
        row = tuple(jax.lax.dynamic_slice(h, (a, z), (W, hp[0].shape[1]))
                    for h in hp)
        rowu = _pmm(u, row, adj_a=True)
        hp = tuple(jax.lax.dynamic_update_slice(h, ru, (a, z))
                   for h, ru in zip(hp, rowu))
        hp = tuple(jax.lax.dynamic_update_slice(h, dk, (a, a))
                   for h, dk in zip(hp, d))
        qcol = tuple(jax.lax.dynamic_slice(qk, (z, a), (qp[0].shape[0], W))
                     for qk in qp)
        qcu = _pmm(qcol, u)
        qp = tuple(jax.lax.dynamic_update_slice(qk, qu, (z, a))
                   for qk, qu in zip(qp, qcu))
        return hp, qp

    hp, qp = jax.lax.fori_loop(0, nchunks, chunk, (hp, qp))
    return hp, qp


def cadd2(a, b):
    return (a[0] + b[0], a[1] + b[1])


def cadd3(a, b, c):
    return (a[0] + b[0] + c[0], a[1] + b[1] + c[1])


# ---------------------------------------------------------------------------
# aggressive early deflation (pair field)
# ---------------------------------------------------------------------------


def _spike_householder_pair(w: int, s, k):
    """w×w unitary P = I − τ u uᴴ mapping the first k entries of the complex
    spike ``s`` to ‖·‖e₀ and fixing entries ≥ k (identity when k ≤ 0)."""
    rdt = s[0].dtype
    rows = jnp.arange(w, dtype=jnp.int32)
    zz = (jnp.zeros_like(s[0]), jnp.zeros_like(s[1]))
    sm = cwhere(rows < k, s, zz)
    alpha = (sm[0][0], sm[1][0])
    tail2 = jnp.sum(jnp.where(rows >= 1, cabs2(sm), 0))
    nrm = jnp.sqrt(cabs2(alpha) + tail2)
    is_id = ((tail2 == 0) & (alpha[1] == 0)) | (k <= 0)
    sign = jnp.where(alpha[0] >= 0, 1.0, -1.0)
    beta = -sign * nrm
    one = (jnp.ones((), rdt), jnp.zeros((), rdt))
    denom = cwhere(is_id, one, (alpha[0] - beta, alpha[1]))
    u = cwhere(rows >= 1, cdiv(sm, denom), zz)
    u = cwhere(is_id, zz, u)
    head = jnp.where(is_id, 0.0, 1.0).astype(rdt)
    u = (u[0].at[0].set(head), u[1].at[0].set(0.0))
    safe_b = jnp.where(is_id, jnp.ones_like(beta), beta)
    tau = ((beta - alpha[0]) / safe_b, -alpha[1] / safe_b)
    tau = cwhere(is_id, (jnp.zeros((), rdt), jnp.zeros((), rdt)), tau)
    # P = I − τ u uᴴ (dense w×w pair)
    uc = cconj(u)
    outer = cmul((u[0][:, None], u[1][:, None]), (uc[0][None, :], uc[1][None, :]))
    to = cmul(tau, outer)
    return (jnp.eye(w, dtype=rdt) - to[0], -to[1])


def _window_rehess_pair(t, v, k):
    """Masked complex Hessenberg reduction of the top-left k×k of the window
    pair ``t``, accumulating the right-applied similarity into ``v``."""
    w = t[0].shape[0]
    rdt = t[0].dtype
    rows = jnp.arange(w, dtype=jnp.int32)

    def body(j, st):
        t, v = st
        col = (t[0][:, j], t[1][:, j])
        below1 = (rows > j + 1) & (rows < k)
        is_head = rows == j + 1
        alpha = (jnp.sum(jnp.where(is_head, col[0], 0.0)),
                 jnp.sum(jnp.where(is_head, col[1], 0.0)))
        tail2 = jnp.sum(jnp.where(below1, cabs2(col), 0.0))
        nrm = jnp.sqrt(cabs2(alpha) + tail2)
        is_id = ((tail2 == 0) & (alpha[1] == 0)) | (j >= k - 2)
        sign = jnp.where(alpha[0] >= 0, 1.0, -1.0)
        beta = -sign * nrm
        one = (jnp.ones((), rdt), jnp.zeros((), rdt))
        denom = cwhere(is_id, one, (alpha[0] - beta, alpha[1]))
        zz = (jnp.zeros_like(col[0]), jnp.zeros_like(col[1]))
        u = cwhere(below1, cdiv(col, denom), zz)
        u = cwhere(is_id, zz, u)
        head = jnp.where(is_head & ~is_id, 1.0, 0.0).astype(rdt)
        u = (u[0] + head, u[1])
        safe_b = jnp.where(is_id, jnp.ones_like(beta), beta)
        tau = ((beta - alpha[0]) / safe_b, -alpha[1] / safe_b)
        tau = cwhere(is_id, (jnp.zeros((), rdt), jnp.zeros((), rdt)), tau)
        tauc = cconj(tau)
        uc = cconj(u)
        # t ← Hᴴ t H,  v ← v H   (H = I − τ u uᴴ)
        wv = _pmm((uc[0][None, :], uc[1][None, :]), t)       # uᴴ t (1×w)
        f = cmul(tauc, (u[0][:, None], u[1][:, None]))
        t = (t[0] - (f[0] * wv[0] - f[1] * wv[1]),
             t[1] - (f[0] * wv[1] + f[1] * wv[0]))
        wu = _pmm(t, (u[0][:, None], u[1][:, None]))         # t u (w×1)
        g = cmul(tau, wu)
        t = (t[0] - (g[0] * uc[0][None, :] - g[1] * uc[1][None, :]),
             t[1] - (g[0] * uc[1][None, :] + g[1] * uc[0][None, :]))
        vu = _pmm(v, (u[0][:, None], u[1][:, None]))
        gv = cmul(tau, vu)
        v = (v[0] - (gv[0] * uc[0][None, :] - gv[1] * uc[1][None, :]),
             v[1] - (gv[0] * uc[1][None, :] + gv[1] * uc[0][None, :]))
        return t, v

    return jax.lax.fori_loop(0, max(w - 2, 0), body, (t, v))


def _aed(hp, qp, hi, smlnum, *, off: int, w: int, ns: int,
         lahqr_sweeps: int):
    """AED on the window ``[hi−w+1, hi]`` (pair field): returns
    ``(hp, qp, nd, sb, pb)`` with complex shift quadratics."""
    rdt = hp[0].dtype
    eps = dtypes.eps(rdt)
    ws = off + hi - w + 1
    wm = tuple(jax.lax.dynamic_slice(h, (ws, ws), (w, w)) for h in hp)
    beta = (hp[0][ws, ws - 1], hp[1][ws, ws - 1])

    qeye = (jnp.eye(w, dtype=rdt), jnp.zeros((w, w), rdt))
    t, v, info = complex_schur_pair(wm, qeye, max_sweeps_factor=lahqr_sweeps)
    conv = info.converged

    # --- per-eigenvalue spike deflation (triangular T: no pair logic)
    diag = (jnp.diagonal(t[0]), jnp.diagonal(t[1]))
    dmag = cabs(diag)
    spike = cabs(beta) * cabs((v[0][0, :], v[1][0, :]))
    ok = (spike <= jnp.maximum(smlnum, eps * dmag)) & conv
    nd = jnp.sum(jnp.cumprod(ok[::-1].astype(jnp.int32))).astype(jnp.int32)
    k = w - nd

    # --- shifts: bottom ns kept eigenvalues
    start = jnp.maximum(k - ns, 0)
    erp = jnp.concatenate([diag[0], jnp.zeros((ns,), rdt)])
    eip = jnp.concatenate([diag[1], jnp.zeros((ns,), rdt)])
    ser = jax.lax.dynamic_slice(erp, (start,), (ns,))
    sei = jax.lax.dynamic_slice(eip, (start,), (ns,))
    s1 = (ser[0::2], sei[0::2])
    s2 = (ser[1::2], sei[1::2])
    sb = cadd2(s1, s2)
    pb = cmul(s1, s2)

    # --- restore Hessenberg form on the kept part
    # coupling column after the window similarity = Vᴴ (β e₀) = β·conj(V[0,:])
    spike_vec = cmul(beta, cconj((v[0][0, :], v[1][0, :])))
    p1 = _spike_householder_pair(w, spike_vec, k)
    t = _pmm(_pmm(p1, t, adj_a=True), p1)
    v = _pmm(v, p1)
    t, v = _window_rehess_pair(t, v, k)

    # --- write back
    z = jnp.zeros_like(ws)
    col = tuple(jax.lax.dynamic_slice(h, (z, ws), (hp[0].shape[0], w))
                for h in hp)
    colv = _pmm(col, v)
    hp = tuple(jax.lax.dynamic_update_slice(h, cv, (z, ws))
               for h, cv in zip(hp, colv))
    row = tuple(jax.lax.dynamic_slice(h, (ws, z), (w, hp[0].shape[1]))
                for h in hp)
    rowv = _pmm(v, row, adj_a=True)
    hp = tuple(jax.lax.dynamic_update_slice(h, rv, (ws, z))
               for h, rv in zip(hp, rowv))
    hp = tuple(jax.lax.dynamic_update_slice(h, tk, (ws, ws))
               for h, tk in zip(hp, t))
    rowsw = jnp.arange(w, dtype=jnp.int32)
    head = cmul(beta, cconj((v[0][0, 0], v[1][0, 0])))
    nsr = jnp.where(rowsw == 0, head[0], 0.0).astype(rdt)
    nsi = jnp.where(rowsw == 0, head[1], 0.0).astype(rdt)
    hp = (jax.lax.dynamic_update_slice(hp[0], nsr[:, None], (ws, ws - 1)),
          jax.lax.dynamic_update_slice(hp[1], nsi[:, None], (ws, ws - 1)))
    qcol = tuple(jax.lax.dynamic_slice(qk, (z, ws), (qp[0].shape[0], w))
                 for qk in qp)
    qcv = _pmm(qcol, v)
    qp = tuple(jax.lax.dynamic_update_slice(qk, qv, (z, ws))
               for qk, qv in zip(qp, qcv))
    return hp, qp, nd, sb, pb


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ns", "w", "max_rounds",
                                             "lahqr_sweeps"))
def multishift_complex_schur_pair(h, q, *, ns: int | None = None,
                                  w: int | None = None,
                                  max_rounds: int | None = None,
                                  lahqr_sweeps: int = 30):
    """Complex Schur of upper-Hessenberg pair ``h``: ``(t, q, info)`` with
    ``A = Q T Qᴴ``, T upper triangular — faer ``complex_schur.rs:631`` over
    split pairs with the batched multishift+AED execution strategy."""
    hr, hi_ = h
    n = hr.shape[0]
    rdt = hr.dtype
    eps = dtypes.eps(rdt)
    if ns is None or w is None:
        ns_a, w_a = _params_for(n)
        ns = ns if ns is not None else ns_a
        w = w if w is not None else w_a
    nb = ns // 2
    step = 3 * nb - 1
    if max_rounds is None:
        max_rounds = 30 * (n // ns + 2)
    pad = max(step + 3 * nb + 1, w) + 2
    off = pad
    np_ = n + 2 * pad

    hp = tuple(jax.lax.dynamic_update_slice(jnp.zeros((np_, np_), rdt),
                                            hk, (off, off)) for hk in (hr, hi_))
    qp = tuple(jax.lax.dynamic_update_slice(jnp.zeros((n, np_), rdt),
                                            qk, (0, off)) for qk in q)

    hnorm0 = jnp.maximum(jnp.max(jnp.abs(hr)), jnp.max(jnp.abs(hi_)))
    smlnum = eps * jnp.maximum(hnorm0,
                               jnp.asarray(dtypes.min_positive(rdt), rdt))
    idxn = jnp.arange(n - 1, dtype=jnp.int32)
    rows_p = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    sub_mask_p = rows_p == cols_p + 1

    def subdiag_mag(hp):
        return jnp.sqrt(jnp.diagonal(hp[0], -1) ** 2
                        + jnp.diagonal(hp[1], -1) ** 2)[off:off + n - 1]

    def body(state):
        hp, qp, hi, rounds, stall = state
        dmag = jnp.sqrt(jnp.diagonal(hp[0]) ** 2
                        + jnp.diagonal(hp[1]) ** 2)[off:off + n]
        sdmag = subdiag_mag(hp)
        tol = jnp.maximum(eps * (dmag[:-1] + dmag[1:]), smlnum)
        negligible = sdmag <= tol
        neg_p = jnp.zeros((np_,), bool).at[off:off + n - 1].set(negligible)
        kill = sub_mask_p & neg_p[cols_p]
        hp = tuple(jnp.where(kill, jnp.zeros((), rdt), hk) for hk in hp)
        sdz = jnp.where(negligible, jnp.zeros_like(sdmag), sdmag)
        kk = jnp.arange(n, dtype=jnp.int32)
        gather = jnp.where(hi - 1 - kk >= 0,
                           sdz[jnp.clip(hi - 1 - kk, 0, n - 2)] == 0,
                           False)
        run = jnp.sum(jnp.cumprod(gather.astype(jnp.int32))).astype(jnp.int32)
        hi = hi - run

        def active_case(ops):
            hp, qp, hi, stall = ops
            hp, qp, nd, sb, pb = _aed(hp, qp, hi, smlnum, off=off, w=w,
                                      ns=ns, lahqr_sweeps=lahqr_sweeps)
            hi2 = hi - nd
            stall2 = jnp.where(nd > 0, 0, stall + 1)
            exc = (stall2 % 6) == 5
            lam = (hp[0][off + hi2, off + hi2], hp[1][off + hi2, off + hi2])
            h21m = jnp.sqrt(hp[0][off + hi2, off + jnp.maximum(hi2 - 1, 0)] ** 2
                            + hp[1][off + hi2, off + jnp.maximum(hi2 - 1, 0)] ** 2)
            lam = (0.75 * h21m + lam[0], lam[1])
            jit_b = (1.0 + 0.02 * jnp.arange(nb, dtype=rdt))
            exr = 2.0 * lam[0] * jit_b
            exi = 2.0 * lam[1] * jit_b
            lj = (lam[0] * jit_b, lam[1] * jit_b)
            exp_ = cmul(lj, lj)
            sb = (jnp.where(exc, exr, sb[0]), jnp.where(exc, exi, sb[1]))
            pb = (jnp.where(exc, exp_[0], pb[0]), jnp.where(exc, exp_[1], pb[1]))
            sdz2 = subdiag_mag(hp)
            cand = jnp.where((idxn < hi2) & (sdz2 == 0), idxn + 1, 0)
            lo = jnp.max(cand).astype(jnp.int32)
            do_sweep = (nd * 100 < 14 * w) & (hi2 - lo >= 1)

            def run_sweep(ops2):
                hp, qp = ops2
                return _sweep(hp, qp, lo, hi2, sb, pb, off=off, n=n,
                              nb=nb, step=step)

            hp, qp = jax.lax.cond(do_sweep, run_sweep, lambda o: o, (hp, qp))
            return hp, qp, hi2, stall2

        hp, qp, hi, stall = jax.lax.cond(
            hi >= 1, active_case, lambda o: o, (hp, qp, hi, stall))
        return hp, qp, hi, rounds + 1, stall

    def cond(state):
        _, _, hi, rounds, _ = state
        return (hi >= 1) & (rounds < max_rounds)

    state = (hp, qp, jnp.asarray(n - 1, jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    hp, qp, hi, rounds, _ = jax.lax.while_loop(cond, body, state)

    t = tuple(jax.lax.dynamic_slice(hk, (off, off), (n, n)) for hk in hp)
    qout = tuple(jax.lax.dynamic_slice(qk, (0, off), (n, n)) for qk in qp)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # complex Schur is triangular: everything below the diagonal is converged
    # noise once hi < 1
    t = tuple(jnp.where(rows <= cols, tk, jnp.zeros((), rdt)) for tk in t)
    return t, qout, SpectralInfo(converged=hi < 1, iterations=rounds)
