"""Multishift QR with aggressive early deflation (AED) — large-matrix real
Schur.

Reference parity (SURVEY §2.4, VERDICT round-2 ask #2):
* ``faer/src/linalg/evd/schur/real_schur.rs:2117`` (``multishift_qr``) —
  small-bulge multishift sweeps with GEMM far-field updates;
* ``real_schur.rs:771`` (``aggressive_early_deflation``) — trailing window
  Schur + spike truncation + window re-Hessenberg;
* LAPACK analogues dlaqr0/dlaqr3/dlaqr5 for the shift counts, the NIBBLE
  sweep-skip rule, and exceptional shifts.

TPU-native design (NOT a translation):

* **Batched bulge chain.** The nb = ns/2 bulges of a sweep sit 3 rows apart,
  so their 3-row/3-column reflector applications touch *disjoint* index
  triples: one chase step advances every bulge simultaneously as a single
  batched gather → fused rank-1 → scatter, instead of nb sequential
  applications.  This is exact (not an approximation): left and right
  reflector products commute across disjoint triples, and a Householder
  reflector is invariant under scaling of its defining vector, which is the
  only cross-bulge effect within one step.
* **Windowed far field.** The chase runs inside a static W×W window carried
  in registers/VMEM while an accumulated orthogonal ``U`` is applied to the
  off-window row/column stripes as three full-stripe GEMMs on the MXU —
  the classic dlaqr5 structure, but with XLA-friendly static shapes
  (``dynamic_slice`` windows over a zero-padded carry).
* **Static-size AED window** at the dynamic block bottom: padding makes the
  spike read (``H[ws, ws-1]``) and the window-crosses-the-top cases uniform
  — a window top inside the zero padding simply reads a zero spike, which
  is exactly the semantics of a full-block deflation.  The window Schur is
  the existing lahqr-class :func:`~faer_tpu.linalg.real_schur.real_schur`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.linalg.real_schur import (
    real_schur as _lahqr,
    schur_eigenvalues_pair,
)
from faer_tpu.ops.matmul import matmul as _mm


def matmul(acc, a, b, **kw):
    """All GEMMs in this module are orthogonal-similarity updates applied
    O(rounds · n/step) times to the same data: the ~1e-5 relative error of
    the default TPU bf16x3 policy compounds across sweeps into O(1)
    eigenvalue error at n≈1024 (measured).  Pin full-f32 accumulation."""
    kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    return _mm(acc, a, b, **kw)


def _params_for(n: int) -> tuple[int, int]:
    """(ns, w): shift count and AED window size (LAPACK ISPEC=15 table)."""
    if n < 590:
        ns = 32
    elif n < 3000:
        ns = 64
    else:
        ns = 128
    return ns, (3 * ns) // 2


def _house3_batch(v1, v2, v3):
    """Batched branchless 3-vector Householder (see real_schur._house3)."""
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


# ---------------------------------------------------------------------------
# multishift sweep
# ---------------------------------------------------------------------------


def _sweep(hp, qp, lo, hi, sb, pb, *, off: int, n: int, nb: int, step: int):
    """One multishift sweep chasing ``nb`` bulges through the active block
    ``[lo, hi]`` of the padded Hessenberg ``hp`` (matrix at offset ``off``).

    ``sb``/``pb`` are the per-bulge shift-quadratic coefficients
    (x² − s·x + p from the shift pair).  Exact batched/windowed equivalent
    of the sequential Francis chase (see module docstring).
    """
    dtype = hp.dtype
    W = step + 3 * nb + 1
    bidx = jnp.arange(nb, dtype=jnp.int32)
    # local row index of bulge b at inner step tt: li_b = tt + 1 + 3(nb-1-b)
    li_base = 1 + 3 * (nb - 1 - bidx)                       # (nb,)
    r3 = jnp.arange(3, dtype=jnp.int32)

    total = hi - lo + 3 * nb            # masked upper bound on chase steps
    nchunks = (total + step - 1) // step

    def chunk(c, st):
        hp, qp = st
        t0 = c * step
        a = off + lo + t0 - 3 * (nb - 1) - 1    # window start (padded coords)
        d = jax.lax.dynamic_slice(hp, (a, a), (W, W))
        u = jnp.eye(W, dtype=dtype)

        def inner(tt, st2):
            d, u = st2
            t = t0 + tt
            ib = lo + t - 3 * bidx                           # global positions
            li = tt + li_base                                # local positions
            active = (t - 3 * bidx >= 0) & (ib <= hi - 1)
            intro = ib == lo

            # reflector sources: shift-polynomial column at introduction,
            # current bulge column otherwise
            d11 = d[li, li]
            d12 = d[li, li + 1]
            d21 = d[li + 1, li]
            d22 = d[li + 1, li + 1]
            d32 = d[li + 2, li + 1]
            pv1 = d11 * d11 + d12 * d21 - sb * d11 + pb
            pv2 = d21 * (d11 + d22 - sb)
            pv3 = d21 * d32
            cv1 = d[li, li - 1]
            cv2 = d[li + 1, li - 1]
            cv3 = d[li + 2, li - 1]
            v1 = jnp.where(intro, pv1, cv1)
            v2 = jnp.where(intro, pv2, cv2)
            v3 = jnp.where(intro, pv3, cv3)
            v3 = jnp.where(ib == hi - 1, jnp.zeros_like(v3), v3)
            # scale-invariance of the reflector: normalize for safety
            scale = jnp.maximum(
                jnp.maximum(jnp.abs(v1), jnp.abs(v2)), jnp.abs(v3))
            scale = jnp.where(scale == 0, jnp.ones_like(scale), scale)
            tau, u2, u3 = _house3_batch(v1 / scale, v2 / scale, v3 / scale)
            tau = jnp.where(active, tau, jnp.zeros_like(tau))

            rows3 = (li[:, None] + r3[None, :]).reshape(-1)   # (3·nb,)
            # left: rows li..li+2 of the window
            R = jnp.take(d, rows3, axis=0).reshape(nb, 3, W)
            wv = R[:, 0] + u2[:, None] * R[:, 1] + u3[:, None] * R[:, 2]
            R = R - tau[:, None, None] * jnp.stack(
                [wv, u2[:, None] * wv, u3[:, None] * wv], axis=1)
            d = d.at[rows3, :].set(R.reshape(-1, W))
            # right: cols li..li+2 of the window (same triples)
            C = jnp.take(d, rows3, axis=1).reshape(W, nb, 3)
            wc = C[:, :, 0] + u2[None, :] * C[:, :, 1] + u3[None, :] * C[:, :, 2]
            C = C - tau[None, :, None] * jnp.stack(
                [wc, u2[None, :] * wc, u3[None, :] * wc], axis=2)
            d = d.at[:, rows3].set(C.reshape(W, -1))
            # accumulate U (right-applies only)
            Cu = jnp.take(u, rows3, axis=1).reshape(W, nb, 3)
            wu = Cu[:, :, 0] + u2[None, :] * Cu[:, :, 1] + u3[None, :] * Cu[:, :, 2]
            Cu = Cu - tau[None, :, None] * jnp.stack(
                [wu, u2[None, :] * wu, u3[None, :] * wu], axis=2)
            u = u.at[:, rows3].set(Cu.reshape(W, -1))
            return d, u

        d, u = jax.lax.fori_loop(0, step, inner, (d, u))

        # far field: full-stripe GEMMs (col stripe then row stripe), then
        # overwrite the interior with the in-window result
        col = jax.lax.dynamic_slice(hp, (jnp.zeros_like(a), a), (hp.shape[0], W))
        hp = jax.lax.dynamic_update_slice(hp, matmul(None, col, u), (jnp.zeros_like(a), a))
        row = jax.lax.dynamic_slice(hp, (a, jnp.zeros_like(a)), (W, hp.shape[1]))
        hp = jax.lax.dynamic_update_slice(hp, matmul(None, u.T, row), (a, jnp.zeros_like(a)))
        hp = jax.lax.dynamic_update_slice(hp, d, (a, a))
        qcol = jax.lax.dynamic_slice(qp, (jnp.zeros_like(a), a), (qp.shape[0], W))
        qp = jax.lax.dynamic_update_slice(qp, matmul(None, qcol, u), (jnp.zeros_like(a), a))
        return hp, qp

    hp, qp = jax.lax.fori_loop(0, nchunks, chunk, (hp, qp))
    return hp, qp


# ---------------------------------------------------------------------------
# aggressive early deflation
# ---------------------------------------------------------------------------


def _spike_householder(w: int, s, k):
    """Full ``w×w`` Householder mapping the first ``k`` entries of ``s`` to
    ``±‖s[0:k)‖·e0`` and fixing entries ≥ k (identity when k == 0)."""
    dtype = s.dtype
    rows = jnp.arange(w, dtype=jnp.int32)
    sm = jnp.where(rows < k, s, jnp.zeros_like(s))
    alpha = sm[0]
    tail2 = jnp.sum(jnp.where(rows >= 1, sm * sm, 0))
    nrm = jnp.sqrt(alpha * alpha + tail2)
    is_id = (tail2 == 0) | (k <= 0)
    beta = jnp.where(alpha >= 0, -nrm, nrm)
    denom = jnp.where(is_id, jnp.ones_like(alpha), alpha - beta)
    u = jnp.where(rows >= 1, sm / denom, jnp.zeros_like(sm))
    u = jnp.where(is_id, jnp.zeros_like(u), u).at[0].set(
        jnp.where(is_id, 0.0, 1.0).astype(dtype))
    safe_beta = jnp.where(is_id, jnp.ones_like(beta), beta)
    tau = jnp.where(is_id, jnp.zeros_like(beta), (beta - alpha) / safe_beta)
    p = jnp.eye(w, dtype=dtype) - tau * u[:, None] * u[None, :]
    return p


def _window_rehess(t, v, k):
    """Masked Hessenberg reduction of the top-left ``k×k`` of the window
    ``t`` (entries ≥ k fixed), accumulating the similarity into ``v``."""
    w = t.shape[0]
    dtype = t.dtype
    rows = jnp.arange(w, dtype=jnp.int32)

    def body(j, st):
        t, v = st
        col = t[:, j]
        below1 = (rows > j + 1) & (rows < k)
        head = jnp.sum(jnp.where(rows == j + 1, col, jnp.zeros_like(col)))
        tail2 = jnp.sum(jnp.where(below1, col * col, 0))
        nrm = jnp.sqrt(head * head + tail2)
        is_id = (tail2 == 0) | (j >= k - 2)
        beta = jnp.where(head >= 0, -nrm, nrm)
        denom = jnp.where(is_id, jnp.ones_like(head), head - beta)
        u = jnp.where(below1, col / denom, jnp.zeros_like(col))
        u = u + jnp.where((rows == j + 1) & ~is_id,
                          jnp.ones_like(col), jnp.zeros_like(col))
        safe_beta = jnp.where(is_id, jnp.ones_like(beta), beta)
        tau = jnp.where(is_id, jnp.zeros_like(beta), (beta - head) / safe_beta)
        # t ← Hᵀ t H,  v ← v H  (H = I − τ u uᵀ, symmetric)
        wv = matmul(None, u[None, :], t)[0]
        t = t - tau * u[:, None] * wv[None, :]
        wu = matmul(None, t, u[:, None])[:, 0]
        t = t - tau * wu[:, None] * u[None, :]
        vu = matmul(None, v, u[:, None])[:, 0]
        v = v - tau * vu[:, None] * u[None, :]
        return t, v

    return jax.lax.fori_loop(0, max(w - 2, 0), body, (t, v))


def _aed(hp, qp, hi, smlnum, *, off: int, w: int, ns: int,
         lahqr_sweeps: int):
    """Aggressive early deflation on the window ``[hi-w+1, hi]``.

    Returns ``(hp, qp, nd, sb, pb)``: deflation count and per-bulge shift
    quadratics for a following sweep.
    """
    dtype = hp.dtype
    eps = dtypes.eps(dtype)
    nb = ns // 2
    ws = off + hi - w + 1
    wm = jax.lax.dynamic_slice(hp, (ws, ws), (w, w))
    beta = hp[ws, ws - 1]

    t, v, info = _lahqr(wm, jnp.eye(w, dtype=dtype),
                        max_sweeps_factor=lahqr_sweeps)
    conv = info.converged

    # --- spike-truncation deflation count (trailing run, block-atomic)
    er, ei = schur_eigenvalues_pair(t)
    sd = jnp.diagonal(t, -1)                                  # (w-1,)
    spike = jnp.abs(beta * v[0, :])                           # (w,)
    dmag = jnp.abs(jnp.diagonal(t))
    is_top = jnp.concatenate([sd != 0, jnp.zeros((1,), bool)])
    is_bot = jnp.concatenate([jnp.zeros((1,), bool), sd != 0])
    spk_next = jnp.concatenate([spike[1:], jnp.zeros((1,), spike.dtype)])
    spk_prev = jnp.concatenate([jnp.zeros((1,), spike.dtype), spike[:-1]])
    pair_spk = jnp.where(is_top, jnp.maximum(spike, spk_next),
                         jnp.maximum(spike, spk_prev))
    sup = jnp.diagonal(t, 1)
    m2 = jnp.maximum(jnp.maximum(dmag[:-1], dmag[1:]),
                     jnp.maximum(jnp.abs(sup), jnp.abs(sd)))
    mag_top = jnp.concatenate([m2, dmag[-1:]])
    mag_bot = jnp.concatenate([dmag[:1], m2])
    mag = jnp.where(is_top, mag_top, jnp.where(is_bot, mag_bot, dmag))
    ok1 = spike <= jnp.maximum(smlnum, eps * dmag)
    ok2 = pair_spk <= jnp.maximum(smlnum, eps * mag)
    ok = jnp.where(is_top | is_bot, ok2, ok1) & conv
    nd = jnp.sum(jnp.cumprod(ok[::-1].astype(jnp.int32))).astype(jnp.int32)
    k = w - nd

    # --- shifts: the bottom-most ns kept eigenvalues (conjugate pairs stay
    # adjacent; a straddled pair shifts the selection up by one)
    start = jnp.maximum(k - ns, 0)
    sd_at = jnp.concatenate([jnp.zeros((1,), sd.dtype), sd])   # sd_at[i]=t[i,i-1]
    straddle = sd_at[start] != 0
    start = jnp.maximum(start - straddle.astype(jnp.int32), 0)
    erp = jnp.concatenate([er, jnp.zeros((ns,), er.dtype)])
    eip = jnp.concatenate([ei, jnp.zeros((ns,), ei.dtype)])
    ser = jax.lax.dynamic_slice(erp, (start,), (ns,))
    sei = jax.lax.dynamic_slice(eip, (start,), (ns,))
    sb = ser[0::2] + ser[1::2]
    pb = ser[0::2] * ser[1::2] - sei[0::2] * sei[1::2]
    del nb

    # --- restore Hessenberg form on the kept part
    spike_vec = beta * v[0, :]
    p1 = _spike_householder(w, spike_vec, k)
    t = matmul(None, matmul(None, p1.T, t), p1)
    v = matmul(None, v, p1)
    t, v = _window_rehess(t, v, k)

    # --- write back: stripes, interior, spike column
    col = jax.lax.dynamic_slice(hp, (jnp.zeros_like(ws), ws), (hp.shape[0], w))
    hp = jax.lax.dynamic_update_slice(hp, matmul(None, col, v), (jnp.zeros_like(ws), ws))
    row = jax.lax.dynamic_slice(hp, (ws, jnp.zeros_like(ws)), (w, hp.shape[1]))
    hp = jax.lax.dynamic_update_slice(hp, matmul(None, v.T, row), (ws, jnp.zeros_like(ws)))
    hp = jax.lax.dynamic_update_slice(hp, t, (ws, ws))
    rowsw = jnp.arange(w, dtype=jnp.int32)
    newspike = jnp.where(rowsw == 0, beta * v[0, 0], jnp.zeros((w,), dtype))
    hp = jax.lax.dynamic_update_slice(hp, newspike[:, None], (ws, ws - 1))
    qcol = jax.lax.dynamic_slice(qp, (jnp.zeros_like(ws), ws), (qp.shape[0], w))
    qp = jax.lax.dynamic_update_slice(qp, matmul(None, qcol, v), (jnp.zeros_like(ws), ws))
    return hp, qp, nd, sb, pb


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ns", "w", "max_rounds",
                                             "lahqr_sweeps"))
def multishift_real_schur(h, q, *, ns: int | None = None, w: int | None = None,
                          max_rounds: int | None = None,
                          lahqr_sweeps: int = 30):
    """Real Schur form of upper-Hessenberg ``h`` via multishift QR + AED:
    returns ``(t, q, info)`` with ``A = Q T Qᵀ``, ``T`` quasi-triangular.

    faer ``multishift_qr`` + ``aggressive_early_deflation``
    (``real_schur.rs:2117/:771``); the TPU-native batched/windowed execution
    strategy is described in the module docstring.
    """
    n = h.shape[0]
    dtype = h.dtype
    eps = dtypes.eps(dtype)
    rdt = dtypes.real_dtype_of(dtype)
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

    hp = jnp.zeros((n + 2 * pad, n + 2 * pad), dtype)
    hp = jax.lax.dynamic_update_slice(hp, h, (off, off))
    qp = jnp.zeros((n, n + 2 * pad), dtype)
    qp = jax.lax.dynamic_update_slice(qp, q, (0, off))

    hnorm0 = jnp.max(jnp.abs(h))
    smlnum = eps * jnp.maximum(hnorm0, jnp.asarray(dtypes.min_positive(rdt), rdt))
    idxn = jnp.arange(n - 1, dtype=jnp.int32)
    rows_p = jax.lax.broadcasted_iota(jnp.int32, hp.shape, 0)
    cols_p = jax.lax.broadcasted_iota(jnp.int32, hp.shape, 1)
    sub_mask_p = rows_p == cols_p + 1

    def body(state):
        hp, qp, hi, rounds, stall = state
        # --- zero negligible subdiagonals (matrix region only), move hi past
        # any trailing exact-zero couplings
        dfull = jnp.diagonal(hp)[off:off + n]
        sdfull = jnp.diagonal(hp, -1)[off:off + n - 1]
        tol = jnp.maximum(eps * (jnp.abs(dfull[:-1]) + jnp.abs(dfull[1:])), smlnum)
        negligible = jnp.abs(sdfull) <= tol
        neg_p = jnp.zeros((hp.shape[1],), bool).at[off:off + n - 1].set(negligible)
        hp = jnp.where(sub_mask_p & neg_p[cols_p], jnp.zeros((), dtype), hp)
        sdz = jnp.where(negligible, jnp.zeros_like(sdfull), sdfull)
        # trailing zero-coupling run below hi: hi ← hi − run
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
            # exceptional shifts on long stalls (LAPACK dlaqr0 KEXSH rhythm)
            exc = (stall2 % 6) == 5
            h11 = hp[off + hi2, off + hi2]
            h21 = jnp.abs(hp[off + hi2, off + jnp.maximum(hi2 - 1, 0)])
            lam = 0.75 * h21 + h11
            jit_b = (1.0 + 0.02 * jnp.arange(nb, dtype=rdt)).astype(dtype)
            sb = jnp.where(exc, 2.0 * lam * jit_b, sb)
            pb = jnp.where(exc, (lam * jit_b) ** 2, pb)
            # sweep unless AED deflated a NIBBLE-worth of the window
            sdz2 = jnp.diagonal(hp, -1)[off:off + n - 1]
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

    t = jax.lax.dynamic_slice(hp, (off, off), (n, n))
    qout = jax.lax.dynamic_slice(qp, (0, off), (n, n))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    t = jnp.where(rows <= cols + 1, t, jnp.zeros((), dtype))
    d = jnp.diagonal(t)
    sd = jnp.diagonal(t, -1)
    tol = jnp.maximum(eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:])), smlnum)
    neg = jnp.zeros((n,), bool).at[: n - 1].set(jnp.abs(sd) <= tol)
    t = jnp.where((rows == cols + 1) & neg[cols], jnp.zeros((), dtype), t)
    return t, qout, SpectralInfo(converged=hi < 1, iterations=rounds)
