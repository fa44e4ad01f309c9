"""Eigendecompositions: self-adjoint (tridiag + implicit QR) and general
(Hessenberg + shifted QR → Schur → eigenvectors).

Reference parity (SURVEY §2.4):
* self-adjoint — ``faer/src/linalg/evd/mod.rs:270`` (``self_adjoint_evd``):
  tridiagonalize → tridiag EVD → back-transform; eigenvalues ascending;
* general — ``evd/mod.rs:1180,1213`` (``evd_cplx/evd_real``): Hessenberg
  reduction (``hessenberg.rs:549``) → QR iteration to Schur form
  (``schur/{real,complex}_schur.rs``) → triangular eigenvector solve
  (``evd/mod.rs:670-882``).

TPU-native design: real inputs run the REAL Francis double-shift path
(``real_schur.py`` — quasi-triangular Schur form, eigenvalues/eigenvectors as
(re, im) pairs so everything executes on this complex-free TPU runtime);
complex inputs use the uniform complex single-shift QR path below.  Both
eigenvector phases are one batched ``lax.scan`` (``eigvec.py``), not a
per-column trace-time loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.core.flags import Side
from faer_tpu.linalg.tridiag import tridiag_apply_q, tridiag_in_place
from faer_tpu.linalg.tridiag_evd import tridiag_evd
from faer_tpu.ops.matmul import matmul


@jax.jit
def self_adjoint_evd(a):
    """Full self-adjoint EVD of the lower triangle of ``a``.

    Returns ``(w, v, info)`` with ``A = V diag(w) Vᴴ``, w real ascending.
    faer ``self_adjoint_evd`` (``evd/mod.rs:270``).
    """
    n = a.shape[0]
    full = jnp.tril(a) + jnp.conj(jnp.tril(a, -1)).T
    d, e, hh, taus = tridiag_in_place(full)
    w, z, info = tridiag_evd(d, e, want_vectors=True)
    v = tridiag_apply_q(hh, taus, z.astype(a.dtype))
    return w, v, info


def self_adjoint_eigenvalues(a, side: Side = Side.LOWER):
    a = a if side is Side.LOWER else jnp.conj(a).T
    n = a.shape[0]
    full = jnp.tril(a) + jnp.conj(jnp.tril(a, -1)).T
    d, e, _, _ = tridiag_in_place(full)
    w, _, _ = tridiag_evd(d, e, want_vectors=False)
    return w


def self_adjoint_pseudoinverse(a, tol=None):
    """Pseudo-inverse via self-adjoint EVD (faer ``evd/pseudoinverse.rs``)."""
    w, v, _ = self_adjoint_evd(a)
    aw = jnp.abs(w)
    if tol is None:
        tol = jnp.max(aw) * a.shape[0] * dtypes.eps(a.dtype)
    winv = jnp.where(aw > tol, 1.0 / jnp.where(w == 0, jnp.ones_like(w), w), jnp.zeros_like(w))
    return matmul(None, v * winv[None, :].astype(v.dtype), jnp.conj(v).T)


# ---------------------------------------------------------------------------
# Hessenberg reduction (complex path)
# ---------------------------------------------------------------------------

@jax.jit
def hessenberg_in_place(a):
    """Unitary reduction to upper Hessenberg: returns ``(h, q)`` with
    ``A = Q H Qᴴ``. faer ``hessenberg_in_place`` (``hessenberg.rs:549``);
    unblocked masked fori (blocked panel variant is the perf upgrade).
    """
    n = a.shape[0]
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    q = jnp.eye(n, dtype=dtype)
    if n <= 2:
        return a, q

    def body(j, state):
        a, q = state
        col = a[:, j]
        below1 = rows > j + 1
        head = jnp.where(rows == j + 1, col, jnp.zeros_like(col))
        alpha = jnp.sum(head)
        tail_sq = jnp.sum(jnp.where(below1, jnp.abs(col).astype(rdt) ** 2, 0))
        norm = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
        sign = jnp.where(jnp.real(alpha) >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
        beta = (-sign * norm).astype(dtype)
        if dtypes.is_complex(dtype):
            is_id = (tail_sq == 0) & (jnp.imag(alpha) == 0)
        else:
            is_id = tail_sq == 0
        s = alpha - beta
        safe_s = jnp.where(is_id, jnp.ones((), dtype), s)
        safe_b = jnp.where(is_id, jnp.ones((), dtype), beta)
        tau = jnp.where(is_id, jnp.zeros((), dtype), (beta - alpha) / safe_b)
        v = jnp.where(below1, col / safe_s, jnp.zeros_like(col))
        v = jnp.where(is_id, jnp.zeros_like(v), v)
        v = v + jnp.where(rows == j + 1, jnp.ones_like(v), jnp.zeros_like(v))
        # A ← Hᴴ A H,  H = I − τ v vᴴ
        w = matmul(None, jnp.conj(v)[None, :], a)[0]        # vᴴ A
        a = a - jnp.conj(tau) * v[:, None] * w[None, :]
        u = matmul(None, a, v[:, None])[:, 0]               # A v
        a = a - tau * u[:, None] * jnp.conj(v)[None, :]
        # Q ← Q H
        uq = matmul(None, q, v[:, None])[:, 0]
        q = q - tau * uq[:, None] * jnp.conj(v)[None, :]
        return a, q

    a, q = jax.lax.fori_loop(0, n - 2, body, (a, q))
    # zero below the first subdiagonal exactly
    mask = (rows[:, None] - rows[None, :]) <= 1
    a = jnp.where(mask, a, jnp.zeros((), dtype))
    return a, q


def _hess_panel(t, bw: int):
    """lahr2-style Hessenberg panel on trailing block ``t`` (m×m): ``bw``
    reflectors with DEFERRED two-sided updates.  Maintains
    ``P = Vᴴ A0`` (two matvecs per step are the only O(m²) work) and the
    compact-WY ``T`` so the virtually-updated matrix is
    ``A = A0 − V (TᴴP) − (RT) Vᴴ + V (Tᴴ (PV) T) Vᴴ`` with ``R = A0 V``.
    Returns (V, T, P, R, e_p) — e_p holds the subdiagonal betas; the caller
    materializes the trailing update and the Hessenberg columns."""
    m = t.shape[0]
    dtype = t.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)[0]

    def body(i, st):
        v_p, t_p, p_p, r_p, pv, e_p = st
        # virtual column i
        col = jax.lax.dynamic_slice(t, (0, i), (m, 1))[:, 0]
        pcol = jax.lax.dynamic_slice(p_p, (0, i), (bw, 1))      # P[:, i]
        vrow = jnp.conj(jax.lax.dynamic_slice(v_p, (i, 0), (1, bw))[0])[:, None]
        th = jnp.conj(t_p).T
        c = col - matmul(None, v_p, matmul(None, th, pcol))[:, 0]
        c = c - matmul(None, r_p, matmul(None, t_p, vrow))[:, 0]
        c = c + matmul(None, v_p, matmul(None, th, matmul(
            None, pv, matmul(None, t_p, vrow))))[:, 0]
        # Householder pivoting at row i+1
        below1 = rows > i + 1
        head = jnp.where(rows == i + 1, c, jnp.zeros_like(c))
        alpha = jnp.sum(head)
        tail_sq = jnp.sum(jnp.where(below1, jnp.abs(c).astype(rdt) ** 2, 0))
        norm = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
        sign = jnp.where(jnp.real(alpha) >= 0, jnp.ones((), rdt),
                         -jnp.ones((), rdt))
        beta = (-sign * norm).astype(dtype)
        if dtypes.is_complex(dtype):
            is_id = (tail_sq == 0) & (jnp.imag(alpha) == 0)
        else:
            is_id = tail_sq == 0
        s = alpha - beta
        safe_s = jnp.where(is_id, jnp.ones((), dtype), s)
        safe_b = jnp.where(is_id, jnp.ones((), dtype), beta)
        tau = jnp.where(is_id, jnp.zeros((), dtype), (beta - alpha) / safe_b)
        beta = jnp.where(is_id, alpha, beta)
        v = jnp.where(below1, c / safe_s, jnp.zeros_like(c))
        v = jnp.where(is_id, jnp.zeros_like(v), v)
        v = v + jnp.where(rows == i + 1, jnp.ones_like(v), jnp.zeros_like(v))
        # grow T: T ← [[T, −τ T (Vᴴ v)], [0, τ]]
        vhv = matmul(None, jnp.conj(v_p).T, v[:, None])          # (bw, 1)
        tcol = (-tau) * matmul(None, t_p, vhv)[:, 0]
        live = cols_b == i
        t_p = jnp.where(live[None, :],
                        tcol[:, None] + jnp.where(cols_b[:, None] == i,
                                                  tau, 0.0).astype(dtype),
                        t_p)
        # grow P, R, PV with the only O(m²) work: two matvecs against A0
        p_new = matmul(None, jnp.conj(v)[None, :], t)[0]         # vᴴ A0
        r_new = matmul(None, t, v[:, None])[:, 0]                # A0 v
        p_p = jnp.where(live[:, None], p_new[None, :], p_p)
        r_p = jnp.where(live[None, :], r_new[:, None], r_p)
        # PV ← Vᴴ A0 V: new row = vᴴ A0 V (from p_new), new col = P v
        pv_row = matmul(None, p_new[None, :], v_p)[0]
        pv_col = matmul(None, p_p, v[:, None])[:, 0]
        pv = jnp.where(live[:, None], pv_row[None, :], pv)
        pv = jnp.where(live[None, :], pv_col[:, None], pv)
        e_p = e_p.at[i].set(beta)
        v_p = jnp.where(live[None, :], v[:, None], v_p)
        return v_p, t_p, p_p, r_p, pv, e_p

    st0 = (jnp.zeros((m, bw), dtype), jnp.zeros((bw, bw), dtype),
           jnp.zeros((bw, m), dtype), jnp.zeros((m, bw), dtype),
           jnp.zeros((bw, bw), dtype), jnp.zeros((bw,), dtype))
    v_p, t_p, p_p, r_p, pv, e_p = jax.lax.fori_loop(0, bw, body, st0)
    return v_p, t_p, p_p, r_p, pv, e_p


@functools.partial(jax.jit, static_argnames=("block",))
def hessenberg_blocked(a, *, block: int = 96):
    """Blocked Hessenberg reduction: same contract as
    ``hessenberg_in_place`` (faer's blocked ``hessenberg.rs:549``).  Panels
    defer the two-sided updates (two matvecs per column); trailing blocks and
    the Q accumulation are compact-WY GEMMs on the MXU."""
    from faer_tpu.ops.householder import apply_block_on_left, apply_block_on_right

    n = a.shape[0]
    dtype = a.dtype
    if n <= max(2 * block, 192):
        return hessenberg_in_place(a)
    panels = []
    h = a
    j0 = 0
    while n - j0 > 2 * block:
        bw = block
        m = n - j0
        t = h[j0:, j0:]
        v_p, t_p, p_p, r_p, pv, e_p = _hess_panel(t, bw)
        # materialize A1 = (I − V T Vᴴ)ᴴ A0 (I − V T Vᴴ) on the trailing block
        th = jnp.conj(t_p).T
        w_full = matmul(None, th, p_p)                 # Tᴴ Vᴴ A0   (bw, m)
        y_full = matmul(None, r_p, t_p)                # A0 V T     (m, bw)
        cross = matmul(None, th, matmul(None, pv, t_p))
        t_new = t - matmul(None, v_p, w_full) - matmul(
            None, y_full - matmul(None, v_p, cross), jnp.conj(v_p).T)
        # right-update the strip ABOVE the trailing block: A[:j0, j0:] H
        strip = apply_block_on_right(v_p, t_p, h[:j0, j0:], adjoint=False)
        h = h.at[:j0, j0:].set(strip)
        # overwrite the panel's Hessenberg columns exactly: head rows from
        # the virtual columns, beta on the subdiagonal, zeros below
        rows_loc = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
        cols_loc = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)[0]
        keep = rows_loc[:, None] <= cols_loc[None, :]
        sub = rows_loc[:, None] == cols_loc[None, :] + 1
        hcols = jnp.where(keep, t_new[:, :bw], 0) + jnp.where(
            sub, e_p[None, :], 0)
        t_new = t_new.at[:, :bw].set(hcols)
        h = h.at[j0:, j0:].set(t_new)
        panels.append((j0, v_p, t_p))
        j0 += bw
    h_t, q_t = hessenberg_in_place(h[j0:, j0:])
    h = h.at[j0:, j0:].set(h_t)
    # the tail's similarity also right-updates the strip above it
    h = h.at[:j0, j0:].set(matmul(None, h[:j0, j0:], q_t))
    # Q = (panel blocks) · Q_tail, applied to identity via compact-WY GEMMs
    q = jnp.zeros((n, n), dtype).at[j0:, j0:].set(q_t)
    q = q.at[jnp.arange(j0), jnp.arange(j0)].set(1.0)
    for pj0, v_p, t_p in reversed(panels):
        qsub = apply_block_on_left(v_p, t_p, q[pj0:, :], adjoint=False)
        q = q.at[pj0:, :].set(qsub)
    return h, q


# ---------------------------------------------------------------------------
# complex Schur via single-shift implicit QR
# ---------------------------------------------------------------------------

def _cgivens(x, z):
    """Complex Givens: c real, s complex with Gᴴ[x, z]ᵀ = [r, 0]ᵀ,
    G = [[c, −s̄], [s, c]]."""
    ax = jnp.abs(x)
    az = jnp.abs(z)
    r = jnp.sqrt(ax * ax + az * az)
    safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
    c = jnp.where(r == 0, jnp.ones_like(ax), ax / safe_r)
    safe_ax = jnp.where(ax == 0, jnp.ones_like(ax), ax)
    phase = jnp.where(ax == 0, jnp.ones_like(x), x / safe_ax.astype(x.dtype))
    s = jnp.where(r == 0, jnp.zeros_like(z),
                  jnp.conj(phase) * z / safe_r.astype(x.dtype))
    rr = phase * r.astype(x.dtype)
    rr = jnp.where(az == 0, x, rr)
    c = jnp.where(az == 0, jnp.ones_like(c), c)
    s = jnp.where(az == 0, jnp.zeros_like(s), s)
    return c, s, rr


def complex_schur(h, q, *, max_sweeps_factor: int = 30):
    """Schur form of upper-Hessenberg ``h``: returns (t, q, info) with
    ``A = Q T Qᴴ``, T upper triangular. Single-shift (Wilkinson) implicit QR
    with masked deflation in a ``while_loop``
    (faer ``complex_schur.rs:631`` structure, without AED).
    """
    n = h.shape[0]
    dtype = h.dtype
    rdt = dtypes.real_dtype_of(dtype)
    eps = dtypes.eps(dtype)
    if n == 1:
        return h, q, SpectralInfo(converged=jnp.ones((), bool), iterations=jnp.zeros((), jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    max_iters = max_sweeps_factor * n

    def subdiag(h):
        return jnp.diagonal(h, -1)

    # Absolute deflation floor at eps·‖H‖ (a backward-stable perturbation):
    # the relative-only criterion never fires when the adjacent diagonal
    # entries are small, and the loop spins to max_iters on a numerically
    # converged subdiagonal (observed: |h[i+1,i]| ~ 1e-15 next to ~1e-3 diag)
    hnorm0 = jnp.max(jnp.abs(h))
    smlnum = eps * jnp.maximum(hnorm0, jnp.asarray(dtypes.min_positive(rdt), rdt))
    # dtype-aware cap: loosened floor stays <= sqrt(eps)*||H||
    _stall_cap = dtypes.deflation_stall_cap(rdt)

    def body(state):
        h, q, hi, it, stall = state
        # hi = index of the current active block's end (eigenvalue being worked)
        sd = subdiag(h)
        dmag = jnp.abs(jnp.diagonal(h))
        # progressive deflation floor (see real_schur.py): guarantees
        # progress on stuck interior couplings; resets with the stall counter
        floor = smlnum * (2.0 ** jnp.minimum(stall // 5, _stall_cap))
        tol = jnp.maximum(eps * (dmag[:-1] + dmag[1:]), floor)
        negligible = jnp.abs(sd) <= tol
        # deflate: while sd[hi-1] negligible → hi -= 1 (do one per iteration)
        can_deflate = (hi > 0) & negligible[jnp.maximum(hi - 1, 0)]

        def deflate(ops):
            h, q = ops
            return h, q

        def do_sweep(ops):
            h, q = ops
            # lo = start of unreduced block ending at hi: largest l ≤ hi with
            # negligible sd[l-1] (or 0)
            cand = jnp.where((idx < hi) & negligible, idx + 1, 0)
            lo = jnp.max(cand).astype(jnp.int32)
            # Wilkinson shift from trailing 2×2 [hi-1, hi]
            a11 = h[hi - 1, hi - 1]
            a12 = h[hi - 1, hi]
            a21 = h[hi, hi - 1]
            a22 = h[hi, hi]
            tr = a11 + a22
            det = a11 * a22 - a12 * a21
            disc = jnp.sqrt(tr * tr - 4 * det)
            r1 = (tr + disc) / 2
            r2 = (tr - disc) / 2
            mu = jnp.where(jnp.abs(r1 - a22) < jnp.abs(r2 - a22), r1, r2)
            # exceptional shift every 10 stalled sweeps (repeated/clustered
            # eigenvalues stagnate the Wilkinson shift — LAPACK zlahqr trick)
            exc = a22 + 0.75 * jnp.abs(a21).astype(dtype)
            mu = jnp.where((stall % 10) == 9, exc, mu)
            x0 = h[lo, lo] - mu
            z0 = h[lo + 1, lo]

            def chase(i, st):
                h, q, x, z = st
                active = (i >= lo) & (i < hi)
                c, s, _ = _cgivens(x, z)
                c = jnp.where(active, c, jnp.ones_like(c))
                s = jnp.where(active, s, jnp.zeros_like(s))
                cc = c.astype(dtype)
                # rows i, i+1: Gᴴ from the left: row_i' = c·row_i + s̄·row_{i+1}
                ri = h[i, :]
                rip1 = h[i + 1, :]
                h = h.at[i, :].set(cc * ri + jnp.conj(s) * rip1)
                h = h.at[i + 1, :].set(-s * ri + cc * rip1)
                # cols i, i+1: G from the right: col_i' = c·col_i + s·col_{i+1}
                ci_ = h[:, i]
                cip1 = h[:, i + 1]
                h = h.at[:, i].set(cc * ci_ + s * cip1)
                h = h.at[:, i + 1].set(-jnp.conj(s) * ci_ + cc * cip1)
                qi = q[:, i]
                qip1 = q[:, i + 1]
                q = q.at[:, i].set(cc * qi + s * qip1)
                q = q.at[:, i + 1].set(-jnp.conj(s) * qi + cc * qip1)
                # next rotation zeroes the bulge h[i+2, i] against h[i+1, i]
                nx = h[jnp.minimum(i + 1, n - 1), i]
                nz = h[jnp.minimum(i + 2, n - 1), jnp.minimum(i, n - 1)]
                nz = jnp.where(i + 2 <= hi, nz, jnp.zeros_like(nz))
                x = jnp.where(active, nx, x)
                z = jnp.where(active, nz, z)
                return h, q, x, z

            h, q, _, _ = jax.lax.fori_loop(lo, hi, chase, (h, q, x0, z0))
            return h, q

        h, q = jax.lax.cond(can_deflate, deflate, do_sweep, (h, q))
        hi = jnp.where(can_deflate, hi - 1, hi)
        stall = jnp.where(can_deflate, 0, stall + 1)
        return h, q, hi, it + 1, stall

    def cond(state):
        h, q, hi, it, stall = state
        return (hi > 0) & (it < max_iters)

    state = (h, q, jnp.asarray(n - 1, jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    h, q, hi, it, _ = jax.lax.while_loop(cond, body, state)
    # clean below-diagonal
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    t = jnp.where(rows <= cols, h, jnp.zeros((), dtype))
    return t, q, SpectralInfo(converged=hi == 0, iterations=it)


def _combine_pair(re, im):
    """re + i·im as a native complex array when the data lives on a
    complex-capable device, else a host numpy complex array (this TPU
    runtime has no complex element types).

    NOTE: on the TPU runtime the non-traced result is a **host numpy**
    complex array, not a jax array — the jittable TPU API is the ``*_pair``
    functions, which keep everything as (re, im) device arrays.
    """
    cdt = dtypes.complex_dtype_of(re.dtype)
    try:
        platform = next(iter(re.devices())).platform
    except Exception:
        # traced values carry no device info.  On the complex-free TPU
        # runtime a complex astype would fail with a deep XLA lowering
        # error — raise the actionable message here instead.
        if _complex_unsupported():
            raise NotImplementedError(
                "jit(evd)/jit(eigenvalues) produce complex outputs, which "
                "this TPU runtime does not support; use evd_pair/"
                "eigenvalues_pair (the jittable (re, im) API) or run under "
                "jax.default_device(jax.devices('cpu')[0]).")
        platform = "cpu"
    if platform in ("cpu", "gpu", "cuda", "rocm"):
        return re.astype(cdt) + jnp.asarray(1j, cdt) * im.astype(cdt)
    import numpy as np

    return np.asarray(jax.device_get(re)).astype(cdt) + 1j * np.asarray(
        jax.device_get(im)).astype(cdt)


def _complex_unsupported() -> bool:
    """True when the default backend rejects complex element types (this
    TPU runtime) — such inputs route through the split-(re,im) pair path."""
    import jax as _jax

    try:
        return _jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


#: below this size the lahqr-class double-shift iteration wins (faer routes
#: small blocks to ``lahqr`` the same way, ``real_schur.rs:2353``)
_MULTISHIFT_MIN_N = 128


def _real_schur_dispatch(h, q, *, max_sweeps_factor: int):
    """Hessenberg → real Schur: multishift QR + AED for large n (GEMM-bound,
    O(n/ns) sweeps), lahqr-class double-shift below ``_MULTISHIFT_MIN_N``."""
    from faer_tpu.linalg.real_schur import real_schur

    if h.shape[0] >= _MULTISHIFT_MIN_N:
        from faer_tpu.linalg.schur_multishift import multishift_real_schur

        return multishift_real_schur(h, q)
    return real_schur(h, q, max_sweeps_factor=max_sweeps_factor)


@functools.partial(jax.jit, static_argnames=("max_sweeps_factor",))
def evd_pair(a, *, max_sweeps_factor: int = 30):
    """General REAL eigendecomposition as (re, im) pairs — fully jittable and
    TPU-native.  Returns ``((wr, wi), (vr, vi), info)`` with
    ``A (vr+i·vi)_k = (wr+i·wi)_k (vr+i·vi)_k``; conjugate eigenpairs are
    adjacent.  faer ``evd_real`` (``evd/mod.rs:1213``) via the real Francis
    double-shift Schur (``real_schur.rs:2117``); n ≥ 128 routes to the
    multishift+AED path (``schur_multishift.py``), whose GEMM-dominated
    sweeps keep large-n dispatches MXU-bound.
    """
    from faer_tpu.linalg.eigvec import quasi_triangular_eigenvectors_pair
    from faer_tpu.linalg.real_schur import schur_eigenvalues_pair

    h, q = hessenberg_blocked(a)
    t, qs, info = _real_schur_dispatch(h, q, max_sweeps_factor=max_sweeps_factor)
    wr, wi = schur_eigenvalues_pair(t)
    xr, xi = quasi_triangular_eigenvectors_pair(t, wr, wi)
    vr = matmul(None, qs, xr)
    vi = matmul(None, qs, xi)
    return (wr, wi), (vr, vi), info


@functools.partial(jax.jit, static_argnames=("max_sweeps_factor",))
def eigenvalues_pair(a, *, max_sweeps_factor: int = 30):
    """Eigenvalues of a real matrix as ``(re, im)`` — jittable, TPU-native."""
    from faer_tpu.linalg.real_schur import schur_eigenvalues_pair

    h, q = hessenberg_blocked(a)
    t, _, _ = _real_schur_dispatch(h, q, max_sweeps_factor=max_sweeps_factor)
    return schur_eigenvalues_pair(t)


def evd(a, *, max_sweeps_factor: int = 30):
    """General eigendecomposition: returns ``(w, v, info)`` with
    ``A v_k = w_k v_k``. Real inputs use the real Francis double-shift path
    (no complexification tax, runs on TPU); complex inputs use the uniform
    complex single-shift path. faer ``evd_real/evd_cplx``
    (``evd/mod.rs:1180,1213``).
    """
    if not dtypes.is_complex(a.dtype):
        (wr, wi), (vr, vi), info = evd_pair(a, max_sweeps_factor=max_sweeps_factor)
        return _combine_pair(wr, wi), _combine_pair(vr, vi), info
    if _complex_unsupported():
        # split-complex path: runs natively on the complex-free TPU runtime
        import numpy as np

        from faer_tpu.linalg.evd_cpair import evd_cpair

        rdt = dtypes.real_dtype_of(a.dtype)
        ar = jnp.asarray(np.real(np.asarray(a)), rdt)
        ai = jnp.asarray(np.imag(np.asarray(a)), rdt)
        (wr, wi), (vr, vi), info = evd_cpair(
            ar, ai, max_sweeps_factor=max_sweeps_factor)
        return _combine_pair(wr, wi), _combine_pair(vr, vi), info
    from faer_tpu.linalg.eigvec import triangular_eigenvectors

    h, q = hessenberg_blocked(a)
    t, qs, info = complex_schur(h, q, max_sweeps_factor=max_sweeps_factor)
    w = jnp.diagonal(t)
    vt = triangular_eigenvectors(t)
    v = matmul(None, qs, vt)
    return w, v, info


def eigenvalues(a, *, max_sweeps_factor: int = 30):
    if not dtypes.is_complex(a.dtype):
        wr, wi = eigenvalues_pair(a, max_sweeps_factor=max_sweeps_factor)
        return _combine_pair(wr, wi)
    if _complex_unsupported():
        import numpy as np

        from faer_tpu.linalg.evd_cpair import eigenvalues_cpair

        rdt = dtypes.real_dtype_of(a.dtype)
        ar = jnp.asarray(np.real(np.asarray(a)), rdt)
        ai = jnp.asarray(np.imag(np.asarray(a)), rdt)
        wr, wi = eigenvalues_cpair(ar, ai, max_sweeps_factor=max_sweeps_factor)
        return _combine_pair(wr, wi)
    h, q = hessenberg_blocked(a)
    t, _, _ = complex_schur(h, q, max_sweeps_factor=max_sweeps_factor)
    return jnp.diagonal(t)
