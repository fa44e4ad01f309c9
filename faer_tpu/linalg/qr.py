"""QR factorizations: blocked Householder (no pivoting) + column pivoting.

Reference parity (SURVEY §2.4):
* ``faer/src/linalg/qr/no_pivoting/factor.rs`` — ``qr_in_place`` (``:258``),
  ``qr_in_place_blocked`` (``:137``), compact-WY T factors;
* ``faer/src/linalg/qr/col_pivoting/factor.rs`` — ``qr_in_place`` (``:345``),
  column-norm tracking + argmax swaps;
* solve/lstsq/inverse/reconstruct siblings.

TPU-native design: the panel factor is one ``fori_loop`` over columns with
masked reflector construction and rank-1 applies (VPU work, static shapes);
T factors come from the closed-form GEMM formula (``ops.householder``); the
trailing update is two exact-size GEMMs per panel on the MXU. Packed layout =
LAPACK ``geqrt``: R in the upper triangle, reflector tails below the diagonal,
T factors stacked per panel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes, perm as permod
from faer_tpu.core.params import ColPivQrParams, QrParams
from faer_tpu.ops.householder import (
    apply_block_on_left,
    apply_sequence_on_left,
    apply_sequence_on_right,
    form_block_t,
)
from faer_tpu.ops.matmul import matmul
from faer_tpu.ops.triangular_solve import (
    solve_unit_lower_triangular,
    solve_upper_triangular,
)


def _masked_householder_col(a, taus, j, rows):
    """One masked reflector step on panel ``a`` at column ``j`` (traced).

    Builds H_j from rows ≥ j of column j, stores (β, v-tail) back into the
    column, applies H_jᴴ to columns > j. Returns (a, taus, v) with v the full
    reflector (zeros above j, 1 at j).
    """
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    col = a[:, j]
    alpha = col[j]
    below = rows > j
    tail_sq = jnp.sum(jnp.where(below, jnp.abs(col).astype(rdt) ** 2, 0))
    alpha_re = jnp.real(alpha).astype(rdt)
    norm = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
    sign = jnp.where(alpha_re >= 0, jnp.ones((), rdt), -jnp.ones((), rdt))
    beta_r = -sign * norm
    if dtypes.is_complex(dtype):
        is_id = (tail_sq == 0) & (jnp.imag(alpha) == 0)
    else:
        is_id = tail_sq == 0
    beta = beta_r.astype(dtype)
    s = alpha - beta
    safe_s = jnp.where(is_id, jnp.ones((), dtype), s)
    safe_beta = jnp.where(is_id, jnp.ones((), dtype), beta)
    tau = jnp.where(is_id, jnp.zeros((), dtype), (beta - alpha) / safe_beta)
    beta = jnp.where(is_id, alpha, beta)
    v = jnp.where(below, col / safe_s, jnp.zeros_like(col))
    v = jnp.where(is_id, jnp.zeros_like(v), v)
    v = v.at[j].set(jnp.ones((), dtype))
    taus = taus.at[j].set(tau)
    # apply H_jᴴ = I − τ̄ v vᴴ to columns > j
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1]), 1)[0]
    w = matmul(None, jnp.conj(v)[None, :], a)[0]          # vᴴ A
    upd = jnp.conj(tau) * v[:, None] * w[None, :]
    a = jnp.where((cols > j)[None, :], a - upd, a)
    # store packed column j: β at diag, v tail below
    packed = jnp.where(below, v, col).at[j].set(beta)
    a = a.at[:, j].set(packed)
    return a, taus, v


def _panel_qr(panel):
    """Unblocked Householder QR of an (mk, bw) panel (fori_loop, masked).

    Returns (packed_panel, taus).
    """
    mk, bw = panel.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (mk, 1), 0)[:, 0]
    taus = jnp.zeros((bw,), panel.dtype)

    def body(j, state):
        a, taus = state
        a, taus, _ = _masked_householder_col(a, taus, j, rows)
        return a, taus

    return jax.lax.fori_loop(0, min(mk, bw), body, (panel, taus))


def _extract_v(packed, bw: int):
    mk = packed.shape[0]
    mask = jnp.tril(jnp.ones((mk, bw), dtypes.real_dtype_of(packed.dtype)), -1)
    return packed[:, :bw] * mask.astype(packed.dtype) + jnp.eye(mk, bw, dtype=packed.dtype)


def _qr_block(kmax: int, params: QrParams) -> int:
    # 512-wide panels measured fastest at 4096 f32 on v5e (16.0 vs 12.7 TF/s
    # against 128-wide); the leaf recursion still bottoms out at 128
    return params.block_size or (512 if kmax >= 2048 else
                                 256 if kmax >= 1024 else
                                 128 if kmax >= 512 else
                                 32 if kmax >= 64 else kmax)


def qr_in_place(a, params: QrParams | None = None):
    """Blocked Householder QR: returns ``(packed, t_stack, block)``.

    ``packed`` holds R (upper) + reflector tails (strict lower);
    ``t_stack[p]`` is the compact-WY T of panel p. faer ``qr_in_place``
    (``qr/no_pivoting/factor.rs:258``).
    """
    params = params or QrParams.auto(a.dtype, a.shape)
    block = _qr_block(min(a.shape), params)
    packed, ts = _qr_in_place_impl(a, params)
    return packed, ts, block


def _lu_nopivot(a, base: int = 64):
    """No-pivot LU of a square block: returns packed L\\U (unit-lower L).

    Used only for Householder reconstruction from an orthonormal panel
    (`_panel_qr_cholqr`), where the sign choice guarantees |diagonal| ≥ 1 and
    no-pivot LU is provably stable (Ballard et al., "Reconstructing
    Householder vectors from TSQR", IPDPS 2014).
    """
    n = a.shape[0]
    if n <= base:
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

        def body(j, a):
            pivot = a[j, j]
            safe = jnp.where(pivot == 0, jnp.ones_like(pivot), pivot)
            below = rows > j
            mult = jnp.where(below, a[:, j] / safe, a[:, j])
            a = a.at[:, j].set(mult)
            upd = jnp.where(below[:, None] & (cols > j)[None, :],
                            mult[:, None] * a[j, :][None, :], 0)
            return a - upd

        return jax.lax.fori_loop(0, n, body, a)
    from faer_tpu.ops.triangular import invert_upper_triangular

    h = (n + 1) // 2
    top = _lu_nopivot(a[:h, :h], base)
    l11 = jnp.tril(top, -1) + jnp.eye(h, dtype=a.dtype)
    u12 = solve_unit_lower_triangular(l11, a[:h, h:])
    l21 = matmul(None, a[h:, :h], invert_upper_triangular(jnp.triu(top)))
    bot = _lu_nopivot(a[h:, h:] - matmul(None, l21, u12), base)
    out = jnp.zeros_like(a)
    out = out.at[:h, :h].set(top).at[:h, h:].set(u12)
    out = out.at[h:, :h].set(l21).at[h:, h:].set(bot)
    return out


def _panel_qr_cholqr(panel):
    """CholeskyQR2 + Householder reconstruction for a tall f32 panel.

    The classic Householder panel is a min(m,b)-step serial chain whose
    per-step cost scales with the panel height m (the TPU's serial floor).
    This path replaces it with MXU GEMMs + two b×b factorizations:

      1. G = AᵀA; R₁ = chol(G)ᵀ; Q₁ = A R₁⁻¹       (CholeskyQR)
      2. repeat on Q₁ → Q, R = R₂R₁                 (CholeskyQR2: O(eps) orth)
      3. s_i = −sign(Q_ii); V·U = LU_nopivot(Q − S̃); τ = −diag(U)·s;
         T = −U S V₁⁻ᵀ reproduces the compact-WY form exactly
         (verified: T matches ``form_block_t(V, τ)``), so the packed
         contract ((R′=S·R upper) + (V tails strict-lower), τ) is unchanged.

    Valid iff chol(G) succeeds ≈ κ(A) ≤ eps^(−1/2); the caller must check
    ``ok`` and fall back to the classic panel. faer parity: same factorization
    contract as ``qr/no_pivoting/factor.rs:258`` (Q/R signs may differ — the
    decomposition is unique only up to column signs).
    """
    from faer_tpu.core.params import LltRegularization
    from faer_tpu.linalg.cholesky import _llt_panel_recursive
    from faer_tpu.ops.triangular import invert_lower_triangular, invert_upper_triangular

    m, b = panel.shape
    reg = LltRegularization()
    g = matmul(None, panel.T, panel)
    l1, _, ok1 = _llt_panel_recursive(g, reg, 256)
    q1 = matmul(None, panel, invert_lower_triangular(l1).T)
    g2 = matmul(None, q1.T, q1)
    l2, _, ok2 = _llt_panel_recursive(g2, reg, 256)
    q = matmul(None, q1, invert_lower_triangular(l2).T)
    r = matmul(None, l2.T, l1.T)                       # R = R₂ R₁ (upper)
    # orthogonality certificate: CholQR2 is valid iff pass-1 left Q₁ with
    # bounded departure from orthonormality
    orth_gap = jnp.max(jnp.abs(g2 - jnp.eye(b, dtype=panel.dtype)))
    d = jnp.diagonal(q)[:b]
    s = jnp.where(d >= 0, -jnp.ones((b,), panel.dtype), jnp.ones((b,), panel.dtype))
    mmat = q - jnp.zeros((m, b), panel.dtype).at[:b, :b].set(jnp.diag(s))
    top = _lu_nopivot(mmat[:b, :b])
    u = jnp.triu(top)
    v1 = jnp.tril(top, -1)
    v2 = matmul(None, mmat[b:, :b], invert_upper_triangular(u)) if m > b else None
    taus = -jnp.diagonal(u) * s
    rp = s[:, None] * r
    packed_top = jnp.triu(rp) + v1
    packed = (jnp.concatenate([packed_top, v2], axis=0) if v2 is not None
              else packed_top)
    ok = ok1 & ok2 & (orth_gap < 0.25) & jnp.all(jnp.isfinite(packed)) \
        & jnp.all(jnp.isfinite(taus))
    return packed, taus, ok


# CholeskyQR2 panels replace the m-lane serial chain with GEMMs + two b×b
# factorizations — but measured on v5e at (4096, 512) the b×b serial chains
# (2×chol + trtri + no-pivot LU at 512) cost 2.5 ms against the classic
# panel's 0.99 ms: the per-step cost of the small-matrix kernels dominates.
# Gated off until the small-factor serial floor drops below ~0.3 ms.
_CHOLQR_MIN_M = 1 << 30


def _panel_qr_blocked(panel, base: int):
    """Panel QR: CholeskyQR2 fast path (GEMM-dominated, `_panel_qr_cholqr`)
    with a ``lax.cond`` fallback to the classic recursive Householder panel
    for ill-conditioned panels; small/complex panels go classic directly."""
    m, b = panel.shape
    from faer_tpu.core import dtypes as _dt
    from faer_tpu.core.config import panel_kernels_enabled

    if (m >= _CHOLQR_MIN_M and m >= b and b >= 64
            and not _dt.is_complex(panel.dtype)
            and panel.dtype == jnp.dtype(jnp.float32)
            and panel_kernels_enabled(panel.dtype)):
        packed_f, taus_f, ok = _panel_qr_cholqr(panel)
        return jax.lax.cond(
            ok,
            lambda: (packed_f, taus_f),
            lambda: _panel_qr_blocked_classic(panel, base),
        )
    return _panel_qr_blocked_classic(panel, base)


def _panel_qr_blocked_classic(panel, base: int):
    """Two-level panel QR: recursive column-halving to the fori base; the
    inter-half coupling is one compact-WY block apply (two GEMMs)."""
    m, b = panel.shape
    if b <= base or m <= base:
        from faer_tpu.core import dtypes as _dt
        from faer_tpu.core.config import panel_kernels_enabled

        if panel_kernels_enabled(panel.dtype) and not _dt.is_complex(panel.dtype):
            # v5: v4's reflector-scratch structure + bf16x3 deferred coupling
            # dots at sb=16 — see ops/pallas/qr_panel_v5.py (tools/r5qr.py)
            from faer_tpu.ops.pallas.qr_panel_v5 import qr_panel_v5_pallas

            return qr_panel_v5_pallas(panel)
        return _panel_qr(panel)
    h = (b + 1) // 2
    left, taus1 = _panel_qr_blocked_classic(panel[:, :h], base)
    v1 = _extract_v(left, h)
    t1 = form_block_t(v1, taus1)
    right = apply_block_on_left(v1, t1, panel[:, h:], adjoint=True)
    bot, taus2 = _panel_qr_blocked_classic(right[h:], base)
    out = jnp.zeros_like(panel)
    out = out.at[:, :h].set(left)
    out = out.at[:h, h:].set(right[:h])
    out = out.at[h:, h:].set(bot)
    return out, jnp.concatenate([taus1, taus2])


@functools.partial(jax.jit, static_argnames=("params",))
def _qr_in_place_impl(a, params: QrParams):
    m, n = a.shape
    kmax = min(m, n)
    block = _qr_block(kmax, params)
    from faer_tpu.core.config import panel_kernels_enabled

    if panel_kernels_enabled(a.dtype):
        leaf = params.kernel_leaf if params.kernel_leaf is not None else 128
        base = min(max(128, ((leaf + 127) // 128) * 128), 512)
    else:
        base = 32
    t_stack = []

    # right-looking over a shrinking trail (rows k:, cols k:); each panel's
    # top bw rows of the applied block are final R12 rows — peel them off and
    # assemble column strips at the end instead of paying a full n² copy per
    # dynamic_update_slice write-back
    trail = a
    panels = []              # [(k, packed (m - k, bw))]
    r12s = {}                # k -> (bw, n - k - bw) finalized R rows
    for k in range(0, kmax, block):
        bw = min(block, kmax - k)
        panel, taus = _panel_qr_blocked(trail[:, :bw], base)
        v = _extract_v(panel, bw)
        t = form_block_t(v, taus)
        t_pad = t if bw == block else jnp.zeros((block, block), a.dtype).at[:bw, :bw].set(t)
        t_stack.append(t_pad)
        panels.append((k, panel))
        if k + bw < n:
            right = apply_block_on_left(v, t, trail[:, bw:], adjoint=True)
            r12s[k] = right[:bw]
            trail = right[bw:]

    strips = []
    starts = [ks for ks, _ in panels]
    for idx, (ks, panel) in enumerate(panels):
        bw = panel.shape[1]
        pieces = []
        for i in range(idx):
            ksi, bwi = starts[i], panels[i][1].shape[1]
            pieces.append(r12s[ksi][:, ks - ksi - bwi: ks - ksi - bwi + bw])
        pieces.append(panel)
        strips.append(jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                      else panel)
    if n > kmax:
        tailcols = []
        for ksi, p in panels:
            bwi = p.shape[1]
            if ksi in r12s:
                tailcols.append(r12s[ksi][:, kmax - ksi - bwi:])
        rest = jnp.concatenate(tailcols, axis=0)
        if rest.shape[0] < m:
            rest = jnp.concatenate(
                [rest, jnp.zeros((m - rest.shape[0], rest.shape[1]), a.dtype)],
                axis=0)
        strips.append(rest)
    out = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=1)

    return out, jnp.stack(t_stack)


@functools.partial(jax.jit, static_argnames=("block", "thin"))
def qr_compute_q(packed, t_stack, block: int, *, thin: bool = True):
    """Q (m×min(m,n) thin, or m×m full) from the packed factorization."""
    m = packed.shape[0]
    k = min(packed.shape)
    eye = jnp.eye(m, k if thin else m, dtype=packed.dtype)
    return apply_sequence_on_left(packed, t_stack, eye, adjoint=False, block=block)


@functools.partial(jax.jit, static_argnames=("block", "adjoint"))
def qr_apply_q(packed, t_stack, block: int, b, *, adjoint: bool):
    return apply_sequence_on_left(packed, t_stack, b, adjoint=adjoint, block=block)


@functools.partial(jax.jit, static_argnames=("block",))
def qr_reconstruct(packed, t_stack, block: int):
    """A = Q R (faer ``qr/no_pivoting/reconstruct.rs``)."""
    m, n = packed.shape
    r = jnp.triu(packed)[: min(m, n), :]
    rfull = jnp.zeros((m, n), packed.dtype).at[: min(m, n), :].set(r)
    return apply_sequence_on_left(packed, t_stack, rfull, adjoint=False, block=block)


@functools.partial(jax.jit, static_argnames=("block",))
def qr_solve_lstsq(packed, t_stack, block: int, b):
    """Least-squares solve via Qᴴ b then the R-triangle (faer ``solvers.rs:639``)."""
    n = packed.shape[1]
    qtb = apply_sequence_on_left(packed, t_stack, b, adjoint=True, block=block)
    return solve_upper_triangular(packed[:n, :n], qtb[:n])


@functools.partial(jax.jit, static_argnames=("block",))
def qr_solve(packed, t_stack, block: int, b):
    """Square-system solve (m == n)."""
    return qr_solve_lstsq(packed, t_stack, block, b)


@functools.partial(jax.jit, static_argnames=("block",))
def qr_inverse(packed, t_stack, block: int):
    n = packed.shape[1]
    # A⁻¹ = R⁻¹ Qᴴ
    qt = apply_sequence_on_left(packed, t_stack, jnp.eye(n, dtype=packed.dtype),
                                adjoint=True, block=block)
    return solve_upper_triangular(packed[:n, :n], qt)


# ---------------------------------------------------------------------------
# column-pivoted QR (col_pivoting/factor.rs:345)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params",))
def col_piv_qr_in_place(a, params: ColPivQrParams | None = None):
    """Column-pivoted Householder QR: returns ``(packed, taus, col_perm)``.

    ``A[:, col_perm] = Q R``.  Blocked LAPACK-``geqp3`` structure (faer
    ``col_pivoting/factor.rs:345``): within a panel each step does ONE
    trailing matvec (the F-update) plus the pivot-row norm DOWNDATE; the
    rank-b trailing update runs once per panel on the MXU, followed by an
    exact trailing-norm recompute (bounding downdate drift to one panel).
    """
    del params
    m, n = a.shape
    kmax = min(m, n)
    if kmax <= 64 or n <= 64:
        return _col_piv_qr_unblocked(a)
    return _col_piv_qr_blocked(a, 64)


def _col_piv_qr_unblocked(a):
    m, n = a.shape
    kmax = min(m, n)
    rdt = dtypes.real_dtype_of(a.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def body(j, state):
        a, taus, perm = state
        # trailing column norms (rows ≥ j), masked argmax over cols ≥ j
        sq = jnp.sum(jnp.where((rows >= j)[:, None], jnp.abs(a).astype(rdt) ** 2, 0), axis=0)
        sq = jnp.where(cols >= j, sq, -1.0)
        p = jnp.argmax(sq).astype(jnp.int32)
        a = permod.swap_cols(a, j, p)
        perm = permod.swap_rows(perm, j, p)
        a, taus, _ = _masked_householder_col(a, taus, j, rows)
        return a, taus, perm

    init = (a, jnp.zeros((kmax,), a.dtype), jnp.arange(n, dtype=jnp.int32))
    a, taus, perm = jax.lax.fori_loop(0, kmax, body, init)
    return a, taus, perm


def _col_piv_qr_blocked(a, block: int):
    m, n = a.shape
    kmax = min(m, n)
    dtype = a.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    taus = jnp.zeros((kmax,), dtype)
    perm = jnp.arange(n, dtype=jnp.int32)
    norms = jnp.sum(jnp.abs(a).astype(rdt) ** 2, axis=0)

    k0 = 0
    while k0 < kmax:
        bw = min(block, kmax - k0)
        cols_b = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)[0]

        def panel_step(i, st, k0=k0, bw=bw, cols_b=cols_b):
            a, v_p, f_p, norms, taus, perm = st
            j = k0 + i
            # pivot by downdated trailing norms
            p = jnp.argmax(jnp.where(cols >= j, norms, -1.0)).astype(jnp.int32)
            a = permod.swap_cols(a, j, p)
            f_p = permod.swap_rows(f_p, j, p)
            norms = permod.swap_rows(norms, j, p)
            perm = permod.swap_rows(perm, j, p)
            # virtual column j: c = (A − V Fᴴ) e_j
            col = jax.lax.dynamic_slice(a, (0, j), (m, 1))[:, 0]
            frow = jnp.conj(jax.lax.dynamic_slice(f_p, (j, 0), (1, bw))[0])
            c = col - matmul(None, v_p, frow[:, None])[:, 0]
            # Householder at row j
            on = rows == j
            below = rows > j
            alpha = jnp.sum(jnp.where(on, c, jnp.zeros_like(c)))
            tail_sq = jnp.sum(jnp.where(below, jnp.abs(c).astype(rdt) ** 2, 0))
            norm_ = jnp.sqrt(jnp.abs(alpha).astype(rdt) ** 2 + tail_sq)
            sign = jnp.where(jnp.real(alpha) >= 0, jnp.ones((), rdt),
                             -jnp.ones((), rdt))
            beta = (-sign * norm_).astype(dtype)
            if dtypes.is_complex(dtype):
                is_id = (tail_sq == 0) & (jnp.imag(alpha) == 0)
            else:
                is_id = tail_sq == 0
            s = alpha - beta
            safe_s = jnp.where(is_id, jnp.ones((), dtype), s)
            safe_b = jnp.where(is_id, jnp.ones((), dtype), beta)
            tau = jnp.where(is_id, jnp.zeros((), dtype),
                            (beta - alpha) / safe_b)
            beta = jnp.where(is_id, alpha, beta)
            v = jnp.where(below, c / safe_s, jnp.zeros_like(c))
            v = jnp.where(is_id, jnp.zeros_like(v), v)
            v = v + jnp.where(on, jnp.ones_like(v), jnp.zeros_like(v))
            # packed column j: final head + beta + reflector tail
            newcol = jnp.where(on, beta, jnp.where(below, v, c))
            a = jax.lax.dynamic_update_slice(a, newcol[:, None], (0, j))
            taus = taus.at[j].set(tau)
            # F column: w = conj(τ) vᴴ (A − V Fᴴ);  F[:, i] = wᴴ
            vh = jnp.conj(v)[None, :]
            wrow = matmul(None, vh, a)[0] \
                - matmul(None, matmul(None, vh, v_p), jnp.conj(f_p).T)[0]
            wrow = jnp.conj(tau) * wrow
            live = cols_b == i
            v_p = jnp.where(live[None, :], v[:, None], v_p)
            f_p = jnp.where(live[None, :], jnp.conj(wrow)[:, None], f_p)
            # norm downdate with the pivot row of the updated matrix
            arow = jax.lax.dynamic_slice(a, (j, 0), (1, n))[0]
            vrow = jax.lax.dynamic_slice(v_p, (j, 0), (1, bw))[0]
            arow = arow - matmul(None, vrow[None, :], jnp.conj(f_p).T)[0]
            norms = jnp.where(cols > j,
                              jnp.maximum(norms - jnp.abs(arow).astype(rdt) ** 2,
                                          0.0),
                              norms)
            return a, v_p, f_p, norms, taus, perm

        v0 = jnp.zeros((m, bw), dtype)
        f0 = jnp.zeros((n, bw), dtype)
        a, v_p, f_p, norms, taus, perm = jax.lax.fori_loop(
            0, bw, panel_step, (a, v0, f0, norms, taus, perm))
        # trailing update (one GEMM) on columns beyond the panel
        upd = matmul(None, v_p, jnp.conj(f_p).T)
        done = cols < k0 + bw
        a = jnp.where(done[None, :], a, a - upd)
        k0 += bw
        # exact trailing norms: bounds the downdate drift to one panel
        norms = jnp.sum(jnp.where((rows >= k0)[:, None],
                                  jnp.abs(a).astype(rdt) ** 2, 0), axis=0)
    return a, taus, perm


@functools.partial(jax.jit, static_argnames=("block",))
def col_piv_qr_t_stack(packed, taus, block: int):
    """Build per-panel T factors for the packed col-piv QR (for block apply)."""
    kmax = min(packed.shape)
    ts = []
    for k in range(0, kmax, block):
        bw = min(block, kmax - k)
        v = _extract_v(packed[k:, k:k + bw], bw)
        t = form_block_t(v, taus[k:k + bw])
        ts.append(t if bw == block else jnp.zeros((block, block), packed.dtype).at[:bw, :bw].set(t))
    return jnp.stack(ts)


@functools.partial(jax.jit, static_argnames=("block",))
def col_piv_qr_solve_lstsq(packed, taus, perm, b, *, block: int = 32):
    n = packed.shape[1]
    t_stack = col_piv_qr_t_stack(packed, taus, block)
    qtb = apply_sequence_on_left(packed, t_stack, b, adjoint=True, block=block)
    x = solve_upper_triangular(packed[:n, :n], qtb[:n])
    return permod.permute_rows_inverse(x, perm)


@functools.partial(jax.jit, static_argnames=("block",))
def col_piv_qr_reconstruct(packed, taus, perm, *, block: int = 32):
    m, n = packed.shape
    t_stack = col_piv_qr_t_stack(packed, taus, block)
    r = jnp.zeros((m, n), packed.dtype).at[: min(m, n), :].set(jnp.triu(packed)[: min(m, n), :])
    qr_ = apply_sequence_on_left(packed, t_stack, r, adjoint=False, block=block)
    return permod.permute_cols_inverse(qr_, perm)


__all__ = [
    "qr_in_place", "qr_compute_q", "qr_apply_q", "qr_reconstruct",
    "qr_solve", "qr_solve_lstsq", "qr_inverse",
    "col_piv_qr_in_place", "col_piv_qr_solve_lstsq", "col_piv_qr_reconstruct",
    "col_piv_qr_t_stack",
    "apply_sequence_on_left", "apply_sequence_on_right",
]
