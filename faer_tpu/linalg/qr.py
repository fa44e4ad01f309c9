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
from faer_tpu.ops.triangular_solve import solve_upper_triangular


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


def _panel_qr_blocked(panel, base: int):
    """Two-level panel QR: recursive column-halving to the fori base; the
    inter-half coupling is one compact-WY block apply (two GEMMs)."""
    m, b = panel.shape
    if b <= base or m <= base:
        from faer_tpu.core import dtypes as _dt
        from faer_tpu.core.config import panel_kernels_enabled

        if panel_kernels_enabled(panel.dtype) and not _dt.is_complex(panel.dtype):
            # transposed sub-blocked kernel (see ops/pallas/qr_panel_v2.py)
            from faer_tpu.ops.pallas.qr_panel_v2 import qr_panel_v2_pallas

            return qr_panel_v2_pallas(panel)
        return _panel_qr(panel)
    h = (b + 1) // 2
    left, taus1 = _panel_qr_blocked(panel[:, :h], base)
    v1 = _extract_v(left, h)
    t1 = form_block_t(v1, taus1)
    right = apply_block_on_left(v1, t1, panel[:, h:], adjoint=True)
    bot, taus2 = _panel_qr_blocked(right[h:], base)
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

    base = 128 if panel_kernels_enabled(a.dtype) else 32
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

    ``A[:, col_perm] = Q R``. Unblocked masked ``fori_loop`` with trailing
    column-norm argmax per step (norms recomputed exactly — the downdate
    recurrence of LAPACK geqp3 trades accuracy for FLOPs; on TPU the exact
    recompute is one fused reduction).
    """
    del params
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
