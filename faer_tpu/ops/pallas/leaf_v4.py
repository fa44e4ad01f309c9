"""v4 leaf kernels: the panel serial cores with minimal per-step passes.

Round-3 kernels (``lu_panel_v3.py``, ``qr_panel_v3.py``,
``panel_kernels.llt_block_v3_pallas``) established unrolled sub-block
elimination; chip profiling (tools/r4parts.py) showed their remaining cost is

* per-step ``jnp.transpose`` relayouts in the LLT kernel (the (1, k) → (k, 1)
  multiplier extraction) — replaced here with direct static sublane×lane
  slices of the symmetric storage;
* per-sub-block reconstruction passes of the multiplier / one-hot / reflector
  rows (LU/QR) — replaced with VMEM scratch buffers written once per step at
  the moment the row is computed;
(An attempt to drop the deferred-update dots to ``HIGH``/bf16x3 failed:
Mosaic only lowers DEFAULT and HIGHEST dot precisions, so in-kernel dots stay
at HIGHEST like v3.)

Reference parity: same contracts as the v1/v3 kernels (faer
``lu/partial_pivoting/factor.rs`` / ``cholesky/llt/factor.rs`` /
``qr/no_pivoting/factor.rs`` unblocked panels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _dot_hi(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot(a, b):
    # Mosaic only lowers DEFAULT/HIGHEST; DEFAULT (single bf16 pass) is too
    # lossy for Schur updates, so in-kernel dots run at HIGHEST like v3
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dotT(a, b):
    """(r, m) · (s, m)ᵀ → (r, s): contract the lane dimension."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _neumann_unit_inv(r, nb: int):
    """(I + R)⁻¹ for strictly-triangular R via log-depth doubling (small)."""
    eye = jnp.eye(nb, dtype=jnp.float32)
    p = -r
    s = eye + p
    span = 2
    while span < nb:
        p = _dot_hi(p, p)
        s = s + _dot_hi(p, s)
        span *= 2
    return s


# ---------------------------------------------------------------------------
# LLT diagonal block, v4
# ---------------------------------------------------------------------------

def _llt_v4_kernel(a_ref, o_ref, cnt_ref, ok_ref, *, b, bvalid, eps, delta,
                   sb, rch):
    """Rows of o_ref = columns of L (symmetric input = its own transpose).

    Per step: one (1, b) row read, a static (1, 1) pivot slice, one row write,
    and a static-slice rank-1 on the rows below it inside the sub-block — no
    transposes, no masked cross-lane reductions. The cross-sub-block Schur
    update solves W·L11ᵀ = C_sub per row chunk (two MXU dots)."""
    o_ref[:] = a_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    cnt = jnp.zeros((), jnp.int32)
    ok = jnp.ones((), jnp.bool_)

    nsub = (bvalid + sb - 1) // sb
    for s in range(nsub):
        sb0 = s * sb
        nj = min(sb, bvalid - sb0)
        sb_end = sb0 + nj
        for jl in range(nj):
            j = sb0 + jl
            rowj = o_ref[j:j + 1, :]                       # (1, b) = A[:, j]
            pj = rowj[0:1, j:j + 1][0, 0]
            needs = pj <= delta
            ok = ok & (pj > 0)
            if eps > 0:
                pj = jnp.where(needs, eps, pj)
                cnt = cnt + jnp.where(needs, jnp.int32(1), jnp.int32(0))
            else:
                pj = jnp.where(pj <= 0, 1.0, pj)
            piv = jnp.sqrt(pj)
            rinv = 1.0 / piv
            col = jnp.where(lanes == j, piv,
                            jnp.where(lanes > j, rowj * rinv, rowj))
            o_ref[j:j + 1, :] = col
            if jl < nj - 1:
                rest = o_ref[j + 1:sb_end, :]              # (k, b)
                uv = rest[:, j:j + 1] * rinv               # (k, 1) = L[c, j]
                o_ref[j + 1:sb_end, :] = rest - uv * col
        if sb_end >= bvalid:
            continue
        m_rows = o_ref[sb0:sb_end, :]                      # final L columns
        u11 = m_rows[:, sb0:sb_end]                        # = L11ᵀ + garbage
        iu = jax.lax.broadcasted_iota(jnp.int32, (nj, nj), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (nj, nj), 1)
        eye = (iu == ju).astype(jnp.float32)
        u11 = jnp.where(iu <= ju, u11, 0.0)
        d = jnp.sum(u11 * eye, axis=1, keepdims=True)      # (nj, 1) pivots
        r_up = (u11 * (1.0 - eye)) / d
        uinv = _neumann_unit_inv(r_up, nj) / jnp.reshape(d, (1, nj))
        for c0 in range(sb_end, b, rch):
            cw = min(rch, b - c0)
            c_chunk = o_ref[c0:c0 + cw, :]
            w = _dot_hi(c_chunk[:, sb0:sb_end], uinv)      # (cw, nj) = L[c, j]
            o_ref[c0:c0 + cw, :] = c_chunk - _dot(w, m_rows)
    cnt_ref[0, 0] = cnt
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "delta", "sb", "rch"))
def llt_block_v4_pallas(block, *, eps: float = 0.0, delta: float = 0.0,
                        sb: int = 8, rch: int = 256):
    """Unblocked LLT of a (b, b) f32 symmetric block — v4 kernel.

    Same contract as ``llt_block_pallas``: ``(L, count, ok)``; the input must
    be symmetric in full storage.
    """
    b = block.shape[0]
    bp = _round_up(b, 128)
    if bp != b:
        block = jnp.pad(block, ((0, bp - b), (0, bp - b)))
    kernel = functools.partial(_llt_v4_kernel, b=bp, bvalid=b,
                               eps=float(eps), delta=float(delta),
                               sb=sb, rch=rch)
    l, cnt, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, bp), block.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(block)
    # rows hold L's columns: L = tril(out.T)
    return jnp.tril(l[:b, :b].T), cnt[0, 0], ok[0, 0] != 0


# ---------------------------------------------------------------------------
# LU panel, v4
# ---------------------------------------------------------------------------

def _lu_v4_kernel(pt_in, pt_ref, pidx_ref, ok_ref, m_ref, s_ref, *,
                  bp, mp, kmax, mvalid, sb, rch):
    """Transposed (bp, mp) panel; lanes = original rows; virtual pivoting.

    Differences vs v3: multiplier and one-hot rows land in VMEM scratch at
    step time (no per-sub-block reconstruction passes), and the deferred
    rank-sb chunk dots run at HIGH precision (Y is an exact one-hot selection
    even in bf16x3)."""
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    used = (lanes1 >= mvalid).astype(jnp.float32)
    ok = jnp.ones((), jnp.bool_)

    nsub = (kmax + sb - 1) // sb
    for s in range(nsub):
        sb0 = s * sb
        nj = min(sb, kmax - sb0)
        if nj < sb:
            m_ref[nj:, :] = jnp.zeros((sb - nj, mp), jnp.float32)
            s_ref[nj:, :] = jnp.zeros((sb - nj, mp), jnp.float32)
        for jl in range(nj):
            r = sb0 + jl
            colj = pt_ref[r:r + 1, :]                      # (1, m)
            mag = jnp.where(used != 0, -1.0, jnp.abs(colj))
            p = jax.lax.argmax(mag[0], 0, jnp.int32)
            onehot = (lanes1 == p).astype(jnp.float32)
            pv = jnp.sum(onehot * colj)
            ok = ok & (pv != 0)
            safe = jnp.where(pv == 0, 1.0, pv)
            dead = (used + onehot) != 0
            mult = jnp.where(dead, 0.0, colj * (1.0 / safe))
            pt_ref[r:r + 1, :] = jnp.where(dead, colj, mult)
            m_ref[jl:jl + 1, :] = mult
            s_ref[jl:jl + 1, :] = onehot
            if jl < nj - 1:
                rest = pt_ref[r + 1:sb0 + sb, :]
                uvals = _dotT(rest, onehot)                # (k, 1), exact
                pt_ref[r + 1:sb0 + sb, :] = rest - uvals * mult
            used = used + onehot
            pidx_ref[r] = p

        sb_end = sb0 + sb
        if sb_end >= bp:
            continue
        mmat = m_ref[:]                                    # (sb, m)
        smat = s_ref[:]
        lsub = _dotT(mmat, smat)                           # (sb, sb), exact
        eye = jnp.eye(sb, dtype=jnp.float32)
        llow = jnp.transpose(lsub) * (1.0 - eye)
        n_inv = _neumann_unit_inv(llow, sb)
        for c0 in range(sb_end, bp, rch):
            cw = min(rch, bp - c0)
            lchunk = pt_ref[c0:c0 + cw, :]
            y = _dotT(lchunk, smat)                        # (cw, sb), exact
            yp = _dotT(y, n_inv)                           # y @ n_invᵀ
            pt_ref[c0:c0 + cw, :] = lchunk - _dot(yp, mmat)
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("sb", "rch"))
def lu_panel_v4_pallas(panel, *, sb: int = 8, rch: int = 128):
    """Partially-pivoted LU of an (m, b) f32 panel — v4 kernel.

    Same return contract as ``lu_panel_v3_pallas``: ``(packed, perm, nt, ok)``
    with ``nt`` the pivot-permutation parity.
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, sb)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_lu_v4_kernel, bp=bp, mp=mp,
                               kmax=kmax, mvalid=m, sb=sb, rch=rch)
    pt_out, pidx, okf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, mp), panel.dtype),
            jax.ShapeDtypeStruct((bp,), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sb, mp), jnp.float32),
            pltpu.VMEM((sb, mp), jnp.float32),
        ],
        input_output_aliases={0: 0},
    )(pt)
    virt = jnp.transpose(pt_out[:b, :m])                   # (m, b)
    pidx = pidx[:kmax]
    big = jnp.int32(m + kmax)
    ranks = jnp.full((m,), big, jnp.int32)
    ranks = ranks.at[pidx].set(jnp.arange(kmax, dtype=jnp.int32))
    ranks = jnp.where(ranks < big, ranks,
                      kmax + jnp.arange(m, dtype=jnp.int32))
    perm = jnp.argsort(ranks).astype(jnp.int32)
    packed = jnp.take(virt, perm, axis=0)
    from faer_tpu.core.perm import perm_transposition_count

    nt = perm_transposition_count(perm)
    return packed, perm, nt, okf[0, 0] != 0


# ---------------------------------------------------------------------------
# QR panel, v4
# ---------------------------------------------------------------------------

def _qr_v4_kernel(pt_in, pt_ref, tau_ref, v_ref, tau_v_ref, *,
                  bp, mp, kmax, mvalid, sb, rch):
    """Transposed (bp, mp) Householder panel: reflector rows land in VMEM
    scratch at step time; α read by static lane slice; deferred compact-WY
    applied per chunk with HIGH-precision dots."""
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    inrange = lanes1 < mvalid

    nsub = (kmax + sb - 1) // sb
    for s in range(nsub):
        sb0 = s * sb
        nj = min(sb, kmax - sb0)
        if nj < sb:
            v_ref[nj:, :] = jnp.zeros((sb - nj, mp), jnp.float32)
            tau_v_ref[0:1, nj:] = jnp.zeros((1, sb - nj), jnp.float32)
        for jl in range(nj):
            j = sb0 + jl
            colj = pt_ref[j:j + 1, :]                      # (1, m)
            lane_j = lanes1 == j
            below = (lanes1 > j) & inrange
            alpha = colj[0:1, j:j + 1][0, 0]
            tail_sq = jnp.sum(jnp.where(below, colj * colj, 0.0))
            norm = jnp.sqrt(alpha * alpha + tail_sq)
            sign = jnp.where(alpha >= 0, 1.0, -1.0)
            beta = -sign * norm
            is_id = tail_sq == 0.0
            safe_s = jnp.where(is_id, 1.0, alpha - beta)
            safe_b = jnp.where(is_id, 1.0, beta)
            tau = jnp.where(is_id, 0.0, (beta - alpha) / safe_b)
            beta = jnp.where(is_id, alpha, beta)
            sinv = 1.0 / safe_s
            v = jnp.where(below, colj * sinv, 0.0)
            v = jnp.where(is_id, jnp.zeros_like(v), v)
            v = jnp.where(lane_j, 1.0, v)                  # (1, m)
            tau_ref[j] = tau
            v_ref[jl:jl + 1, :] = v
            tau_v_ref[0:1, jl:jl + 1] = jnp.reshape(tau, (1, 1))
            pt_ref[j:j + 1, :] = jnp.where(
                lane_j, beta, jnp.where(below, v, colj))
            if jl < nj - 1:
                rest = pt_ref[j + 1:sb0 + sb, :]
                w = _dotT(rest, v)                         # (k, 1)
                pt_ref[j + 1:sb0 + sb, :] = rest - (tau * w) * v

        sb_end = sb0 + sb
        if sb_end >= bp:
            continue
        vmat = v_ref[:]                                    # (sb, m)
        tau_v = tau_v_ref[0:1, :]                          # (1, sb)
        live = (tau_v != 0).astype(jnp.float32)
        tau_safe = jnp.where(tau_v == 0, 1.0, tau_v)
        g = _dotT(vmat, vmat)                              # (sb, sb)
        eye = jnp.eye(sb, dtype=jnp.float32)
        iu = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
        # T⁻¹ = diag(1/τ) + strict_upper(VᵀV); invert via row-scaled Neumann
        dinv_row = tau_safe                                # (1, sb): 1/d = τ
        r_up = jnp.where(iu < ju, g, 0.0) * jnp.reshape(dinv_row, (sb, 1))
        t_mat = _neumann_unit_inv(r_up, sb) * dinv_row     # cols scaled by τ
        t_mat = t_mat * live * jnp.reshape(live, (sb, 1))
        for c0 in range(sb_end, bp, rch):
            cw = min(rch, bp - c0)
            later = pt_ref[c0:c0 + cw, :]
            y = _dotT(later, vmat)                         # (cw, sb)
            z = _dot(y, t_mat)                             # y @ T
            pt_ref[c0:c0 + cw, :] = later - _dot(z, vmat)


@functools.partial(jax.jit, static_argnames=("sb", "rch"))
def qr_panel_v4_pallas(panel, *, sb: int = 8, rch: int = 128):
    """Householder QR of an (m, b) f32 panel — v4 kernel.

    Same return contract as ``qr_panel_v3_pallas``: ``(packed, taus)``.
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, sb)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_qr_v4_kernel, bp=bp, mp=mp,
                               kmax=kmax, mvalid=m, sb=sb, rch=rch)
    pt_out, taus = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, mp), panel.dtype),
            jax.ShapeDtypeStruct((bp,), panel.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sb, mp), jnp.float32),
            pltpu.VMEM((1, sb), jnp.float32),
        ],
        input_output_aliases={0: 0},
    )(pt)
    return jnp.transpose(pt_out[:b, :m]), taus[:kmax]
