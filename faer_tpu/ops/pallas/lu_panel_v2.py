"""Transposed, sub-blocked LU panel kernel (v2).

Reference parity: the unblocked partial-pivot panel of
``faer/src/linalg/lu/partial_pivoting/factor.rs`` — same pivot choice
(column argmax), same packed L\\U output contract as ``linalg.lu._panel_lu``.

Why v2: the v1 kernel walks columns of an (m, b) panel; every step touches the
full (m, b) slab (lane padding makes narrower slices free-of-charge only in
*sublanes*), so the per-step VMEM traffic is ~3·m·b·4 bytes — the measured
floor was ~3.8 µs/step at (4096, 128). v2 stores the panel TRANSPOSED
(columns = sublanes, rows = lanes) and splits the elimination into 8-column
sub-blocks:

* within a sub-block, each step reads/writes only the (8, m) slab
  (~256 KB → ~0.2 µs);
* pivoting is VIRTUAL — rows keep their lanes, a ``used`` lane-mask plus the
  per-step pivot-lane index replace physical swaps (the caller applies one
  gather at the end);
* cross-sub-block coupling is deferred and applied at sub-block boundaries as
  a rank-8 update on the MXU: gather the 8 pivot lanes with a one-hot
  ``dot_general``, forward-substitute through the 8×8 unit-lower coupling
  (Neumann doubling — nilpotent, exact), then one (rest, 8) × (8, m) matmul.

The sequential dependency chain is still min(m, b) steps (true partial
pivoting requires the full updated column before each argmax), but each step
now costs O(8·m) traffic instead of O(b·m).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SB = 8  # sub-block width = sublane granularity


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _dotT(a, b):
    """(r, m) · (s, m)ᵀ → (r, s): contract the lane (m) dimension."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot(a, b):
    """(r, s) · (s, m) → (r, m)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _lu_panel_v2_kernel(pt_in, pt_ref, pidx_ref, ok_ref, *, bp, mp, kmax, mvalid):
    """pt: (bp, mp) transposed panel. Lanes = original rows."""
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)
    # f32 mask (1.0 = lane already pivoted): Mosaic cannot legalize
    # loop-carried i1 vectors
    used0 = (lanes1 >= mvalid).astype(jnp.float32)
    ok0 = jnp.ones((), jnp.bool_)

    nsub = (kmax + SB - 1) // SB
    used = used0
    ok = ok0
    for s in range(nsub):
        sb0 = s * SB
        nj = min(SB, kmax - sb0)

        def step(jl, carry):
            used_f, ok = carry
            used = used_f != 0
            slab = pt_ref[sb0:sb0 + SB, :]                     # (SB, m)
            colj = jnp.sum(jnp.where(sub_iota == jl, slab, 0.0),
                           axis=0, keepdims=True)              # (1, m)
            mag = jnp.where(used, -1.0, jnp.abs(colj))
            p = jax.lax.argmax(mag[0], 0, jnp.int32)
            onehot = lanes1 == p                               # (1, m)
            pv = jnp.sum(jnp.where(onehot, colj, 0.0))
            ok = ok & (pv != 0)
            safe = jnp.where(pv == 0, 1.0, pv)
            mult = jnp.where(used | onehot, 0.0, colj / safe)  # (1, m)
            packed = jnp.where(used | onehot, colj, mult)
            uvals = jnp.sum(jnp.where(onehot, slab, 0.0),
                            axis=1, keepdims=True)             # (SB, 1)
            upd = uvals * mult                                 # (SB, m)
            pt_ref[sb0:sb0 + SB, :] = jnp.where(
                sub_iota == jl, packed,
                jnp.where(sub_iota > jl, slab - upd, slab))
            pidx_ref[sb0 + jl] = p
            return jnp.where(onehot, 1.0, used_f), ok

        used, ok = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nj), step,
                                     (used, ok))

        sb_end = sb0 + SB
        if sb_end >= bp:
            continue
        # ---- deferred rank-SB update of all later panel columns ----
        # S[i] = one-hot of pivot lane of step sb0+i (identity rows for the
        # tail of a partial sub-block: harmless, their M rows are zero)
        s_rows = []
        for i in range(SB):
            if i < nj:
                pi = pidx_ref[sb0 + i]
                s_rows.append((lanes1 == pi).astype(jnp.float32))
            else:
                s_rows.append(jnp.zeros((1, mp), jnp.float32))
        S = jnp.concatenate(s_rows, axis=0)                    # (SB, m)
        # used_before_i = used_end & ~(S[i] | S[i+1] | ...)
        slab = pt_ref[sb0:sb0 + SB, :]
        m_rows = []
        suffix = jnp.zeros((1, mp), jnp.bool_)
        for i in range(SB - 1, -1, -1):
            suffix = suffix | (S[i:i + 1] != 0)
            ub_i = (used != 0) & ~suffix                       # (1, m)
            m_rows.append(jnp.where(ub_i | (S[i:i + 1] != 0), 0.0,
                                    slab[i:i + 1]))
        M = jnp.concatenate(list(reversed(m_rows)), axis=0)    # (SB, m)
        Lsub = _dotT(M, S)                                     # (SB, SB)
        # Llow[j, i] = mult_i[p_j] = Lsubᵀ, strictly lower by construction
        eye = jnp.eye(SB, dtype=jnp.float32)
        llow = jnp.transpose(Lsub) * (1.0 - eye)
        p_acc = -llow
        n_inv = eye + p_acc
        span = 2
        while span < SB:
            p_acc = _dot(p_acc, p_acc)
            n_inv = n_inv + _dot(p_acc, n_inv)
            span *= 2
        # chunk the rank-SB update over row groups: a single (rest, m) slab
        # update materializes ~3·rest·m f32 temporaries, which blows past
        # VMEM at m = 4096 (measured: 0.338 → 0.158 ms per (4096,128) leaf).
        # Below that the temporaries fit and chunking only adds per-dot
        # overhead (0.056 → 0.095 ms at 2048), so chunk large panels only.
        RCH = 32 if mp > 2048 else bp
        for c0 in range(sb_end, bp, RCH):
            cw = min(RCH, bp - c0)
            lchunk = pt_ref[c0:c0 + cw, :]                     # (cw, m)
            Y = _dotT(lchunk, S)                               # (cw, SB)
            yp = _dotT(Y, n_inv)                               # Y @ N^T
            pt_ref[c0:c0 + cw, :] = lchunk - _dot(yp, M)
    ok_ref[0, 0] = ok.astype(jnp.int32)


@jax.jit
def lu_panel_v2_pallas(panel):
    """Partially-pivoted LU of an (m, b) f32 panel, transposed/virtual-pivot.

    Returns ``(packed, perm, nt, ok)`` matching ``linalg.lu._panel_lu``
    (``nt`` is parity-equivalent to the transposition count — only its parity
    is observable, via the determinant sign).
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, SB)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_lu_panel_v2_kernel, bp=bp, mp=mp,
                               kmax=kmax, mvalid=m)
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
        input_output_aliases={0: 0},  # halve VMEM: update the panel in place
    )(pt)
    virt = jnp.transpose(pt_out[:b, :m])                       # (m, b)
    pidx = pidx[:kmax]
    # physical row order: pivots first (in elimination order), then the rest
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
