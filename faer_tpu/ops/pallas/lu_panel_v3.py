"""Transposed LU panel kernel, v3: fully unrolled sub-block steps.

Same contract and virtual-pivot design as v2 (``lu_panel_v2.py``, faer parity
``faer/src/linalg/lu/partial_pivoting/factor.rs`` panel loop), but the
8-column sub-block elimination is a *Python-unrolled* straight line instead of
a ``fori_loop`` over a traced column index:

* the current column is addressed directly — ``pt_ref[r:r+1, :]`` — instead of
  a masked sum over the whole (8, m) slab;
* the eager update touches only the (SB−1−jl, m) rows *below* the current
  column instead of masked-writing the full slab;
* the pivot-row value gather is one (k, m)·(m, 1) MXU dot against the one-hot
  lane instead of a cross-lane masked reduce;
* no per-step loop-carry legalization (the ``used`` mask flows through
  registers).

This trades Mosaic program size (≈ b × ~10 vector ops) for per-step cost —
the panel's serial chain is the TPU factorization floor (BENCH_NOTES round-2:
panel factors are 5.0 ms of LU's 7.2 ms at 4096).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SB = 8


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


def _lu_panel_v3_kernel(pt_in, pt_ref, pidx_ref, ok_ref, *, bp, mp, kmax, mvalid):
    """pt: (bp, mp) transposed panel. Lanes = original rows."""
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    used = (lanes1 >= mvalid).astype(jnp.float32)     # 1.0 = lane pivoted
    ok = jnp.ones((), jnp.bool_)

    nsub = (kmax + SB - 1) // SB
    for s in range(nsub):
        sb0 = s * SB
        nj = min(SB, kmax - sb0)
        onehots = []
        for jl in range(nj):
            r = sb0 + jl
            colj = pt_ref[r:r + 1, :]                          # (1, m)
            mag = jnp.where(used != 0, -1.0, jnp.abs(colj))
            p = jax.lax.argmax(mag[0], 0, jnp.int32)
            onehot = (lanes1 == p).astype(jnp.float32)         # (1, m)
            pv = jnp.sum(onehot * colj)
            ok = ok & (pv != 0)
            safe = jnp.where(pv == 0, 1.0, pv)
            dead = (used + onehot) != 0
            mult = jnp.where(dead, 0.0, colj / safe)           # (1, m)
            pt_ref[r:r + 1, :] = jnp.where(dead, colj, mult)
            if jl < nj - 1:
                rest = pt_ref[r + 1:sb0 + SB, :]               # (SB-1-jl, m)
                uvals = _dotT(rest, onehot)                    # (k, 1)
                pt_ref[r + 1:sb0 + SB, :] = rest - uvals * mult
            used = used + onehot
            onehots.append(onehot)
            pidx_ref[r] = p

        sb_end = sb0 + SB
        if sb_end >= bp:
            continue
        # ---- deferred rank-SB update of all later panel columns ----
        while len(onehots) < SB:
            onehots.append(jnp.zeros((1, mp), jnp.float32))
        S = jnp.concatenate(onehots, axis=0)                   # (SB, m)
        slab = pt_ref[sb0:sb0 + SB, :]
        # M[i] = mult row of step i: zero at pivoted-lane positions of steps
        # ≤ i and at lanes pivoted before this sub-block
        m_rows = []
        suffix = jnp.zeros((1, mp), jnp.float32)
        for i in range(SB - 1, -1, -1):
            suffix = suffix + S[i:i + 1]
            # lanes dead BEFORE step i = all dead lanes minus this sub-block's
            # pivots from steps ≥ i; the step-i pivot lane itself also carries
            # the packed column value, not a multiplier
            used_before = (used - suffix) > 0.5
            dead_i = used_before | (S[i:i + 1] != 0)
            m_rows.append(jnp.where(dead_i, 0.0, slab[i:i + 1]))
        M = jnp.concatenate(list(reversed(m_rows)), axis=0)    # (SB, m)
        Lsub = _dotT(M, S)                                     # (SB, SB)
        eye = jnp.eye(SB, dtype=jnp.float32)
        llow = jnp.transpose(Lsub) * (1.0 - eye)
        p_acc = -llow
        n_inv = eye + p_acc
        span = 2
        while span < SB:
            p_acc = _dot(p_acc, p_acc)
            n_inv = n_inv + _dot(p_acc, n_inv)
            span *= 2
        RCH = 32 if mp > 2048 else bp
        for c0 in range(sb_end, bp, RCH):
            cw = min(RCH, bp - c0)
            lchunk = pt_ref[c0:c0 + cw, :]                     # (cw, m)
            Y = _dotT(lchunk, S)                               # (cw, SB)
            yp = _dotT(Y, n_inv)                               # Y @ N^T
            pt_ref[c0:c0 + cw, :] = lchunk - _dot(yp, M)
    ok_ref[0, 0] = ok.astype(jnp.int32)


@jax.jit
def lu_panel_v3_pallas(panel):
    """Partially-pivoted LU of an (m, b) f32 panel — unrolled v3 kernel.

    Same return contract as ``lu_panel_v2_pallas``: ``(packed, perm, nt, ok)``
    with ``nt`` parity-equivalent to the transposition count.
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, SB)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_lu_panel_v3_kernel, bp=bp, mp=mp,
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
        input_output_aliases={0: 0},
    )(pt)
    virt = jnp.transpose(pt_out[:b, :m])                       # (m, b)
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
