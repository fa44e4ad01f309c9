"""Transposed Householder QR panel kernel, v3: fully unrolled sub-blocks.

Same contract as ``qr_panel_v2_pallas`` (LAPACK-convention reflectors,
parity with ``linalg.qr._panel_qr``; faer
``qr/no_pivoting/factor.rs`` panel), with the ``lu_panel_v3`` treatment:
the 8-column sub-block loop is Python-unrolled so each step addresses its
column row directly (no masked (8, m)-slab extraction), the eager update
touches only the rows below the current one, and the reflector dot products
run on the MXU.  The panel's serial reflector chain is the QR factorization
floor on TPU (BENCH_NOTES round-2).
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
    """(r, m) · (s, m)ᵀ → (r, s): contract the lane dimension."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _qr_panel_v3_kernel(pt_in, pt_ref, tau_ref, *, bp, mp, kmax, mvalid):
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    inrange = lanes1 < mvalid

    nsub = (kmax + SB - 1) // SB
    for s in range(nsub):
        sb0 = s * SB
        nj = min(SB, kmax - sb0)
        for jl in range(nj):
            j = sb0 + jl
            r = sb0 + jl
            colj = pt_ref[r:r + 1, :]                           # (1, m)
            lane_j = lanes1 == j
            below = (lanes1 > j) & inrange
            alpha = jnp.sum(jnp.where(lane_j, colj, 0.0))
            tail_sq = jnp.sum(jnp.where(below, colj * colj, 0.0))
            norm = jnp.sqrt(alpha * alpha + tail_sq)
            sign = jnp.where(alpha >= 0, jnp.ones_like(alpha),
                             -jnp.ones_like(alpha))
            beta = -sign * norm
            is_id = tail_sq == 0.0
            safe_s = jnp.where(is_id, 1.0, alpha - beta)
            safe_b = jnp.where(is_id, 1.0, beta)
            tau = jnp.where(is_id, 0.0, (beta - alpha) / safe_b)
            beta = jnp.where(is_id, alpha, beta)
            v = jnp.where(below, colj / safe_s, 0.0)
            v = jnp.where(is_id, jnp.zeros_like(v), v)
            v = jnp.where(lane_j, 1.0, v)                       # (1, m)
            tau_ref[j] = tau
            pt_ref[r:r + 1, :] = jnp.where(
                lane_j, beta, jnp.where(below, v, colj))
            if jl < nj - 1:
                rest = pt_ref[r + 1:sb0 + SB, :]                # (k, m)
                w = _dotT(rest, v)                              # (k, 1)
                pt_ref[r + 1:sb0 + SB, :] = rest - (tau * w) * v

        sb_end = sb0 + SB
        if sb_end >= bp:
            continue
        # ---- deferred compact-WY apply to all later panel columns ----
        slab = pt_ref[sb0:sb0 + SB, :]
        v_rows = []
        taus = []
        for i in range(SB):
            j = sb0 + i
            if i < nj:
                vi = jnp.where(lanes1 == j, 1.0,
                               jnp.where((lanes1 > j) & inrange,
                                         slab[i:i + 1], 0.0))
                taus.append(tau_ref[j])
            else:
                vi = jnp.zeros((1, mp), jnp.float32)
                taus.append(jnp.zeros((), jnp.float32))
            v_rows.append(vi)
        V = jnp.concatenate(v_rows, axis=0)                     # (SB, m)
        tau_v = jnp.stack(taus)                                 # (SB,)
        live = (tau_v != 0).astype(jnp.float32)
        tau_safe = jnp.where(tau_v == 0, 1.0, tau_v)
        G = _dotT(V, V)                                         # (SB, SB)
        eye = jnp.eye(SB, dtype=jnp.float32)
        iu = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
        tinv = jnp.where(iu < ju, G, 0.0) + eye / tau_safe[None, :] * eye
        d = jnp.sum(tinv * eye, axis=0)                         # diag = 1/τ
        lo = jnp.transpose(tinv) * (1.0 - eye) * (1.0 / d)[:, None]
        p_acc = -lo
        n_inv = eye + p_acc
        span = 2
        while span < SB:
            p_acc = _dot(p_acc, p_acc)
            n_inv = n_inv + _dot(p_acc, n_inv)
            span *= 2
        n_inv = n_inv * (1.0 / d)[None, :]
        t_mat = jnp.transpose(n_inv)                            # T (upper)
        t_mat = t_mat * live[None, :] * live[:, None]
        RCH = 32 if mp > 2048 else bp
        for c0 in range(sb_end, bp, RCH):
            cw = min(RCH, bp - c0)
            later = pt_ref[c0:c0 + cw, :]
            Y = _dotT(later, V)                                 # (cw, SB)
            Z = _dot(Y, t_mat)                                  # (cw, SB)
            pt_ref[c0:c0 + cw, :] = later - _dot(Z, V)


@jax.jit
def qr_panel_v3_pallas(panel):
    """Householder QR of an (m, b) f32 panel — unrolled v3 kernel.

    Same return contract as ``qr_panel_v2_pallas``: ``(packed, taus)``.
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, SB)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_qr_panel_v3_kernel, bp=bp, mp=mp,
                               kmax=kmax, mvalid=m)
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
        input_output_aliases={0: 0},
    )(pt)
    return jnp.transpose(pt_out[:b, :m]), taus[:kmax]
