"""Transposed, sub-blocked Householder QR panel kernel (v2).

Reference parity: the unblocked panel of
``faer/src/linalg/qr/no_pivoting/factor.rs`` (same LAPACK-convention
reflectors as ``linalg.qr._panel_qr``: H = I − τ v vᵀ, v[0] = 1, β
real-signed).

Same design as ``lu_panel_v2``: the panel lives TRANSPOSED in VMEM
(columns = sublanes, rows = lanes); each reflector step touches only its
8-column sub-block slab (8, m); the coupling to later panel columns is
deferred to sub-block boundaries and applied as one compact-WY block
(Qᵀ = I − V Tᵀ Vᵀ) — two MXU matmuls plus an in-register 8×8 T inverse
(Neumann doubling, exact for triangular). Real f32 only.
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


def _qr_panel_v2_kernel(pt_in, pt_ref, tau_ref, *, bp, mp, kmax, mvalid):
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)
    inrange = lanes1 < mvalid

    nsub = (kmax + SB - 1) // SB
    for s in range(nsub):
        sb0 = s * SB
        nj = min(SB, kmax - sb0)

        def step(jl, _):
            j = sb0 + jl
            slab = pt_ref[sb0:sb0 + SB, :]                      # (SB, m)
            colj = jnp.sum(jnp.where(sub_iota == jl, slab, 0.0),
                           axis=0, keepdims=True)               # (1, m)
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
            # eager H_j on the later columns of this sub-block
            w = jnp.sum(v * slab, axis=1, keepdims=True)        # (SB, 1)
            upd = tau * w * v                                   # (SB, m)
            packed = jnp.where(lane_j, beta, jnp.where(below, v, colj))
            pt_ref[sb0:sb0 + SB, :] = jnp.where(
                sub_iota == jl, packed,
                jnp.where(sub_iota > jl, slab - upd, slab))
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nj), step, jnp.int32(0))

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
        # invert the upper-triangular Tinv: lower Neumann on its transpose
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
        # chunk the block apply over row groups past the VMEM cliff (same
        # fix as lu_panel_v2: a single (rest, m) slab update spills VMEM at
        # m = 4096)
        RCH = 32 if mp > 2048 else bp
        for c0 in range(sb_end, bp, RCH):
            cw = min(RCH, bp - c0)
            later = pt_ref[c0:c0 + cw, :]
            Y = _dotT(later, V)                                 # (cw, SB)
            Z = _dot(Y, t_mat)                                  # (cw, SB)
            pt_ref[c0:c0 + cw, :] = later - _dot(Z, V)


@jax.jit
def qr_panel_v2_pallas(panel):
    """Householder QR of an (m, b) f32 panel. Returns ``(packed, taus)``
    matching ``linalg.qr._panel_qr``."""
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, SB)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_qr_panel_v2_kernel, bp=bp, mp=mp,
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
