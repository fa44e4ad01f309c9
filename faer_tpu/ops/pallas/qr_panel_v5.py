"""v5 QR panel kernel: v4's reflector-scratch structure with bf16x3
deferred-coupling dots and sb=16 sub-blocks.

Same lever as the LU v5 kernel (``lu_panel_v5.py``): the deferred compact-WY
chunk applies ran at HIGHEST (6 bf16 MXU passes per dot); the library's
out-of-kernel f32 GEMM policy is bf16x3 (3 passes), and sb=16 halves the
coupling rounds.  The in-panel per-reflector applies (w dots) stay HIGHEST —
they sit on the serial critical path where accuracy buys stability of the
immediately-next reflector.

Reference parity: faer ``qr/no_pivoting/factor.rs`` unblocked panel — same
contract as ``qr_panel_v4_pallas``: ``(packed, taus)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT = (((1,), (1,)), ((), ()))
_NN = (((1,), (0,)), ((), ()))


def _dotT_hi(a, b):
    return jax.lax.dot_general(a, b, _NT, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot_hi(a, b):
    return jax.lax.dot_general(a, b, _NN, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _split_b3(a):
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return ah, al


def _dotT_b3(a, b):
    ah, al = _split_b3(a)
    bh, bl = _split_b3(b)
    acc = jax.lax.dot_general(ah, bh, _NT, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ah, bl, _NT, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(al, bh, _NT, preferred_element_type=jnp.float32)
    return acc


def _dot_b3(a, b):
    ah, al = _split_b3(a)
    bh, bl = _split_b3(b)
    acc = jax.lax.dot_general(ah, bh, _NN, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ah, bl, _NN, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(al, bh, _NN, preferred_element_type=jnp.float32)
    return acc


def _neumann_unit_inv(r, nb: int):
    eye = jnp.eye(nb, dtype=jnp.float32)
    p = -r
    s = eye + p
    span = 2
    while span < nb:
        p = _dot_hi(p, p)
        s = s + _dot_hi(p, s)
        span *= 2
    return s


def _qr_v5_kernel(pt_in, pt_ref, tau_ref, v_ref, tau_v_ref, *,
                  bp, mp, kmax, mvalid, sb, rch):
    """Transposed (bp, mp) Householder panel (v4 dataflow, v5 dot policy)."""
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
                w = _dotT_hi(rest, v)                      # (k, 1)
                pt_ref[j + 1:sb0 + sb, :] = rest - (tau * w) * v

        sb_end = sb0 + sb
        if sb_end >= bp:
            continue
        vmat = v_ref[:]                                    # (sb, m)
        tau_v = tau_v_ref[0:1, :]                          # (1, sb)
        live = (tau_v != 0).astype(jnp.float32)
        tau_safe = jnp.where(tau_v == 0, 1.0, tau_v)
        g = _dotT_hi(vmat, vmat)                           # (sb, sb)
        eye = jnp.eye(sb, dtype=jnp.float32)
        iu = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
        dinv_row = tau_safe
        r_up = jnp.where(iu < ju, g, 0.0) * jnp.reshape(dinv_row, (sb, 1))
        t_mat = _neumann_unit_inv(r_up, sb) * dinv_row
        t_mat = t_mat * live * jnp.reshape(live, (sb, 1))
        for c0 in range(sb_end, bp, rch):
            cw = min(rch, bp - c0)
            later = pt_ref[c0:c0 + cw, :]
            y = _dotT_b3(later, vmat)                      # (cw, sb)
            z = _dot_hi(y, t_mat)                          # y @ T (small)
            pt_ref[c0:c0 + cw, :] = later - _dot_b3(z, vmat)


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


@functools.partial(jax.jit, static_argnames=("sb", "rch"))
def qr_panel_v5_pallas(panel, *, sb: int = 16, rch: int = 128):
    """Householder QR of an (m, b) f32 panel — v5 kernel.

    Same return contract as ``qr_panel_v4_pallas``: ``(packed, taus)``.
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, sb)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_qr_v5_kernel, bp=bp, mp=mp,
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
