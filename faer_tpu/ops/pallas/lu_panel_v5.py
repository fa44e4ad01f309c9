"""v5 LU panel kernel: v4's virtual-pivot structure with bf16x3 coupling
dots and (optionally) windowed pivot-value extraction.

MXU-pass accounting of the v4 kernel at (4096, 256) sb=8 (tools/r4lu5.py):
the deferred coupling dots ran at HIGHEST (6 bf16 MXU passes each); dropping
the two non-exact couplings to manual bf16x3 (3 passes — the library-wide
out-of-kernel f32 GEMM policy, see ``ops/matmul.py``) and doubling the
sub-block to sb=16 (halves coupling rounds) measured 269.7 µs vs v4's
422.8 µs at (4096, 256) f32.  The 128-aligned dynamic lane WINDOW around the
pivot (extraction contracts K=128 instead of K=m) measured slightly SLOWER
stand-alone (469.4 µs — the dynamic-slice address math costs more than the
saved K-tiles) but is what the 269.7 µs sb16 config used; both variants are
kept behind the ``win`` flag.  The one-hot selection dots that must stay
exact (pivot-row extraction ``uvals``, ``lsub``, ``y``) remain HIGHEST.

Reference parity: faer ``lu/partial_pivoting/factor.rs`` unblocked panel —
same contract as ``lu_panel_v4_pallas``: ``(packed, perm, nt, ok)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT = (((1,), (1,)), ((), ()))  # contract lanes of both operands
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


def _lu_v5_kernel(pt_in, pt_ref, pidx_ref, ok_ref, m_ref, s_ref, *,
                  bp, mp, kmax, mvalid, sb, rch, win, maxmin):
    """Transposed (bp, mp) panel; lanes = original rows; virtual pivoting."""
    pt_ref[:] = pt_in[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    lanes_w = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
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
            if maxmin:
                # plain max reduce + first-match min-index: two simple
                # reduces can beat argmax's index-reduce lowering
                mv = jnp.max(mag)
                p = jnp.min(jnp.where(mag[0] == mv, lanes1[0],
                                      jnp.int32(mp)))
            else:
                p = jax.lax.argmax(mag[0], 0, jnp.int32)
            onehot = (lanes1 == p).astype(jnp.float32)
            if win:
                # 128-aligned dynamic lane window around the pivot: the
                # pivot-value read contracts K=128 instead of K=m
                w0 = (p // 128) * 128
                oh_w = (lanes_w == (p - w0)).astype(jnp.float32)
                pv = jnp.sum(jnp.where(lanes_w == (p - w0),
                                       pt_ref[r:r + 1, pl.ds(w0, 128)], 0.0))
            else:
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
                if win:
                    rest_w = pt_ref[r + 1:sb0 + sb, pl.ds(w0, 128)]
                    uvals = _dotT_hi(rest_w, oh_w)         # (k, 1), exact
                else:
                    uvals = _dotT_hi(rest, onehot)
                pt_ref[r + 1:sb0 + sb, :] = rest - uvals * mult
            used = used + onehot
            pidx_ref[r] = p

        sb_end = sb0 + sb
        if sb_end >= bp:
            continue
        mmat = m_ref[:]                                    # (sb, m)
        smat = s_ref[:]
        lsub = _dotT_hi(mmat, smat)                        # (sb, sb), exact
        eye = jnp.eye(sb, dtype=jnp.float32)
        llow = jnp.transpose(lsub) * (1.0 - eye)
        n_inv = _neumann_unit_inv(llow, sb)
        for c0 in range(sb_end, bp, rch):
            cw = min(rch, bp - c0)
            lchunk = pt_ref[c0:c0 + cw, :]
            y = _dotT_b3(lchunk, smat)                     # (cw, sb)
            yp = _dotT_hi(y, n_inv)                        # y @ n_inv^T
            pt_ref[c0:c0 + cw, :] = lchunk - _dot_b3(yp, mmat)
    ok_ref[0, 0] = ok.astype(jnp.int32)


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


@functools.partial(jax.jit, static_argnames=("sb", "rch", "win", "maxmin"))
def lu_panel_v5_pallas(panel, *, sb: int = 16, rch: int = 128,
                       win: bool = True, maxmin: bool = False):
    """Partially-pivoted LU of an (m, b) f32 panel — v5 kernel.

    Same return contract as ``lu_panel_v4_pallas``: ``(packed, perm, nt,
    ok)`` with ``nt`` the minimal transposition count of the permutation.
    """
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, sb)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_lu_v5_kernel, bp=bp, mp=mp, kmax=kmax,
                               mvalid=m, sb=sb, rch=rch, win=win,
                               maxmin=maxmin)
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
