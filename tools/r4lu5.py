"""Round-4 LU leaf v5 experiments: kill the per-step extraction dots.

MXU-pass accounting of the v4 kernel at (4096, 256), sb=8 (the measured
0.415 ms panel): the per-step ``uvals = dotT(rest, onehot)`` contracts
K = m = 4096 at HIGHEST (6 bf16 passes) -> 32 K-tiles x 6 = 192 MXU ops per
step x 256 steps ~ 49k MXU ops, i.e. the *extraction of one lane* costs more
than the entire deferred rank-sb coupling. Variants measured here:

  v4      — baseline (leaf_v4.lu_panel_v4_pallas)
  win     — uvals + pv read through a 128-aligned dynamic lane WINDOW around
            the pivot (K=128, 1 K-tile): extraction is exact and 32x fewer
            MXU passes
  winb3   — win + coupling dots (y / update) in manual bf16x3 (3 DEFAULT
            passes instead of 6 HIGHEST): matches the library's out-of-kernel
            GEMM precision policy
  sb16    — winb3 at sb=16 (halves coupling rounds)

Run: python tools/r4lu5.py [variants...]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from tools._bench_util import timeit, dep  # noqa: E402

_NT = (((1,), (1,)), ((), ()))  # contract lanes of both operands


def _dotT_hi(a, b):
    return jax.lax.dot_general(a, b, _NT, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dotT_b3(a, b):
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(ah, bh, _NT, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ah, bl, _NT, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(al, bh, _NT, preferred_element_type=jnp.float32)
    return acc


_NN = (((1,), (0,)), ((), ()))


def _dot_hi(a, b):
    return jax.lax.dot_general(a, b, _NN, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot_b3(a, b):
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(ah, bh, _NN, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ah, bl, _NN, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(al, bh, _NN, preferred_element_type=jnp.float32)
    return acc


def _neumann_unit_inv(r, nb):
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
                  bp, mp, kmax, mvalid, sb, rch, b3):
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
            p = jax.lax.argmax(mag[0], 0, jnp.int32)
            onehot = (lanes1 == p).astype(jnp.float32)
            # 128-aligned dynamic lane window around the pivot: all
            # extraction (pivot value + sub-block column values at the pivot
            # lane) contracts K=128 instead of K=m
            w0 = (p // 128) * 128
            oh_w = (lanes_w == (p - w0)).astype(jnp.float32)  # (1, 128)
            pv = jnp.sum(jnp.where(lanes_w == (p - w0),
                                   pt_ref[r:r + 1, pl.ds(w0, 128)], 0.0))
            ok = ok & (pv != 0)
            safe = jnp.where(pv == 0, 1.0, pv)
            dead = (used + onehot) != 0
            mult = jnp.where(dead, 0.0, colj * (1.0 / safe))
            pt_ref[r:r + 1, :] = jnp.where(dead, colj, mult)
            m_ref[jl:jl + 1, :] = mult
            s_ref[jl:jl + 1, :] = onehot
            if jl < nj - 1:
                rest_w = pt_ref[r + 1:sb0 + sb, pl.ds(w0, 128)]
                uvals = _dotT_hi(rest_w, oh_w)             # (k, 1), exact
                rest = pt_ref[r + 1:sb0 + sb, :]
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
        dot_nt = _dotT_b3 if b3 else _dotT_hi
        dot_nn = _dot_b3 if b3 else _dot_hi
        for c0 in range(sb_end, bp, rch):
            cw = min(rch, bp - c0)
            lchunk = pt_ref[c0:c0 + cw, :]
            y = dot_nt(lchunk, smat)                       # (cw, sb)
            yp = _dotT_hi(y, n_inv)                        # y @ n_inv^T
            pt_ref[c0:c0 + cw, :] = lchunk - dot_nn(yp, mmat)
    ok_ref[0, 0] = ok.astype(jnp.int32)


def _round_up(x, q):
    return ((x + q - 1) // q) * q


@functools.partial(jax.jit, static_argnames=("sb", "rch", "b3"))
def lu_panel_v5(panel, *, sb: int = 8, rch: int = 128, b3: bool = False):
    m, b = panel.shape
    kmax = min(m, b)
    bp = _round_up(b, sb)
    mp = _round_up(m, 128)
    pt = jnp.transpose(panel)
    if (bp, mp) != (b, m):
        pt = jnp.pad(pt, ((0, bp - b), (0, mp - m)))
    kernel = functools.partial(_lu_v5_kernel, bp=bp, mp=mp, kmax=kmax,
                               mvalid=m, sb=sb, rch=rch, b3=b3)
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
    virt = jnp.transpose(pt_out[:b, :m])
    pidx = pidx[:kmax]
    big = jnp.int32(m + kmax)
    ranks = jnp.full((m,), big, jnp.int32)
    ranks = ranks.at[pidx].set(jnp.arange(kmax, dtype=jnp.int32))
    ranks = jnp.where(ranks < big, ranks,
                      kmax + jnp.arange(m, dtype=jnp.int32))
    perm = jnp.argsort(ranks).astype(jnp.int32)
    return jnp.take(virt, perm, axis=0), perm


def _check(fn, m, b, **kw):
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((m, b)), jnp.float32)
    packed, perm = fn(a, **kw)
    pk = np.asarray(packed, np.float64)
    l = np.tril(pk, -1)[:, :b] + np.eye(m, b)
    u = np.triu(pk[:b, :b])
    resid = np.abs(np.asarray(a)[np.asarray(perm)] - l @ u).max()
    return resid


def main():
    variants = sys.argv[1:] or ["v4", "win", "winb3", "sb16"]
    m, b = 4096, 256
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((m, b)), jnp.float32)
    a = a.block_until_ready()
    if "v4" in variants:
        from faer_tpu.ops.pallas.leaf_v4 import lu_panel_v4_pallas

        r = _check(lambda x: lu_panel_v4_pallas(x)[:2], m, b)
        t = timeit(lambda x: dep(a, lu_panel_v4_pallas(x)[0]), a)
        print(f"v4    ({m},{b}): {t*1e6:8.1f} us  resid {r:.1e}", flush=True)
    for name, kw in (("win", dict(b3=False)), ("winb3", dict(b3=True)),
                     ("sb16", dict(b3=True, sb=16))):
        if name not in variants:
            continue
        r = _check(lu_panel_v5, m, b, **kw)
        t = timeit(lambda x: dep(a, lu_panel_v5(x, **kw)[0]), a)
        print(f"{name:5s} ({m},{b}): {t*1e6:8.1f} us  resid {r:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
