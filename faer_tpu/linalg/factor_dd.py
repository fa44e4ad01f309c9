"""Extended-precision (double-word, "fx128") LLT factor + solve.

Reference parity: faer runs every decomposition over ``fx128`` (double-double
scalars, ``faer-traits/src/lib.rs:5108``, ``:5329+``). This module wires the
repo's DD arithmetic (``utils.doubledouble``) through one real decomposition
family end-to-end: Cholesky LLT factor, triangular solves, and the
``llt_solve_dd`` driver (faer ``cholesky/llt/{factor,solve}.rs`` over fx128).

TPU-native design: a DD matrix is a ``(hi, lo)`` pytree pair; all inner loops
are ``lax.fori_loop`` chains of masked elementwise DD ops (VPU work — like
faer's fx128, which runs on the generic non-SIMD-dispatch microkernels), and
the blocked driver's trailing update is the DD GEMM. Everything is jittable.

Accuracy: with the default f32 base a DD value carries ~48 mantissa bits; on
TPU the composed factor+solve reaches ~1e-12 relative residual (the CPU
backend's LLVM pipeline contracts across the error-free transformations at
default optimization level — see ``utils.doubledouble`` docstring).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core.errors import LltInfo
from faer_tpu.utils import doubledouble as dd
from faer_tpu.utils.doubledouble import DD


def _sel(cond, a: DD, b: DD) -> DD:
    return DD(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def _col(a: DD, j) -> DD:
    return DD(jax.lax.dynamic_slice_in_dim(a.hi, j, 1, 1)[:, 0],
              jax.lax.dynamic_slice_in_dim(a.lo, j, 1, 1)[:, 0])


def _set_col(a: DD, j, col: DD) -> DD:
    return DD(jax.lax.dynamic_update_slice_in_dim(a.hi, col.hi[:, None], j, 1),
              jax.lax.dynamic_update_slice_in_dim(a.lo, col.lo[:, None], j, 1))


def _panel_llt_dd(a: DD):
    """Unblocked DD LLT of a (b, b) lower block (masked fori chain)."""
    b = a.hi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]

    def body(j, state):
        a, ok = state
        col = _col(a, j)
        pj_hi = jax.lax.dynamic_slice_in_dim(col.hi, j, 1)[0]
        pj_lo = jax.lax.dynamic_slice_in_dim(col.lo, j, 1)[0]
        pj = DD(pj_hi, pj_lo)
        ok = ok & (pj.hi > 0)
        safe = _sel(pj.hi > 0, pj, dd.from_float(jnp.ones((), a.hi.dtype)))
        piv = dd.sqrt(safe)
        below = rows > j
        scaled = dd.div(col, DD(jnp.broadcast_to(piv.hi, col.hi.shape),
                                jnp.broadcast_to(piv.lo, col.lo.shape)))
        col = _sel(below, scaled, col)
        col = _sel(rows == j, DD(jnp.broadcast_to(piv.hi, col.hi.shape),
                                 jnp.broadcast_to(piv.lo, col.lo.shape)), col)
        a = _set_col(a, j, col)
        # trailing rank-1 on the lower triangle: A[r,c] -= L[r,j] L[c,j]
        mask = below[:, None] & below[None, :]
        outer = dd.mul(DD(col.hi[:, None], col.lo[:, None]),
                       DD(col.hi[None, :], col.lo[None, :]))
        upd = _sel(mask, outer, dd.from_float(jnp.zeros_like(a.hi)))
        return dd.sub(a, upd), ok

    a, ok = jax.lax.fori_loop(0, b, body, (a, jnp.ones((), jnp.bool_)))
    tril = jnp.tril(jnp.ones_like(a.hi)) != 0
    return _sel(tril, a, dd.from_float(jnp.zeros_like(a.hi))), ok


def _solve_lower_cols_dd(l: DD, b: DD, *, unit_rows_above=None) -> DD:
    """Forward substitution ``L X = B`` in DD (fori over columns of L)."""
    n = l.hi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(j, x: DD):
        lcol = _col(l, j)
        djj = DD(jax.lax.dynamic_slice_in_dim(lcol.hi, j, 1)[0],
                 jax.lax.dynamic_slice_in_dim(lcol.lo, j, 1)[0])
        xrow = DD(jax.lax.dynamic_slice_in_dim(x.hi, j, 1, 0),
                  jax.lax.dynamic_slice_in_dim(x.lo, j, 1, 0))        # (1, k)
        xj = dd.div(xrow, DD(jnp.broadcast_to(djj.hi, xrow.hi.shape),
                             jnp.broadcast_to(djj.lo, xrow.lo.shape)))
        x = DD(jax.lax.dynamic_update_slice_in_dim(x.hi, xj.hi, j, 0),
               jax.lax.dynamic_update_slice_in_dim(x.lo, xj.lo, j, 0))
        below = (rows > j)[:, None]
        upd = dd.mul(DD(lcol.hi[:, None], lcol.lo[:, None]),
                     DD(jnp.broadcast_to(xj.hi, (n, xj.hi.shape[1])),
                        jnp.broadcast_to(xj.lo, (n, xj.lo.shape[1]))))
        upd = _sel(below, upd, dd.from_float(jnp.zeros_like(x.hi)))
        return dd.sub(x, upd)

    return jax.lax.fori_loop(0, n, body, b)


def _solve_upper_from_lower_t_dd(l: DD, b: DD) -> DD:
    """Back substitution ``Lᵀ X = B`` in DD (fori over columns, reversed)."""
    n = l.hi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(i, x: DD):
        j = n - 1 - i
        lcol = _col(l, j)                 # column j of L = row j of Lᵀ
        djj = DD(jax.lax.dynamic_slice_in_dim(lcol.hi, j, 1)[0],
                 jax.lax.dynamic_slice_in_dim(lcol.lo, j, 1)[0])
        xrow = DD(jax.lax.dynamic_slice_in_dim(x.hi, j, 1, 0),
                  jax.lax.dynamic_slice_in_dim(x.lo, j, 1, 0))
        xj = dd.div(xrow, DD(jnp.broadcast_to(djj.hi, xrow.hi.shape),
                             jnp.broadcast_to(djj.lo, xrow.lo.shape)))
        x = DD(jax.lax.dynamic_update_slice_in_dim(x.hi, xj.hi, j, 0),
               jax.lax.dynamic_update_slice_in_dim(x.lo, xj.lo, j, 0))
        # rows r < j of B lose Lᵀ[r, j]·x_j = L[j, r]... use column j of L:
        # Lᵀ X subtraction for remaining rows r<j needs L[j, r] = row j of L,
        # i.e. lane r of L's row j — equivalently column r... L is lower:
        # (Lᵀ)[r, j] = L[j, r]; gather row j of L.
        lrow = DD(jax.lax.dynamic_slice_in_dim(l.hi, j, 1, 0)[0],
                  jax.lax.dynamic_slice_in_dim(l.lo, j, 1, 0)[0])      # (n,)
        above = (rows < j)[:, None]
        upd = dd.mul(DD(lrow.hi[:, None], lrow.lo[:, None]),
                     DD(jnp.broadcast_to(xj.hi, (n, xj.hi.shape[1])),
                        jnp.broadcast_to(xj.lo, (n, xj.lo.shape[1]))))
        upd = _sel(above, upd, dd.from_float(jnp.zeros_like(x.hi)))
        return dd.sub(x, upd)

    return jax.lax.fori_loop(0, n, body, b)


@functools.partial(jax.jit, static_argnames=("block",))
def llt_factor_dd(a: DD, *, block: int = 64):
    """Blocked DD LLT of the lower triangle: returns ``(L: DD, LltInfo)``.

    faer ``cholesky_in_place`` over fx128 (``llt/factor.rs:67`` +
    ``faer-traits/src/lib.rs:5329``).
    """
    a = DD(jnp.asarray(a.hi), jnp.asarray(a.lo))
    n = a.hi.shape[0]
    if n <= block:
        l, ok = _panel_llt_dd(a)
        return l, LltInfo(dynamic_regularization_count=jnp.zeros((), jnp.int32),
                          success=ok)
    ok = jnp.ones((), jnp.bool_)
    trail = a
    strips = []
    for k in range(0, n, block):
        bw = min(block, n - k)
        dblk = DD(trail.hi[:bw, :bw], trail.lo[:bw, :bw])
        d, o = _panel_llt_dd(dblk)
        ok = ok & o
        if k + bw < n:
            a21 = DD(trail.hi[bw:, :bw], trail.lo[bw:, :bw])
            # L21ᵀ solves L11 (L21ᵀ) = A21ᵀ
            l21t = _solve_lower_cols_dd(d, DD(a21.hi.T, a21.lo.T))
            l21 = DD(l21t.hi.T, l21t.lo.T)
            upd = dd.matmul_dd(l21, DD(l21.hi.T, l21.lo.T))
            trail = dd.sub(DD(trail.hi[bw:, bw:], trail.lo[bw:, bw:]), upd)
            strip = DD(jnp.concatenate([d.hi, l21.hi], axis=0),
                       jnp.concatenate([d.lo, l21.lo], axis=0))
        else:
            strip = d
        if k > 0:
            pad = jnp.zeros((k, bw), a.hi.dtype)
            strip = DD(jnp.concatenate([pad, strip.hi], axis=0),
                       jnp.concatenate([pad, strip.lo], axis=0))
        strips.append(strip)
    l = DD(jnp.concatenate([s.hi for s in strips], axis=1),
           jnp.concatenate([s.lo for s in strips], axis=1))
    return l, LltInfo(dynamic_regularization_count=jnp.zeros((), jnp.int32),
                      success=ok)


@jax.jit
def llt_solve_dd(l: DD, b: DD) -> DD:
    """Solve ``L Lᵀ x = b`` in DD (faer ``llt/solve.rs:12`` over fx128)."""
    y = _solve_lower_cols_dd(l, b)
    return _solve_upper_from_lower_t_dd(l, y)


__all__ = ["llt_factor_dd", "llt_solve_dd"]
