"""cx128 (complex double-word) LU factor + solve.

Reference parity: faer runs every decomposition over ``cx128`` =
``Complex<fx128>`` (``faer-traits/src/lib.rs:5108-5111``); this module wires
the repo's complex-DD arithmetic (``utils.ddcomplex``) through the partial-
pivot LU family end-to-end (faer ``lu/partial_pivoting/{factor,solve}.rs``
over cx128).

TPU-native design: a cx128 matrix is a (re, im) pair of DD pytrees — four
base-f32 arrays; the factor is one masked ``lax.fori_loop`` of elementwise
complex-DD ops (VPU work, like faer's cx128 which runs on the generic
non-SIMD-dispatch microkernels).  Pivoting uses the LAPACK ``|re| + |im|``
magnitude on the hi words.  Everything jit/vmap-composes over the pytrees.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import perm as permod
from faer_tpu.core.errors import LuInfo
from faer_tpu.utils import ddcomplex as ddc
from faer_tpu.utils import doubledouble as dd
from faer_tpu.utils.ddcomplex import DDC
from faer_tpu.utils.doubledouble import DD


def _map_dd(f, a: DDC) -> DDC:
    return DDC(f(a.re), f(a.im))


def _col(a: DDC, j) -> DDC:
    def g(x: DD) -> DD:
        return DD(jax.lax.dynamic_slice_in_dim(x.hi, j, 1, 1)[:, 0],
                  jax.lax.dynamic_slice_in_dim(x.lo, j, 1, 1)[:, 0])
    return _map_dd(g, a)


def _set_col(a: DDC, j, col: DDC) -> DDC:
    def g(x: DD, c: DD) -> DD:
        return DD(jax.lax.dynamic_update_slice_in_dim(x.hi, c.hi[:, None], j, 1),
                  jax.lax.dynamic_update_slice_in_dim(x.lo, c.lo[:, None], j, 1))
    return DDC(g(a.re, col.re), g(a.im, col.im))


def _at0(a: DDC, j) -> DDC:
    """(1, ...) dynamic slice along axis 0."""
    def g(x: DD) -> DD:
        return DD(jax.lax.dynamic_slice_in_dim(x.hi, j, 1, 0),
                  jax.lax.dynamic_slice_in_dim(x.lo, j, 1, 0))
    return _map_dd(g, a)


def _scalar_at(col: DDC, j) -> DDC:
    def g(x: DD) -> DD:
        return DD(jax.lax.dynamic_slice_in_dim(x.hi, j, 1)[0],
                  jax.lax.dynamic_slice_in_dim(x.lo, j, 1)[0])
    return _map_dd(g, col)


def _bcast(s: DDC, shape) -> DDC:
    def g(x: DD) -> DD:
        return DD(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))
    return _map_dd(g, s)


def _expand(a: DDC, axis) -> DDC:
    def g(x: DD) -> DD:
        return DD(jnp.expand_dims(x.hi, axis), jnp.expand_dims(x.lo, axis))
    return _map_dd(g, a)


def _swap_rows(a: DDC, i, j) -> DDC:
    def g(x):
        return permod.swap_rows(x, i, j)
    return DDC(DD(g(a.re.hi), g(a.re.lo)), DD(g(a.im.hi), g(a.im.lo)))


@jax.jit
def lu_factor_ddc(a: DDC):
    """Partial-pivot cx128 LU: returns ``(lu: DDC, row_perm, LuInfo)`` with
    ``A[row_perm, :] = L @ U`` (unit-lower L strictly below the diagonal).

    faer ``lu/partial_pivoting/factor.rs:234`` over cx128.
    """
    m, n = a.re.hi.shape
    kmax = min(m, n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def body(j, state):
        a, perm, nt, ok = state
        col = _col(a, j)
        mag = jnp.where(rows >= j, ddc.abs1_hi(col), -jnp.ones((), a.dtype))
        p = jnp.argmax(mag).astype(jnp.int32)
        a = _swap_rows(a, j, p)
        perm = permod.swap_rows(perm, j, p)
        nt = nt + jnp.where(p != j, 1, 0)
        col = _col(a, j)
        piv = _scalar_at(col, j)
        nz = (piv.re.hi != 0) | (piv.im.hi != 0)
        ok = ok & nz
        one = dd.from_float(jnp.ones((), a.dtype))
        safe = ddc.where(nz, piv, DDC(one, dd.from_float(
            jnp.zeros((), a.dtype))))
        below = rows > j
        mult = ddc.where(below, ddc.div(col, _bcast(safe, col.re.hi.shape)),
                         col)
        a = _set_col(a, j, mult)
        rowj = _at0(a, j)                                      # (1, n)
        upd = ddc.mul(_expand(mult, 1), _bcast(rowj, a.re.hi.shape))
        mask = below[:, None] & (cols > j)[None, :]
        return (ddc.where(mask, ddc.sub(a, upd), a), perm, nt, ok)

    init = (a, jnp.arange(m, dtype=jnp.int32), jnp.zeros((), jnp.int32),
            jnp.ones((), jnp.bool_))
    a, perm, nt, ok = jax.lax.fori_loop(0, kmax, body, init)
    return a, perm, LuInfo(transposition_count=nt, success=ok)


def _solve_unit_lower_cols_ddc(lu: DDC, b: DDC) -> DDC:
    """Forward substitution ``L X = B`` with implicit unit diagonal."""
    m, n = lu.re.hi.shape
    k = min(m, n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b.re.hi.shape[0], 1), 0)[:, 0]

    def body(j, x: DDC):
        xj = _at0(x, j)                                        # (1, k)
        lcol = _col(lu, j)
        lcol = _map_dd(lambda d: DD(d.hi[:b.re.hi.shape[0]],
                                    d.lo[:b.re.hi.shape[0]]), lcol)
        below = (rows > j)[:, None]
        upd = ddc.mul(_expand(lcol, 1),
                      _bcast(xj, (b.re.hi.shape[0], xj.re.hi.shape[1])))
        return ddc.where(below, ddc.sub(x, upd), x)

    return jax.lax.fori_loop(0, k, body, b)


def _solve_upper_cols_ddc(u: DDC, b: DDC) -> DDC:
    """Back substitution ``U X = B`` (U = upper triangle incl. diagonal)."""
    n = b.re.hi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(i, x: DDC):
        j = n - 1 - i
        ucol = _col(u, j)
        djj = _scalar_at(ucol, j)
        xrow = _at0(x, j)
        xj = ddc.div(xrow, _bcast(djj, xrow.re.hi.shape))
        def upd_row(xc: DD, xjc: DD) -> DD:
            return DD(jax.lax.dynamic_update_slice_in_dim(xc.hi, xjc.hi, j, 0),
                      jax.lax.dynamic_update_slice_in_dim(xc.lo, xjc.lo, j, 0))
        x = DDC(upd_row(x.re, xj.re), upd_row(x.im, xj.im))
        above = (rows < j)[:, None]
        ucol_n = _map_dd(lambda d: DD(d.hi[:n], d.lo[:n]), ucol)
        upd = ddc.mul(_expand(ucol_n, 1), _bcast(xj, (n, xj.re.hi.shape[1])))
        return ddc.where(above, ddc.sub(x, upd), x)

    return jax.lax.fori_loop(0, n, body, b)


@jax.jit
def lu_solve_ddc(lu: DDC, row_perm, b: DDC) -> DDC:
    """Solve ``A x = b`` from the packed cx128 LU (faer ``solve.rs`` over
    cx128)."""
    pb = _map_dd(lambda d: DD(jnp.take(d.hi, row_perm, axis=0),
                              jnp.take(d.lo, row_perm, axis=0)), b)
    y = _solve_unit_lower_cols_ddc(lu, pb)
    return _solve_upper_cols_ddc(lu, y)


__all__ = ["lu_factor_ddc", "lu_solve_ddc"]
