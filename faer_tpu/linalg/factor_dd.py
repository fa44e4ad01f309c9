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


# ---------------------------------------------------------------------------
# fx128 LU (partial pivoting) — faer lu/partial_pivoting/factor.rs over fx128
# ---------------------------------------------------------------------------


def _dd_sum0(a: DD) -> DD:
    """Accurate DD reduction over axis 0 via pairwise halving (log-depth,
    fully vectorized; every combine is an error-free-transformation add)."""
    m = a.hi.shape[0]
    mp = 1 if m <= 1 else 1 << (m - 1).bit_length()
    if mp != m:
        pad = jnp.zeros((mp - m,) + a.hi.shape[1:], a.hi.dtype)
        a = DD(jnp.concatenate([a.hi, pad], 0),
               jnp.concatenate([a.lo, pad], 0))
    while a.hi.shape[0] > 1:
        h = a.hi.shape[0] // 2
        a = dd.add(DD(a.hi[:h], a.lo[:h]), DD(a.hi[h:], a.lo[h:]))
    return a


def _bcast(s: DD, shape) -> DD:
    return DD(jnp.broadcast_to(s.hi, shape), jnp.broadcast_to(s.lo, shape))


def _at(a: DD, i, axis=0) -> DD:
    """(1, ...) dynamic slice along ``axis``."""
    return DD(jax.lax.dynamic_slice_in_dim(a.hi, i, 1, axis),
              jax.lax.dynamic_slice_in_dim(a.lo, i, 1, axis))


@jax.jit
def lu_factor_dd(a: DD):
    """Partial-pivot DD LU: returns ``(lu: DD, row_perm, LuInfo)`` with
    ``A[row_perm, :] = L @ U`` (unit-lower L strictly below the diagonal).

    faer ``lu/partial_pivoting/factor.rs:234`` over fx128
    (``faer-traits/src/lib.rs:5329+``).  Unblocked masked ``fori_loop`` —
    like faer's fx128, which runs on the generic (non-SIMD-dispatch)
    microkernel path, the extended-precision route trades speed for 2× the
    mantissa; all DD ops vectorize on the VPU.
    """
    from faer_tpu.core import perm as permod
    from faer_tpu.core.errors import LuInfo

    m, n = a.hi.shape
    kmax = min(m, n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def body(j, state):
        a, perm, nt, ok = state
        col = _col(a, j)
        mag = jnp.where(rows >= j, jnp.abs(col.hi), -jnp.ones((), a.hi.dtype))
        p = jnp.argmax(mag).astype(jnp.int32)
        a = DD(permod.swap_rows(a.hi, j, p), permod.swap_rows(a.lo, j, p))
        perm = permod.swap_rows(perm, j, p)
        nt = nt + jnp.where(p != j, 1, 0)
        col = _col(a, j)
        piv = DD(jax.lax.dynamic_slice_in_dim(col.hi, j, 1)[0],
                 jax.lax.dynamic_slice_in_dim(col.lo, j, 1)[0])
        ok = ok & (piv.hi != 0)
        safe = _sel(piv.hi != 0, piv, dd.from_float(jnp.ones((), a.hi.dtype)))
        below = rows > j
        mult = _sel(below, dd.div(col, _bcast(safe, col.hi.shape)), col)
        a = _set_col(a, j, mult)
        rowj = _at(a, j, 0)                                   # (1, n)
        upd = dd.mul(DD(mult.hi[:, None], mult.lo[:, None]),
                     _bcast(rowj, a.hi.shape))
        mask = below[:, None] & (cols > j)[None, :]
        return (dd.sub(a, _sel(mask, upd, dd.from_float(
            jnp.zeros_like(a.hi)))), perm, nt, ok)

    init = (a, jnp.arange(m, dtype=jnp.int32), jnp.zeros((), jnp.int32),
            jnp.ones((), jnp.bool_))
    a, perm, nt, ok = jax.lax.fori_loop(0, kmax, body, init)
    return a, perm, LuInfo(transposition_count=nt, success=ok)


def _solve_unit_lower_cols_dd(lu: DD, b: DD) -> DD:
    """Forward substitution ``L X = B`` with implicit unit diagonal (L is the
    strict lower triangle of the packed LU)."""
    n = lu.hi.shape[1] if lu.hi.shape[0] > lu.hi.shape[1] else lu.hi.shape[0]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (b.hi.shape[0], 1), 0)[:, 0]

    def body(j, x: DD):
        xj = _at(x, j, 0)                                     # (1, k)
        lcol = _col(lu, j)
        below = (rows > j)[:, None]
        upd = dd.mul(DD(lcol.hi[:b.hi.shape[0], None],
                        lcol.lo[:b.hi.shape[0], None]),
                     _bcast(xj, (b.hi.shape[0], xj.hi.shape[1])))
        return dd.sub(x, _sel(below, upd,
                              dd.from_float(jnp.zeros_like(x.hi))))

    return jax.lax.fori_loop(0, n, body, b)


def _solve_upper_cols_dd(u: DD, b: DD) -> DD:
    """Back substitution ``U X = B`` (U = upper triangle incl. diagonal)."""
    n = b.hi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(i, x: DD):
        j = n - 1 - i
        ucol = _col(u, j)
        djj = DD(jax.lax.dynamic_slice_in_dim(ucol.hi, j, 1)[0],
                 jax.lax.dynamic_slice_in_dim(ucol.lo, j, 1)[0])
        xrow = _at(x, j, 0)
        xj = dd.div(xrow, _bcast(djj, xrow.hi.shape))
        x = DD(jax.lax.dynamic_update_slice_in_dim(x.hi, xj.hi, j, 0),
               jax.lax.dynamic_update_slice_in_dim(x.lo, xj.lo, j, 0))
        above = (rows < j)[:, None]
        upd = dd.mul(DD(ucol.hi[:n, None], ucol.lo[:n, None]),
                     _bcast(xj, (n, xj.hi.shape[1])))
        return dd.sub(x, _sel(above, upd,
                              dd.from_float(jnp.zeros_like(x.hi))))

    return jax.lax.fori_loop(0, n, body, b)


@jax.jit
def lu_solve_dd(lu: DD, row_perm, b: DD) -> DD:
    """Solve ``A x = b`` from the packed DD LU (faer ``solve.rs`` over
    fx128)."""
    pb = DD(jnp.take(b.hi, row_perm, axis=0), jnp.take(b.lo, row_perm, axis=0))
    y = _solve_unit_lower_cols_dd(lu, pb)
    return _solve_upper_cols_dd(lu, y)


# ---------------------------------------------------------------------------
# fx128 QR (Householder, no pivoting) — faer qr/no_pivoting over fx128
# ---------------------------------------------------------------------------


@jax.jit
def qr_factor_dd(a: DD):
    """Householder DD QR: returns ``(packed: DD, taus: DD)`` with R on/above
    the diagonal and the reflector tails stored strictly below (v_j = 1
    implicit) — the faer packed contract (``qr/no_pivoting/factor.rs``) over
    fx128.  Unblocked masked ``fori_loop``; every inner product is a
    log-depth pairwise DD reduction.
    """
    m, n = a.hi.shape
    kmax = min(m, n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def body(j, state):
        a, taus = state
        col = _col(a, j)
        below = rows > j
        zero = dd.from_float(jnp.zeros_like(col.hi))
        tail = _sel(below, col, zero)
        tail_sq = _dd_sum0(dd.mul(tail, tail))
        tail_sq = DD(tail_sq.hi[0], tail_sq.lo[0])
        alpha = DD(jax.lax.dynamic_slice_in_dim(col.hi, j, 1)[0],
                   jax.lax.dynamic_slice_in_dim(col.lo, j, 1)[0])
        norm = dd.sqrt(dd.add(dd.mul(alpha, alpha), tail_sq))
        neg_s = alpha.hi >= 0
        beta = _sel(neg_s, dd.neg(norm), norm)
        is_id = tail_sq.hi == 0
        one = dd.from_float(jnp.ones((), a.hi.dtype))
        safe_b = _sel(is_id, one, beta)
        tau = _sel(is_id, dd.from_float(jnp.zeros((), a.hi.dtype)),
                   dd.div(dd.sub(beta, alpha), safe_b))
        safe_s = _sel(is_id, one, dd.sub(alpha, beta))
        v = _sel(below, dd.div(col, _bcast(safe_s, col.hi.shape)), zero)
        v = _sel(rows == j, dd.from_float(jnp.ones_like(col.hi)), v)
        # apply H_j = I − τ v vᴴ to the remaining columns (cols > j)
        w = _dd_sum0(dd.mul(DD(v.hi[:, None], v.lo[:, None]),
                            _sel((cols > j)[None, :], a,
                                 dd.from_float(jnp.zeros_like(a.hi)))))
        tv = dd.mul(v, _bcast(tau, v.hi.shape))
        upd = dd.mul(DD(tv.hi[:, None], tv.lo[:, None]), _bcast(w, a.hi.shape))
        a = dd.sub(a, _sel((cols > j)[None, :], upd,
                           dd.from_float(jnp.zeros_like(a.hi))))
        # pack column j: beta at the diagonal, v's tail below
        beta_col = _sel(rows == j, _bcast(beta, col.hi.shape), col)
        packed = _sel(below, v, beta_col)
        packed = _sel(rows < j, col, packed)
        a = _set_col(a, j, packed)
        taus = DD(jax.lax.dynamic_update_slice_in_dim(
            taus.hi, tau.hi[None], j, 0),
            jax.lax.dynamic_update_slice_in_dim(taus.lo, tau.lo[None], j, 0))
        return a, taus

    taus0 = dd.from_float(jnp.zeros((kmax,), a.hi.dtype))
    return jax.lax.fori_loop(0, kmax, body, (a, taus0))


def _qr_apply_qt_dd(packed: DD, taus: DD, b: DD) -> DD:
    """Apply ``Qᵀ`` (product of the packed reflectors) to ``b`` in DD."""
    m = packed.hi.shape[0]
    kmax = taus.hi.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    def body(j, x: DD):
        col = _col(packed, j)
        zero = dd.from_float(jnp.zeros_like(col.hi))
        v = _sel(rows > j, col, zero)
        v = _sel(rows == j, dd.from_float(jnp.ones_like(col.hi)), v)
        tau = DD(jax.lax.dynamic_slice_in_dim(taus.hi, j, 1)[0],
                 jax.lax.dynamic_slice_in_dim(taus.lo, j, 1)[0])
        w = _dd_sum0(dd.mul(DD(v.hi[:, None], v.lo[:, None]), x))
        tv = dd.mul(v, _bcast(tau, v.hi.shape))
        return dd.sub(x, dd.mul(DD(tv.hi[:, None], tv.lo[:, None]),
                                _bcast(w, x.hi.shape)))

    return jax.lax.fori_loop(0, kmax, body, b)


@jax.jit
def qr_solve_lstsq_dd(packed: DD, taus: DD, b: DD) -> DD:
    """Least-squares solve ``min ‖A x − b‖`` from the packed DD QR (faer
    ``qr/no_pivoting/solve.rs`` over fx128)."""
    n = packed.hi.shape[1]
    qtb = _qr_apply_qt_dd(packed, taus, b)
    top = DD(qtb.hi[:n], qtb.lo[:n])
    return _solve_upper_cols_dd(DD(packed.hi[:n], packed.lo[:n]), top)


__all__ = [
    "llt_factor_dd", "llt_solve_dd",
    "lu_factor_dd", "lu_solve_dd",
    "qr_factor_dd", "qr_solve_lstsq_dd",
]
