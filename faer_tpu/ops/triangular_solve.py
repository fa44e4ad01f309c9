"""Blocked dense TRSM (triangular solve).

Reference parity: ``solve_*_triangular_in_place_with_conj``
(``faer/src/linalg/triangular_solve.rs:220-402``) — all lower/upper ×
unit/generic × conj × left/right variants.

TPU-native design: right-looking blocked substitution. Each diagonal block is
*inverted once* (recursive matmul-only TRTRI, ``faer_tpu.ops.triangular``) and
applied as a GEMM; panel updates are GEMMs. This is the standard
accelerator-TRSM formulation (diagonal-block inversion keeps all work on the
MXU instead of a scalar substitution loop). Shapes are static: the block loop
is a trace-time Python loop, so XLA sees a straight chain of GEMMs.
"""
from __future__ import annotations

import jax.numpy as jnp

import jax

from faer_tpu.core import dtypes
from faer_tpu.core.flags import Conj
from faer_tpu.ops.matmul import matmul


def _mm_hi(acc, a, b):
    # diagonal-block inverse applications: full f32 accuracy (see triangular.py)
    return matmul(acc, a, b, precision=jax.lax.Precision.HIGHEST)
from faer_tpu.ops.triangular import invert_lower_triangular, invert_upper_triangular

_BLOCK = 128


def _conj(x, conj):
    return dtypes.conj_maybe(x, conj)


def solve_lower_triangular(l, b, *, unit: bool = False, conj: Conj = Conj.NO,
                           block: int = _BLOCK):
    """X = op(L)^{-1} B with L lower triangular (op = conj if requested)."""
    n = l.shape[0]
    if n <= block:
        linv = invert_lower_triangular(_conj(jnp.tril(l), conj), unit=unit)
        return _mm_hi(None, linv, b)
    x_blocks = []
    rhs = b
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        lii = _conj(jnp.tril(l[i0:i1, i0:i1]), conj)
        linv = invert_lower_triangular(lii, unit=unit)
        xi = _mm_hi(None, linv, rhs[i0:i1])
        x_blocks.append(xi)
        if i1 < n:
            upd = matmul(None, _conj(l[i1:, i0:i1], conj), xi)
            rhs = jnp.concatenate([rhs[:i1], rhs[i1:] - upd], axis=0)
    return jnp.concatenate(x_blocks, axis=0)


def solve_upper_triangular(u, b, *, unit: bool = False, conj: Conj = Conj.NO,
                           block: int = _BLOCK):
    """X = op(U)^{-1} B with U upper triangular."""
    n = u.shape[0]
    if n <= block:
        uinv = invert_upper_triangular(_conj(jnp.triu(u), conj), unit=unit)
        return _mm_hi(None, uinv, b)
    x_blocks = []
    rhs = b
    starts = list(range(0, n, block))
    for i0 in reversed(starts):
        i1 = min(i0 + block, n)
        uii = _conj(jnp.triu(u[i0:i1, i0:i1]), conj)
        uinv = invert_upper_triangular(uii, unit=unit)
        xi = _mm_hi(None, uinv, rhs[i0:i1])
        x_blocks.append(xi)
        if i0 > 0:
            upd = matmul(None, _conj(u[:i0, i0:i1], conj), xi)
            rhs = jnp.concatenate([rhs[:i0] - upd, rhs[i0:]], axis=0)
    return jnp.concatenate(list(reversed(x_blocks)), axis=0)


def solve_unit_lower_triangular(l, b, *, conj: Conj = Conj.NO):
    """faer ``solve_unit_lower_triangular_in_place`` (``triangular_solve.rs:220``)."""
    return solve_lower_triangular(l, b, unit=True, conj=conj)


def solve_unit_upper_triangular(u, b, *, conj: Conj = Conj.NO):
    return solve_upper_triangular(u, b, unit=True, conj=conj)


def solve_lower_triangular_transpose(l, b, *, unit: bool = False,
                                     conj: Conj = Conj.NO):
    """X = op(L)^{-T} B = (op(L)^T)^{-1} B — an upper solve on L^T."""
    return solve_upper_triangular(l.T, b, unit=unit, conj=conj)


def solve_upper_triangular_transpose(u, b, *, unit: bool = False,
                                     conj: Conj = Conj.NO):
    return solve_lower_triangular(u.T, b, unit=unit, conj=conj)


def solve_lower_triangular_adjoint(l, b, *, unit: bool = False):
    """X = L^{-H} B."""
    return solve_upper_triangular(l.T, b, unit=unit, conj=Conj.YES)


def solve_upper_triangular_adjoint(u, b, *, unit: bool = False):
    return solve_lower_triangular(u.T, b, unit=unit, conj=Conj.YES)


# right-side variants: X op(T) = B  ⇔  op(T)^T X^T = B^T
def solve_lower_triangular_on_right(l, b, *, unit: bool = False,
                                    conj: Conj = Conj.NO):
    return solve_upper_triangular(l.T, b.T, unit=unit, conj=conj).T


def solve_upper_triangular_on_right(u, b, *, unit: bool = False,
                                    conj: Conj = Conj.NO):
    return solve_lower_triangular(u.T, b.T, unit=unit, conj=conj).T
