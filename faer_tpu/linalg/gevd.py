"""Generalized eigendecomposition A v = λ B v.

Reference parity: ``faer/src/linalg/gevd`` — ``gevd_real/gevd_cplx``
(``gevd/mod.rs:1295,1329``) with eigenvalues as (α, β) ratios, plus the
self-adjoint-definite variant.

Round-1 implementation note: faer reduces (A, B) to generalized Hessenberg and
runs real/complex QZ (``qz_real/mod.rs:1508``, ``qz_cplx/mod.rs:1140``). Here
the general path reduces via the B factorization instead — ``C = B⁻¹A`` through
a partially-pivoted LU solve, then the standard EVD — which is accurate when B
is well-conditioned and is the documented limitation; a true QZ (shifted
Hessenberg-triangular iteration) is the planned upgrade. The self-adjoint
positive-definite variant uses the numerically solid Cholesky reduction
``C = L⁻¹ A L⁻ᴴ``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.linalg import evd as _evd
from faer_tpu.linalg import lu as _lu
from faer_tpu.linalg.cholesky import llt_factor
from faer_tpu.ops.triangular_solve import (
    solve_lower_triangular,
    solve_lower_triangular_adjoint,
)


def gevd(a, b):
    """General (A, B) eigenproblem: returns ``(alpha, beta, v, info)`` with
    ``A v diag(beta) = B v diag(alpha)`` column-wise (β = 1 in this reduction).
    """
    lu, perm, lu_info = _lu.lu_in_place(b)
    c = _lu.lu_solve(lu, perm, a)
    w, v, info = _evd.evd(c)
    beta = jnp.ones_like(w)
    return w, beta, v, info


def gevd_eigenvalues(a, b):
    alpha, beta, _, _ = gevd(a, b)
    return alpha / beta


def gevd_self_adjoint(a, b):
    """Self-adjoint-definite pair (A Hermitian, B HPD): returns ``(w, v, info)``
    with ``A v = w B v``, w real ascending, ``vᴴ B v = I``.

    Cholesky reduction: B = L Lᴴ, C = L⁻¹ A L⁻ᴴ, C y = w y, v = L⁻ᴴ y.
    """
    l, _ = llt_factor(b)
    n = a.shape[0]
    full = jnp.tril(a) + jnp.conj(jnp.tril(a, -1)).T
    c = solve_lower_triangular(l, full)
    c = jnp.conj(solve_lower_triangular(l, jnp.conj(c).T)).T
    c = 0.5 * (c + jnp.conj(c).T)
    w, y, info = _evd.self_adjoint_evd(c)
    v = solve_lower_triangular_adjoint(l, y)
    return w, v, info
