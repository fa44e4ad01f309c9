"""Generalized eigendecomposition A v = λ B v.

Reference parity: ``faer/src/linalg/gevd`` — ``gevd_real/gevd_cplx``
(``gevd/mod.rs:1295,1329``) with eigenvalues as (α, β) ratios, plus the
self-adjoint-definite variant.

The general path runs the true QZ (``faer_tpu.linalg.qz``: Hessenberg-
triangular reduction + single-shift Moler-Stewart iteration), matching faer's
``hessenberg_to_qz`` structure with (α, β) eigenvalue pairs. A fast
B-factorization reduction (``C = B⁻¹A`` + standard EVD) remains available via
``method="reduction"`` for well-conditioned B. The self-adjoint
positive-definite variant uses the Cholesky reduction ``C = L⁻¹ A L⁻ᴴ``.
"""
from __future__ import annotations

import jax.numpy as jnp

from faer_tpu.linalg import evd as _evd
from faer_tpu.linalg import lu as _lu
from faer_tpu.linalg.cholesky import llt_factor
from faer_tpu.ops.triangular_solve import (
    solve_lower_triangular,
    solve_lower_triangular_adjoint,
)


def gevd(a, b, *, method: str = "qz"):
    """General (A, B) eigenproblem: returns ``(alpha, beta, v, info)`` with
    ``A v diag(beta) = B v diag(alpha)`` column-wise.

    ``method="qz"`` (default): true generalized Schur via QZ — robust for
    singular/ill-conditioned B (faer parity). ``method="reduction"``:
    ``C = B⁻¹A`` + standard EVD (β = 1), cheaper when B is well-conditioned.
    """
    if method == "qz":
        from faer_tpu.linalg.qz import gevd_qz

        return gevd_qz(a, b)
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
