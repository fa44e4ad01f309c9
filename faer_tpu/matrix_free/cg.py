"""Preconditioned conjugate gradient.

Reference parity: ``faer/src/operator/conjugate_gradient.rs`` —
``conjugate_gradient`` (``:108``), ``CgParams/CgInfo`` (``:21``).
One ``lax.while_loop``; supports multiple right-hand sides (block CG runs each
column through the same iteration lock-step, matching faer's matrix RHS).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import IterSolveInfo
from faer_tpu.matrix_free.operator import IdentityPrecond, aslinop


def conjugate_gradient(a, b, *, precond=None, x0=None, abs_tol: float = 0.0,
                       rel_tol: float | None = None, max_iters: int | None = None):
    """Solve ``A x = b`` (A self-adjoint positive definite LinOp).

    Returns ``(x, IterSolveInfo)``.
    """
    op = aslinop(a)
    m = precond if precond is not None else IdentityPrecond()
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    n = b2.shape[0]
    rdt = dtypes.real_dtype_of(b2.dtype)
    rel_tol = dtypes.eps(b2.dtype) * 128 if rel_tol is None else rel_tol
    max_iters = 4 * n if max_iters is None else max_iters

    x = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if vec else x0)
    r = b2 - op.apply(x)
    z = m.solve_in_place(r)
    p = z
    rz = jnp.sum(jnp.conj(r) * z, axis=0)
    bnorm = jnp.sqrt(jnp.sum(jnp.abs(b2).astype(rdt) ** 2, axis=0))
    threshold = jnp.maximum(jnp.asarray(abs_tol, rdt), rel_tol * bnorm)

    def rnorm(r):
        return jnp.sqrt(jnp.sum(jnp.abs(r).astype(rdt) ** 2, axis=0))

    def cond(state):
        x, r, p, rz, it = state
        return (it < max_iters) & jnp.any(rnorm(r) > threshold)

    def body(state):
        x, r, p, rz, it = state
        ap = op.apply(p)
        pap = jnp.sum(jnp.conj(p) * ap, axis=0)
        safe = jnp.where(pap == 0, jnp.ones_like(pap), pap)
        alpha = jnp.where(pap == 0, jnp.zeros_like(rz), rz / safe)
        x = x + p * alpha[None, :]
        r = r - ap * alpha[None, :]
        z = m.solve_in_place(r)
        rz_new = jnp.sum(jnp.conj(r) * z, axis=0)
        safe_rz = jnp.where(rz == 0, jnp.ones_like(rz), rz)
        beta = jnp.where(rz == 0, jnp.zeros_like(rz), rz_new / safe_rz)
        p = z + p * beta[None, :]
        return x, r, p, rz_new, it + 1

    state = (x, r, p, rz, jnp.zeros((), jnp.int32))
    x, r, p, rz, it = jax.lax.while_loop(cond, body, state)
    res = rnorm(r)
    info = IterSolveInfo(converged=jnp.all(res <= threshold), iterations=it,
                         residual_norm=jnp.max(res))
    return (x[:, 0] if vec else x), info
