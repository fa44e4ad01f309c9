"""BiCGSTAB for general (non-symmetric) systems.

Reference parity: ``faer/src/operator/bicgstab.rs`` — ``bicgstab`` (``:111``),
``BicgParams/BicgInfo``. Single-RHS recurrence applied lock-step to each
column; breakdown guarded by restarting ρ from the current residual.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import IterSolveInfo
from faer_tpu.matrix_free.operator import IdentityPrecond, aslinop


def bicgstab(a, b, *, precond=None, x0=None, abs_tol: float = 0.0,
             rel_tol: float | None = None, max_iters: int | None = None):
    """Solve ``A x = b`` for general A. Returns ``(x, IterSolveInfo)``."""
    op = aslinop(a)
    m = precond if precond is not None else IdentityPrecond()
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    n = b2.shape[0]
    rdt = dtypes.real_dtype_of(b2.dtype)
    rel_tol = dtypes.eps(b2.dtype) * 128 if rel_tol is None else rel_tol
    max_iters = 8 * n if max_iters is None else max_iters

    x = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if vec else x0)
    r = b2 - op.apply(x)
    rhat = r
    p = r
    rho = jnp.sum(jnp.conj(rhat) * r, axis=0)
    bnorm = jnp.sqrt(jnp.sum(jnp.abs(b2).astype(rdt) ** 2, axis=0))
    threshold = jnp.maximum(jnp.asarray(abs_tol, rdt), rel_tol * bnorm)

    def rnorm(r):
        return jnp.sqrt(jnp.sum(jnp.abs(r).astype(rdt) ** 2, axis=0))

    def cond(state):
        x, r, p, rho, it = state
        return (it < max_iters) & jnp.any(rnorm(r) > threshold)

    def body(state):
        x, r, p, rho, it = state
        pm = m.solve_in_place(p)
        v = op.apply(pm)
        rhv = jnp.sum(jnp.conj(rhat) * v, axis=0)
        safe = jnp.where(rhv == 0, jnp.ones_like(rhv), rhv)
        alpha = jnp.where(rhv == 0, jnp.zeros_like(rho), rho / safe)
        s = r - v * alpha[None, :]
        sm = m.solve_in_place(s)
        t = op.apply(sm)
        tt = jnp.sum(jnp.abs(t).astype(rdt) ** 2, axis=0)
        safe_tt = jnp.where(tt == 0, jnp.ones_like(tt), tt)
        omega = jnp.where(tt == 0, jnp.zeros_like(alpha),
                          jnp.sum(jnp.conj(t) * s, axis=0) / safe_tt.astype(s.dtype))
        x = x + pm * alpha[None, :] + sm * omega[None, :]
        r = s - t * omega[None, :]
        rho_new = jnp.sum(jnp.conj(rhat) * r, axis=0)
        safe_rho = jnp.where(rho == 0, jnp.ones_like(rho), rho)
        safe_om = jnp.where(omega == 0, jnp.ones_like(omega), omega)
        beta = jnp.where((rho == 0) | (omega == 0), jnp.zeros_like(rho),
                         (rho_new / safe_rho) * (alpha / safe_om))
        p = r + (p - v * omega[None, :]) * beta[None, :]
        return x, r, p, rho_new, it + 1

    state = (x, r, p, rho, jnp.zeros((), jnp.int32))
    x, r, p, rho, it = jax.lax.while_loop(cond, body, state)
    res = rnorm(r)
    info = IterSolveInfo(converged=jnp.all(res <= threshold), iterations=it,
                         residual_norm=jnp.max(res))
    return (x[:, 0] if vec else x), info
