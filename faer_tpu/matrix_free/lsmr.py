"""LSMR: iterative least squares min ‖Ax − b‖₂ (+ damping).

Reference parity: ``faer/src/operator/lsmr.rs`` — ``lsmr`` (``:142``),
``LsmrParams/LsmrInfo``. Golub-Kahan bidiagonalization recurrence (Fong &
Saunders 2011) as one ``lax.while_loop``; single RHS column lock-step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import IterSolveInfo
from faer_tpu.matrix_free.operator import aslinop


def _normalize(v, rdt):
    n = jnp.sqrt(jnp.sum(jnp.abs(v).astype(rdt) ** 2))
    safe = jnp.where(n == 0, jnp.ones_like(n), n)
    return v / safe.astype(v.dtype), n


def lsmr(a, b, *, damp: float = 0.0, abs_tol: float = 0.0,
         rel_tol: float | None = None, max_iters: int | None = None):
    """Least-squares solve; b is a vector or one-column matrix.

    Returns ``(x, IterSolveInfo)``.
    """
    op = aslinop(a)
    vec = b.ndim == 1
    bb = b if vec else b[:, 0]
    mdim, ndim = op.shape
    dtype = bb.dtype
    rdt = dtypes.real_dtype_of(dtype)
    rel_tol = dtypes.eps(dtype) * 128 if rel_tol is None else rel_tol
    max_iters = 4 * (mdim + ndim) if max_iters is None else max_iters
    damp = jnp.asarray(damp, rdt)

    u, beta = _normalize(bb, rdt)
    v, alpha = _normalize(op.adjoint_apply(u[:, None])[:, 0], rdt)

    # Fong-Saunders state
    zetabar = alpha * beta
    alphabar = alpha
    rho = jnp.ones((), rdt)
    rhobar = jnp.ones((), rdt)
    cbar = jnp.ones((), rdt)
    sbar = jnp.zeros((), rdt)
    h = v
    hbar = jnp.zeros((ndim,), dtype)
    x = jnp.zeros((ndim,), dtype)
    normar0 = jnp.abs(zetabar)

    def cond(state):
        (x, u, v, h, hbar, alpha, beta, alphabar, rho, rhobar, cbar, sbar,
         zetabar, it) = state
        # normar estimate = |zetabar|
        return (it < max_iters) & (jnp.abs(zetabar) > jnp.maximum(
            jnp.asarray(abs_tol, rdt), rel_tol * normar0))

    def body(state):
        (x, u, v, h, hbar, alpha, beta, alphabar, rho, rhobar, cbar, sbar,
         zetabar, it) = state
        # bidiagonalization step
        u = op.apply(v[:, None])[:, 0] - alpha.astype(dtype) * u
        u, beta = _normalize(u, rdt)
        v = op.adjoint_apply(u[:, None])[:, 0] - beta.astype(dtype) * v
        v, alpha = _normalize(v, rdt)

        # rotation eliminating damp
        chat_den = jnp.sqrt(alphabar * alphabar + damp * damp)
        chat_den = jnp.where(chat_den == 0, jnp.ones_like(chat_den), chat_den)
        chat = alphabar / chat_den
        shat = damp / chat_den
        alphahat = jnp.sqrt(alphabar * alphabar + damp * damp)

        # rotation for the bidiagonal part
        rho_new = jnp.sqrt(alphahat * alphahat + beta * beta)
        rho_safe = jnp.where(rho_new == 0, jnp.ones_like(rho_new), rho_new)
        c = alphahat / rho_safe
        s = beta / rho_safe
        thetanew = s * alpha
        alphabar_new = c * alpha

        # second rotation
        rhobarold = rhobar
        thetabar = sbar * rho_new
        rhotemp = cbar * rho_new
        rhobar_new = jnp.sqrt(rhotemp * rhotemp + thetanew * thetanew)
        rb_safe = jnp.where(rhobar_new == 0, jnp.ones_like(rhobar_new), rhobar_new)
        cbar_new = rhotemp / rb_safe
        sbar_new = thetanew / rb_safe
        zeta = cbar_new * zetabar
        zetabar_new = -sbar_new * zetabar

        # update h, hbar, x
        denom1 = jnp.where(rho == 0, jnp.ones_like(rho), rho) * \
            jnp.where(rhobarold == 0, jnp.ones_like(rhobarold), rhobarold)
        hbar = h - (thetabar * rho_new / denom1).astype(dtype) * hbar
        denom2 = rho_safe * rb_safe
        x = x + (zeta / denom2).astype(dtype) * hbar
        h = v - (thetanew / rho_safe).astype(dtype) * h
        return (x, u, v, h, hbar, alpha, beta, alphabar_new, rho_new,
                rhobar_new, cbar_new, sbar_new, zetabar_new, it + 1)

    state = (x, u, v, h, hbar, alpha, beta, alphabar, rho, rhobar, cbar, sbar,
             zetabar, jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    x, it, zetabar = out[0], out[-1], out[-2]
    info = IterSolveInfo(
        converged=jnp.abs(zetabar) <= jnp.maximum(jnp.asarray(abs_tol, rdt),
                                                  rel_tol * normar0),
        iterations=it,
        residual_norm=jnp.abs(zetabar),
    )
    return (x if vec else x[:, None]), info
