"""Givens / Jacobi 2×2 rotations.

Reference parity: ``faer/src/linalg/jacobi.rs`` — ``JacobiRotation`` (``:7``),
``make_givens`` (``:16``), ``apply_on_the_{left,right}_in_place`` (``:257,270``).
Used by the bidiagonal/tridiagonal QR iterations and Jacobi SVD sweeps.

Convention: ``G = [[c, s], [−s̄, c]]`` with c real, c² + |s|² = 1 and
``Gᴴ [a, b]ᵀ = [r, 0]ᵀ``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from faer_tpu.core import dtypes


class JacobiRotation(NamedTuple):
    c: jnp.ndarray  # real
    s: jnp.ndarray  # same dtype as the data


def make_givens(a, b):
    """Rotation zeroing ``b`` against ``a``: returns (rot, r) with Gᴴ[a,b]=[r,0]."""
    dtype = jnp.result_type(a, b)
    rdt = dtypes.real_dtype_of(dtype)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    norm = jnp.sqrt(jnp.abs(a).astype(rdt) ** 2 + jnp.abs(b).astype(rdt) ** 2)
    b_zero = jnp.abs(b) == 0
    safe_norm = jnp.where(norm == 0, jnp.ones_like(norm), norm)
    c = jnp.where(b_zero, jnp.ones((), rdt), jnp.abs(a).astype(rdt) / safe_norm)
    sign_a = jnp.where(
        jnp.abs(a) == 0,
        jnp.ones((), dtype),
        a / jnp.where(jnp.abs(a) == 0, jnp.ones_like(norm), jnp.abs(a)).astype(dtype),
    )
    s = jnp.where(b_zero, jnp.zeros((), dtype), -sign_a * jnp.conj(b) / safe_norm.astype(dtype))
    r = jnp.where(b_zero, a, sign_a * norm.astype(dtype))
    return JacobiRotation(c=c, s=s), r


def apply_on_the_left(rot: JacobiRotation, x_row, y_row):
    """Rows (x, y) ← Gᴴ · [x; y]: x' = c·x + s̄·y? — see convention below.

    With G = [[c, s], [−s̄, c]], Gᴴ = [[c, −s], [s̄, c]] and
    Gᴴ[x; y] = [c·x − s·y, s̄·x + c·y].
    """
    c = rot.c.astype(x_row.dtype)
    xn = c * x_row - rot.s * y_row
    yn = jnp.conj(rot.s) * x_row + c * y_row
    return xn, yn


def apply_on_the_right(rot: JacobiRotation, x_col, y_col):
    """Columns (x, y) ← [x, y] · G: x' = c·x − s̄·y, y' = s·x + c·y."""
    c = rot.c.astype(x_col.dtype)
    xn = c * x_col - jnp.conj(rot.s) * y_col
    yn = rot.s * x_col + c * y_col
    return xn, yn


def make_jacobi_symmetric(app, apq, aqq):
    """2×2 symmetric Jacobi rotation diagonalizing [[app, apq],[apq, aqq]].

    Returns (c, s) such that Jᵀ A J is diagonal, J = [[c, s], [−s, c]].
    Real symmetric only (used by the block-Jacobi EVD/SVD sweeps).
    """
    tau = (aqq - app) / (2.0 * jnp.where(apq == 0, jnp.ones_like(apq), apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0, jnp.ones_like(t), t)
    t = jnp.where(apq == 0, jnp.zeros_like(t), t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s
