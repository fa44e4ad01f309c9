"""Symmetric tridiagonal eigensolver: implicit-shift QR with deflation.

Reference parity: ``faer/src/linalg/evd/tridiag_evd.rs`` —
``qr_algorithm`` (``:9``) (faer also has divide & conquer ``:608``; D&C is the
planned upgrade for large n — SURVEY §7 stage 5).

TPU-native design: the whole iteration is one ``lax.while_loop``; each
iteration performs one Wilkinson-shifted bulge-chase sweep on the active
deflation block as a masked ``fori_loop`` over positions, updating (d, e) via
windowed closed forms and the eigenvector matrix via two-column rotations.
All shapes static; convergence is data-dependent only through the loop
predicate — exactly the pattern SURVEY §5.3 prescribes for jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo


def _wilkinson_shift(a, b, c):
    """Eigenvalue of [[a, b], [b, c]] closest to c."""
    delta = (a - c) / 2
    sq = jnp.sqrt(delta * delta + b * b)
    sgn = jnp.where(delta >= 0, 1.0, -1.0).astype(a.dtype)
    denom = delta + sgn * sq
    denom = jnp.where(denom == 0, jnp.ones_like(denom), denom)
    mu = c - b * b / denom
    return jnp.where(b == 0, c, mu)


def _givens_real(x, z):
    """c, s, r with [[c, −s],[s, c]]ᵀ [x, z]ᵀ = [r, 0]ᵀ (all real)."""
    r = jnp.hypot(x, z)
    safe = jnp.where(r == 0, jnp.ones_like(r), r)
    c = jnp.where(r == 0, jnp.ones_like(x), x / safe)
    s = jnp.where(r == 0, jnp.zeros_like(z), z / safe)
    return c, s, r


def tridiag_evd(d, e, *, want_vectors: bool = True, max_sweeps_factor: int = 30):
    """Eigendecomposition of the symmetric tridiagonal (d, e).

    Returns ``(w, z, info)``: ascending eigenvalues ``w``; ``z`` the real
    orthogonal eigenvector matrix of the tridiagonal (or None).
    """
    n = d.shape[0]
    rdt = d.dtype
    if n == 1:
        z = jnp.ones((1, 1), rdt) if want_vectors else None
        return d, z, SpectralInfo(converged=jnp.ones((), bool), iterations=jnp.zeros((), jnp.int32))
    eps = dtypes.eps(rdt)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    max_iters = max_sweeps_factor * n

    def zero_negligible(d, e):
        tol = eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:]))
        return jnp.where(jnp.abs(e) <= tol, jnp.zeros_like(e), e)

    def sweep(d, e, z, l, m):
        """One implicit-shift QR sweep on block [l, m] (e[i]≠0 for l ≤ i < m)."""
        dm = d[m]
        dm1 = d[m - 1]
        em1 = e[m - 1]
        mu = _wilkinson_shift(dm1, em1, dm)
        x0 = d[l] - mu
        z0 = e[l]

        def body(i, state):
            d, e, z, x, bz = state
            active = (i >= l) & (i < m)
            c, s, r = _givens_real(x, bz)
            c = jnp.where(active, c, jnp.ones_like(c))
            s = jnp.where(active, s, jnp.zeros_like(s))
            # e[i-1] ← r (only when i > l)
            e = jnp.where((idx == i - 1) & active & (i > l), r, e)
            di, dip1, ei = d[i], d[i + 1], e[i]
            new_di = c * c * di + 2 * c * s * ei + s * s * dip1
            new_dip1 = s * s * di - 2 * c * s * ei + c * c * dip1
            new_ei = c * s * (dip1 - di) + (c * c - s * s) * ei
            d = d.at[i].set(jnp.where(active, new_di, di))
            d = d.at[i + 1].set(jnp.where(active, new_dip1, dip1))
            e = e.at[i].set(jnp.where(active, new_ei, ei))
            # bulge vs next superdiagonal entry; CARRY (x, bz) must pass through
            # untouched on inactive steps (i < l) or the sweep for l > 0 sees a
            # zeroed bulge and degenerates to the identity
            has_next = active & (i + 1 < m)
            e_next = e[jnp.minimum(i + 1, n - 2)]
            new_bz = jnp.where(active, jnp.where(has_next, s * e_next, jnp.zeros_like(s)), bz)
            e = e.at[jnp.minimum(i + 1, n - 2)].set(
                jnp.where(has_next, c * e_next, e_next))
            new_x = jnp.where(active, new_ei, x)
            if z is not None:
                zi = z[:, i]
                zip1 = z[:, i + 1]
                z = z.at[:, i].set(c * zi + s * zip1)
                z = z.at[:, i + 1].set(-s * zi + c * zip1)
            return d, e, z, new_x, new_bz

        d, e, z, _, _ = jax.lax.fori_loop(0, n - 1, body, (d, e, z, x0, z0))
        return d, e, z

    def cond(state):
        d, e, z, l, it = state
        return (l < n - 1) & (it < max_iters)

    def body(state):
        d, e, z, l, it = state
        e = zero_negligible(d, e)
        # m = end of the unreduced block starting at l: first i ≥ l with e[i]==0
        is_zero = (e == 0) & (idx >= l)
        m = jnp.where(jnp.any(is_zero), jnp.argmax(is_zero), n - 1).astype(jnp.int32)

        def advance(ops):
            d, e, z = ops
            return d, e, z

        def do_sweep(ops):
            d, e, z = ops
            return sweep(d, e, z, l, m)

        block_done = m <= l
        d, e, z = jax.lax.cond(block_done, advance, do_sweep, (d, e, z))
        l = jnp.where(block_done, l + 1, l)
        return d, e, z, l, it + 1

    z0 = jnp.eye(n, dtype=rdt) if want_vectors else None
    state = (d, e, z0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    d, e, z, l, it = jax.lax.while_loop(cond, body, state)
    converged = l >= n - 1

    # sort ascending (faer sorts self-adjoint eigenvalues ascending, lib.rs:143)
    order = jnp.argsort(d)
    w = d[order]
    if want_vectors:
        z = z[:, order]
    return w, z, SpectralInfo(converged=converged, iterations=it)
