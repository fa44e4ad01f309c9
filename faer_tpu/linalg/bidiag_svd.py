"""SVD of a real upper-bidiagonal matrix: implicit-shift Golub–Kahan QR.

Reference parity: ``faer/src/linalg/svd/bidiag_svd.rs`` — QR-algorithm path
(``:274``); faer's divide & conquer (``:1005``) with secular solves is the
planned large-n upgrade (SURVEY §7 stage 5 hard parts).

TPU-native design: one ``lax.while_loop``; each iteration runs one shifted
bulge-chase sweep over the active block as a masked ``fori_loop``, applying
the right rotations to V's columns and the left rotations to U's columns —
the same static-shape pattern as ``tridiag_evd``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.linalg.tridiag_evd import _givens_real, _wilkinson_shift


def bidiag_svd(d, e, *, want_u: bool = True, want_v: bool = True,
               max_sweeps_factor: int = 30, use_dnc: bool | None = None):
    """SVD of B = bidiag(d, e) (d: (n,), e: (n-1,), both real).

    Returns ``(s, u, v, info)`` with ``B = U diag(s) Vᵀ``, s descending ≥ 0.

    Large problems route to divide & conquer (GEMM-dominated merges, faer's
    own large-n choice — ``bidiag_svd.rs:1005``); small sizes use the
    implicit-shift Golub–Kahan QR iteration below.
    """
    n = d.shape[0]
    if use_dnc is None:
        use_dnc = n >= 512 and d.dtype in (jnp.float32, jnp.float64)
    if use_dnc and n > 64:
        from faer_tpu.linalg.bidiag_dnc import bidiag_svd_dnc

        return bidiag_svd_dnc(d, e, want_u=want_u, want_v=want_v)
    rdt = d.dtype
    eye = jnp.eye(n, dtype=rdt)
    if n == 1:
        s = jnp.abs(d)
        u = jnp.where(d < 0, -eye, eye) if want_u else None
        return s, u, (eye if want_v else None), SpectralInfo(
            converged=jnp.ones((), bool), iterations=jnp.zeros((), jnp.int32))
    eps = dtypes.eps(rdt)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    max_iters = max_sweeps_factor * n

    def sweep(d, e, u, v, l, m):
        # shift: Wilkinson eigenvalue of trailing 2×2 of BᵀB
        dm = d[m]
        dm1 = d[m - 1]
        em1 = e[m - 1]
        em2 = jnp.where(m >= 2, e[jnp.maximum(m - 2, 0)], jnp.zeros((), rdt))
        t11 = dm1 * dm1 + em2 * em2
        t22 = dm * dm + em1 * em1
        t12 = dm1 * em1
        mu = _wilkinson_shift(t11, t12, t22)

        from faer_tpu.core.config import panel_kernels_enabled

        if panel_kernels_enabled(rdt):
            # VMEM-resident Mosaic sweep + chunked rotation-chain GEMMs for
            # U/V (same treatment as tridiag_evd — the XLA fori pays ~6 µs of
            # tiny HBM DMAs per step and 2-column scatters on U and V)
            from faer_tpu.linalg.tridiag_evd import _apply_rotation_chain
            from faer_tpu.ops.pallas.panel_kernels import bidiag_sweep_pallas

            d, e, c1, s1, c2, s2 = bidiag_sweep_pallas(d, e, l, m, mu)
            if v is not None:
                v = _apply_rotation_chain(v, c1, s1)
            if u is not None:
                u = _apply_rotation_chain(u, c2, s2)
            return d, e, u, v

        x0 = d[l] * d[l] - mu
        z0 = d[l] * e[l]

        def body(i, state):
            d, e, u, v, x, bz = state
            active = (i >= l) & (i < m)
            # right rotation (cols i, i+1) zeroing bz against x
            c1, s1, r1 = _givens_real(x, bz)
            c1 = jnp.where(active, c1, jnp.ones_like(c1))
            s1 = jnp.where(active, s1, jnp.zeros_like(s1))
            e = jnp.where((idx == i - 1) & active & (i > l), r1, e)
            di, dip1, ei = d[i], d[i + 1], e[i]
            new_di = c1 * di + s1 * ei
            new_ei = -s1 * di + c1 * ei
            bulge = s1 * dip1             # at (i+1, i)
            new_dip1 = c1 * dip1
            if v is not None:
                vi, vip1 = v[:, i], v[:, i + 1]
                v = v.at[:, i].set(c1 * vi + s1 * vip1)
                v = v.at[:, i + 1].set(-s1 * vi + c1 * vip1)
            # left rotation (rows i, i+1) zeroing bulge against new_di
            c2, s2, r2 = _givens_real(new_di, bulge)
            c2 = jnp.where(active, c2, jnp.ones_like(c2))
            s2 = jnp.where(active, s2, jnp.zeros_like(s2))
            d = d.at[i].set(jnp.where(active, r2, di))
            e2 = c2 * new_ei + s2 * new_dip1
            d2ip1 = -s2 * new_ei + c2 * new_dip1
            d = d.at[i + 1].set(jnp.where(active, d2ip1, dip1))
            e = e.at[i].set(jnp.where(active, e2, ei))
            # carry must pass through untouched on inactive steps (see
            # tridiag_evd: a zeroed bulge degenerates l > 0 sweeps to identity)
            has_next = active & (i + 1 < m)
            e_next = e[jnp.minimum(i + 1, n - 2)]
            bz2 = jnp.where(active, jnp.where(has_next, s2 * e_next, jnp.zeros_like(s2)), bz)
            e = e.at[jnp.minimum(i + 1, n - 2)].set(
                jnp.where(has_next, c2 * e_next, e_next))
            if u is not None:
                ui, uip1 = u[:, i], u[:, i + 1]
                u = u.at[:, i].set(c2 * ui + s2 * uip1)
                u = u.at[:, i + 1].set(-s2 * ui + c2 * uip1)
            x = jnp.where(active, e2, x)
            return d, e, u, v, x, bz2

        d, e, u, v, _, _ = jax.lax.fori_loop(0, n - 1, body, (d, e, u, v, x0, z0))
        return d, e, u, v

    didx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def row_chase(d, e, u, v, i0, m):
        """d[i0] == 0 with e[i0] ≠ 0: left rotations push row i0's off-diagonal
        rightwards until it vanishes (standard dbdsqr splitting), decoupling
        i0 from the rest of the block. Accumulates into U."""
        b0 = e[i0]
        e = jnp.where(idx == i0, 0.0, e)

        def body(k, state):
            d, e, u, b = state
            active = (k > i0) & (k <= m)
            c, s, r = _givens_real(d[k], b)
            c = jnp.where(active, c, jnp.ones_like(c))
            s = jnp.where(active, s, jnp.zeros_like(s))
            d = d.at[k].set(jnp.where(active, r, d[k]))
            e_k = e[jnp.minimum(k, n - 2)]
            has_next = active & (k < m)
            new_b = jnp.where(has_next, -s * e_k, jnp.zeros_like(s))
            e = e.at[jnp.minimum(k, n - 2)].set(
                jnp.where(has_next, c * e_k, e_k))
            if u is not None:
                uk, ui0 = u[:, k], u[:, i0]
                u = u.at[:, k].set(jnp.where(active, c * uk + s * ui0, uk))
                u = u.at[:, i0].set(jnp.where(active, -s * uk + c * ui0, ui0))
            b = jnp.where(active, new_b, b)
            return d, e, u, b

        d, e, u, _ = jax.lax.fori_loop(0, n, body, (d, e, u, b0))
        return d, e, u, v

    def col_chase(d, e, u, v, l, m):
        """d[m] == 0 with e[m-1] ≠ 0: right rotations push column m's
        off-diagonal upwards until it vanishes. Accumulates into V."""
        b0 = e[m - 1]
        e = jnp.where(idx == m - 1, 0.0, e)

        def body(t, state):
            d, e, v, b = state
            k = m - 1 - t
            active = (k >= l) & (k < m)
            c, s, r = _givens_real(d[jnp.maximum(k, 0)], b)
            c = jnp.where(active, c, jnp.ones_like(c))
            s = jnp.where(active, s, jnp.zeros_like(s))
            d = d.at[jnp.maximum(k, 0)].set(
                jnp.where(active, r, d[jnp.maximum(k, 0)]))
            e_km1 = e[jnp.maximum(k - 1, 0)]
            has_prev = active & (k > l)
            new_b = jnp.where(has_prev, -s * e_km1, jnp.zeros_like(s))
            e = e.at[jnp.maximum(k - 1, 0)].set(
                jnp.where(has_prev, c * e_km1, e_km1))
            if v is not None:
                vk = v[:, jnp.maximum(k, 0)]
                vm = v[:, m]
                v = v.at[:, jnp.maximum(k, 0)].set(jnp.where(active, c * vk + s * vm, vk))
                v = v.at[:, m].set(jnp.where(active, -s * vk + c * vm, vm))
            b = jnp.where(active, new_b, b)
            return d, e, v, b

        d, e, v, _ = jax.lax.fori_loop(0, n, body, (d, e, v, b0))
        return d, e, u, v

    def cond(state):
        d, e, u, v, l, it = state
        return (l < n - 1) & (it < max_iters)

    def body(state):
        d, e, u, v, l, it = state
        tol = eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:]))
        e = jnp.where(jnp.abs(e) <= tol, jnp.zeros_like(e), e)
        is_zero = (e == 0) & (idx >= l)
        m = jnp.where(jnp.any(is_zero), jnp.argmax(is_zero), n - 1).astype(jnp.int32)
        block_done = m <= l

        # negligible diagonal inside the block → splitting chase
        dscale = jnp.max(jnp.abs(d)) + jnp.max(jnp.abs(e))
        d = jnp.where(jnp.abs(d) <= eps * dscale, 0.0, d)
        dz = (d == 0) & (didx >= l) & (didx <= m)
        has_dz = jnp.any(dz) & ~block_done
        i0 = jnp.argmax(dz).astype(jnp.int32)

        def do_chase(ops):
            d, e, u, v = ops
            return jax.lax.cond(
                i0 == m,
                lambda o: col_chase(*o, l, m),
                lambda o: row_chase(*o, i0, m),
                (d, e, u, v),
            )

        def no_chase(ops):
            d, e, u, v = ops

            def advance(o):
                return o

            def do_sweep(o):
                d, e, u, v = o
                return sweep(d, e, u, v, l, m)

            return jax.lax.cond(block_done, advance, do_sweep, (d, e, u, v))

        d, e, u, v = jax.lax.cond(has_dz, do_chase, no_chase, (d, e, u, v))
        l = jnp.where(block_done, l + 1, l)
        return d, e, u, v, l, it + 1

    u0 = eye if want_u else None
    v0 = eye if want_v else None
    state = (d, e, u0, v0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    d, e, u, v, l, it = jax.lax.while_loop(cond, body, state)

    # sign-fix (σ ≥ 0, flip U columns) and sort descending
    sgn = jnp.where(d < 0, -jnp.ones_like(d), jnp.ones_like(d))
    s = d * sgn
    if u is not None:
        u = u * sgn[None, :]
    order = jnp.argsort(-s)
    s = s[order]
    if u is not None:
        u = u[:, order]
    if v is not None:
        v = v[:, order]
    return s, u, v, SpectralInfo(converged=l >= n - 1, iterations=it)
