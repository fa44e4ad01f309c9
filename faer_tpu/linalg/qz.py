"""QZ (generalized Schur) decomposition for the pair (A, B).

Reference parity: ``faer/src/linalg/gevd`` — ``generalized_hessenberg``
(``gen_hessenberg/mod.rs:223``), ``hessenberg_to_qz``
(``qz_real/mod.rs:1508``, ``qz_cplx/mod.rs:1140``).

TPU-native design: the complex single-shift Moler-Stewart QZ with the same
masked bulge-chase-in-``while_loop`` structure as ``evd.complex_schur``;
real pairs are complexified (uniform control flow). Produces
``A = Q S Zᴴ``, ``B = Q T Zᴴ`` with S, T upper triangular and eigenvalues
``λ_k = S_kk / T_kk`` (α/β pairs, faer convention). Infinite eigenvalues
(T_kk = 0) are returned as (α, 0) without special deflation handling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.errors import SpectralInfo
from faer_tpu.linalg.evd import _cgivens
from faer_tpu.ops.matmul import matmul


def _rot_rows(m, i, c, s):
    """rows (i, i+1) ← Gᴴ · rows, G = [[c, −s̄],[s, c]]."""
    cc = c.astype(m.dtype)
    ri = m[i, :]
    rip1 = m[i + 1, :]
    m = m.at[i, :].set(cc * ri + jnp.conj(s) * rip1)
    m = m.at[i + 1, :].set(-s * ri + cc * rip1)
    return m


def _rot_cols(m, i, c, s):
    """cols (i, i+1) ← cols · G."""
    cc = c.astype(m.dtype)
    ci = m[:, i]
    cip1 = m[:, i + 1]
    m = m.at[:, i].set(cc * ci + s * cip1)
    m = m.at[:, i + 1].set(-jnp.conj(s) * ci + cc * cip1)
    return m


def hessenberg_triangular(a, b):
    """Reduce (A, B) → (H, R) with H upper Hessenberg, R upper triangular,
    via unitary Q, Z: ``A = Q H Zᴴ``, ``B = Q R Zᴴ``.

    faer ``generalized_hessenberg`` (``gen_hessenberg/mod.rs:223``).
    """
    from faer_tpu.linalg.qr import qr_compute_q, qr_in_place

    n = a.shape[0]
    dtype = a.dtype
    # B = Q0 R: A ← Q0ᴴ A, B ← R
    packed, ts, block = qr_in_place(b)
    q0 = qr_compute_q(packed, ts, block, thin=False)
    r = jnp.triu(packed)
    h = matmul(None, jnp.conj(q0).T, a)
    q = q0
    z = jnp.eye(n, dtype=dtype)
    if n <= 2:
        return h, r, q, z

    def col_body(j, state):
        h, r, q, z = state

        def row_body(t, st):
            h, r, q, z = st
            i = (n - 2) - t                     # i from n-2 down to j+1
            active = i >= j + 1
            # left rotation on rows (i, i+1) zeroing H[i+1, j]
            c, s, _ = _cgivens(h[i, j], h[i + 1, j])
            c = jnp.where(active, c, jnp.ones_like(c))
            s = jnp.where(active, s, jnp.zeros_like(s))
            h = _rot_rows(h, i, c, s)
            r = _rot_rows(r, i, c, s)
            q = _rot_cols(q, i, c, s)   # rows got Gᴴ on the left → Q ← Q G
            # right rotation on cols (i+1, i) of R zeroing the bulge R[i+1, i]
            c2, s2, _ = _cgivens(jnp.conj(r[i + 1, i + 1]), jnp.conj(r[i + 1, i]))
            c2 = jnp.where(active, c2, jnp.ones_like(c2))
            s2 = jnp.where(active, s2, jnp.zeros_like(s2))
            # columns (i+1, i): zero entry (i+1, i) by mixing col i with col i+1
            r = _rot_cols_rev(r, i, c2, s2)
            h = _rot_cols_rev(h, i, c2, s2)
            z = _rot_cols_rev(z, i, c2, s2)
            return h, r, q, z

        return jax.lax.fori_loop(0, n - 2 - j, row_body, (h, r, q, z))

    h, r, q, z = jax.lax.fori_loop(0, n - 2, col_body, (h, r, q, z))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    h = jnp.where(rows <= cols + 1, h, jnp.zeros((), dtype))
    r = jnp.where(rows <= cols, r, jnp.zeros((), dtype))
    return h, r, q, z


def _rot_cols_rev(m, i, c, s):
    """cols (i+1, i) rotation: col_{i+1}' = c·col_{i+1} + s·col_i,
    col_i' = −s̄·col_{i+1} + c·col_i — zeroes an (·, i) entry against (·, i+1).
    """
    cc = c.astype(m.dtype)
    ci = m[:, i]
    cip1 = m[:, i + 1]
    m = m.at[:, i + 1].set(cc * cip1 + s * ci)
    m = m.at[:, i].set(-jnp.conj(s) * cip1 + cc * ci)
    return m


def qz_iteration(h, r, q, z, *, max_sweeps_factor: int = 30):
    """Single-shift complex QZ on a Hessenberg/triangular pair."""
    n = h.shape[0]
    dtype = h.dtype
    rdt = dtypes.real_dtype_of(dtype)
    eps = dtypes.eps(dtype)
    if n == 1:
        return h, r, q, z, SpectralInfo(converged=jnp.ones((), bool),
                                        iterations=jnp.zeros((), jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
    max_iters = max_sweeps_factor * n
    hnorm0 = jnp.max(jnp.abs(h))
    smlnum = eps * jnp.maximum(hnorm0, jnp.asarray(dtypes.min_positive(rdt), rdt))
    # dtype-aware cap: loosened floor stays <= sqrt(eps)*||H||
    _stall_cap = dtypes.deflation_stall_cap(rdt)

    def body(state):
        h, r, q, z, hi, it, stall = state
        sd = jnp.diagonal(h, -1)
        dmag = jnp.abs(jnp.diagonal(h))
        # progressive deflation floor (see real_schur.py): guarantees
        # progress on stuck interior couplings; resets with the stall counter
        floor = smlnum * (2.0 ** jnp.minimum(stall // 5, _stall_cap))
        tol = jnp.maximum(eps * (dmag[:-1] + dmag[1:]), floor)
        negligible = jnp.abs(sd) <= tol
        can_deflate = (hi > 0) & negligible[jnp.maximum(hi - 1, 0)]

        def deflate(ops):
            return ops

        def do_sweep(ops):
            h, r, q, z = ops
            cand = jnp.where((idx < hi) & negligible, idx + 1, 0)
            lo = jnp.max(cand).astype(jnp.int32)
            # shift: eigenvalue of the trailing 2×2 of H R⁻¹ closest to the
            # corner ratio (guard zero diagonals of R)
            def safe(x):
                return jnp.where(jnp.abs(x) < smlnum.astype(rdt),
                                 jnp.asarray(smlnum, dtype), x)
            r11 = safe(r[hi - 1, hi - 1])
            r22 = safe(r[hi, hi])
            m11 = h[hi - 1, hi - 1] / r11
            m12 = (h[hi - 1, hi] - m11 * r[hi - 1, hi]) / r22
            m21 = h[hi, hi - 1] / r11
            m22 = (h[hi, hi] - m21 * r[hi - 1, hi]) / r22
            tr = m11 + m22
            det = m11 * m22 - m12 * m21
            disc = jnp.sqrt(tr * tr - 4 * det)
            e1 = (tr + disc) / 2
            e2 = (tr - disc) / 2
            mu = jnp.where(jnp.abs(e1 - m22) < jnp.abs(e2 - m22), e1, e2)
            exc = m22 + 0.75 * jnp.abs(m21).astype(dtype)
            mu = jnp.where((stall % 10) == 9, exc, mu)
            x0 = h[lo, lo] - mu * r[lo, lo]
            z0 = h[lo + 1, lo]

            def chase(i, st):
                h, r, q, z, x, bz = st
                active = (i >= lo) & (i < hi)
                # left rotation zeroing bz against x (rows i, i+1)
                c, s, _ = _cgivens(x, bz)
                c = jnp.where(active, c, jnp.ones_like(c))
                s = jnp.where(active, s, jnp.zeros_like(s))
                h = _rot_rows(h, i, c, s)
                r = _rot_rows(r, i, c, s)
                q = _rot_cols(q, i, c, s)
                # right rotation restoring R: zero R[i+1, i] against R[i+1, i+1]
                c2, s2, _ = _cgivens(jnp.conj(r[i + 1, i + 1]), jnp.conj(r[i + 1, i]))
                c2 = jnp.where(active, c2, jnp.ones_like(c2))
                s2 = jnp.where(active, s2, jnp.zeros_like(s2))
                h = _rot_cols_rev(h, i, c2, s2)
                r = _rot_cols_rev(r, i, c2, s2)
                z = _rot_cols_rev(z, i, c2, s2)
                # next bulge: H[i+2, i] appears from the column rotation
                nx = h[jnp.minimum(i + 1, n - 1), i]
                nz = h[jnp.minimum(i + 2, n - 1), jnp.minimum(i, n - 1)]
                nz = jnp.where(i + 2 <= hi, nz, jnp.zeros_like(nz))
                x = jnp.where(active, nx, x)
                bz = jnp.where(active, nz, bz)
                return h, r, q, z, x, bz

            h, r, q, z, _, _ = jax.lax.fori_loop(
                lo, hi, chase, (h, r, q, z, x0, z0))
            return h, r, q, z

        h, r, q, z = jax.lax.cond(can_deflate, deflate, do_sweep, (h, r, q, z))
        hi = jnp.where(can_deflate, hi - 1, hi)
        stall = jnp.where(can_deflate, 0, stall + 1)
        return h, r, q, z, hi, it + 1, stall

    def cond(state):
        h, r, q, z, hi, it, stall = state
        return (hi > 0) & (it < max_iters)

    state = (h, r, q, z, jnp.asarray(n - 1, jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    h, r, q, z, hi, it, _ = jax.lax.while_loop(cond, body, state)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s_ = jnp.where(rows <= cols, h, jnp.zeros((), dtype))
    t_ = jnp.where(rows <= cols, r, jnp.zeros((), dtype))
    return s_, t_, q, z, SpectralInfo(converged=hi == 0, iterations=it)


def _split_pair_inputs(a, b):
    import numpy as np

    rdt = dtypes.real_dtype_of(a.dtype)
    an = np.asarray(a)
    bn = np.asarray(b)
    return (jnp.asarray(np.real(an), rdt), jnp.asarray(np.imag(an), rdt),
            jnp.asarray(np.real(bn), rdt), jnp.asarray(np.imag(bn), rdt))


def qz(a, b, *, max_sweeps_factor: int = 30):
    """Full generalized Schur: returns (S, T, Q, Z, info) with
    ``A = Q S Zᴴ``, ``B = Q T Zᴴ``.

    Real pencils run the REAL double-shift QZ (``qz_real.py``, faer
    ``qz_real/mod.rs:1508``): S is real quasi-triangular (1×1/2×2 blocks),
    T upper triangular, and (α, β) pairs come from
    ``qz_real.qz_eigenvalues_pair`` — no complexification tax, infinite
    eigenvalues deflated.  Complex pencils run the single-shift complex QZ;
    on the complex-free TPU runtime that computation runs over split
    (re, im) pairs (``qz_cpair.py``) and the outputs are combined on host.
    """
    if not dtypes.is_complex(a.dtype):
        from faer_tpu.linalg.qz_real import real_qz

        return real_qz(a, b, max_sweeps_factor=max_sweeps_factor)
    return _qz_complex(a, b, max_sweeps_factor=max_sweeps_factor)


def _qz_complex(a, b, *, max_sweeps_factor: int = 30):
    """Complex QZ (strictly triangular S): complexifies real inputs."""
    from faer_tpu.linalg.evd import _combine_pair, _complex_unsupported

    if _complex_unsupported():
        from faer_tpu.linalg.qz_cpair import qz_pair

        s_, t_, q, z, info = qz_pair(*_split_pair_inputs(a, b),
                                     max_sweeps_factor=max_sweeps_factor)
        return (_combine_pair(*s_), _combine_pair(*t_), _combine_pair(*q),
                _combine_pair(*z), info)
    cdt = dtypes.complex_dtype_of(a.dtype)
    h, r, q, z = hessenberg_triangular(a.astype(cdt), b.astype(cdt))
    return qz_iteration(h, r, q, z, max_sweeps_factor=max_sweeps_factor)


def gevd_qz(a, b):
    """Generalized eigendecomposition via QZ: returns (alpha, beta, v, info)
    with right eigenvectors: ``A v β = B v α`` column-wise."""
    from faer_tpu.linalg.evd import _combine_pair, _complex_unsupported

    if _complex_unsupported():
        from faer_tpu.linalg.qz_cpair import gevd_qz_pair

        al, be, v, info = gevd_qz_pair(*_split_pair_inputs(a, b))
        return (_combine_pair(*al), _combine_pair(*be), _combine_pair(*v),
                info)
    n = a.shape[0]
    if not dtypes.is_complex(a.dtype):
        # real pencils: real QZ + the quasi-triangular PENCIL eigenvector
        # scan — end-to-end real arithmetic (no complexification tax)
        from faer_tpu.linalg.eigvec import (
            quasi_triangular_generalized_eigenvectors_pair,
        )
        from faer_tpu.linalg.qz_real import qz_eigenvalues_pair, real_qz

        s_, t_, q, z, info = real_qz(a, b)
        ar, ai, be = qz_eigenvalues_pair(s_, t_)
        yr, yi = quasi_triangular_generalized_eigenvectors_pair(
            s_, t_, ar, ai, be)
        from faer_tpu.ops.matmul import matmul as _mm

        vr = _mm(None, z, yr)
        vi = _mm(None, z, yi)
        from faer_tpu.linalg.evd import _combine_pair

        return (_combine_pair(ar, ai), _combine_pair(be, jnp.zeros_like(be)),
                _combine_pair(vr, vi), info)
    s_, t_, q, z, info = _qz_complex(a, b)
    alpha = jnp.diagonal(s_)
    beta = jnp.diagonal(t_)
    # eigenvectors of the triangular pair: (S − λ T) y = 0, v = Z y
    dtype = s_.dtype
    eps = dtypes.eps(dtype)
    snorm = jnp.maximum(jnp.max(jnp.abs(s_)), jnp.max(jnp.abs(t_)))
    from faer_tpu.ops.triangular_solve import solve_upper_triangular

    cols = []
    for k in range(n):
        if k == 0:
            cols.append(jnp.zeros((n,), dtype).at[0].set(1))
            continue
        lam_a = alpha[k]
        lam_b = beta[k]
        m = lam_b * s_[:k, :k] - lam_a * t_[:k, :k]
        dshift = jnp.diagonal(m)
        floor = (eps * jnp.maximum(snorm, 1.0)).astype(dtype)
        small = jnp.abs(dshift) < jnp.abs(floor)
        m = m - jnp.diag(dshift) + jnp.diag(jnp.where(small, floor, dshift))
        rhs = -(lam_b * s_[:k, k] - lam_a * t_[:k, k])[:, None]
        y = solve_upper_triangular(m, rhs)[:, 0]
        cols.append(jnp.zeros((n,), dtype).at[:k].set(y).at[k].set(1))
    y = jnp.stack(cols, axis=1)
    v = matmul(None, z, y)
    norms = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=0))
    v = v / jnp.where(norms == 0, jnp.ones_like(norms), norms)[None, :].astype(dtype)
    return alpha, beta, v, info
