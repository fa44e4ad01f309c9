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


def _apply_rotation_chain(z, c_arr, s_arr, chunk: int = 64):
    """Z ← Z · G_0 G_1 ⋯ G_{n-2} with G_i the Givens rotation of columns
    (i, i+1), parameters (c_arr[i], s_arr[i]) (identity where c=1, s=0).

    Chunked: the chunk products are built *batched* (one short fori updating
    all chunks' small (chunk+1)² matrices at once), then applied as a short
    Python chain of (n × chunk+1) GEMMs — MXU work instead of n sequential
    two-column scatters.
    """
    n = z.shape[0]
    nr = c_arr.shape[0]
    nchunks = -(-nr // chunk)
    pad = nchunks * chunk - nr
    c_p = jnp.concatenate([c_arr, jnp.ones((pad,), c_arr.dtype)])
    s_p = jnp.concatenate([s_arr, jnp.zeros((pad,), s_arr.dtype)])
    c_r = c_p.reshape(nchunks, chunk)
    s_r = s_p.reshape(nchunks, chunk)
    w = chunk + 1
    eye = jnp.broadcast_to(jnp.eye(w, dtype=z.dtype), (nchunks, w, w))

    def build(t, p):
        cc = c_r[:, t][:, None]
        ss = s_r[:, t][:, None]
        cols = jax.lax.dynamic_slice_in_dim(p, t, 2, axis=2)
        ct = cols[:, :, 0]
        ct1 = cols[:, :, 1]
        new = jnp.stack([cc * ct + ss * ct1, -ss * ct + cc * ct1], axis=2)
        return jax.lax.dynamic_update_slice_in_dim(p, new, t, axis=2)

    p = jax.lax.fori_loop(0, chunk, build, eye + jnp.zeros_like(eye))
    # sequential chunk application (adjacent chunks share one boundary column)
    zp = jnp.concatenate([z, jnp.zeros((n, chunk), z.dtype)], axis=1)
    for k in range(nchunks):
        j0 = k * chunk
        blk = zp[:, j0:j0 + w]
        zp = jax.lax.dynamic_update_slice(
            zp, jnp.dot(blk, p[k], precision=jax.lax.Precision.HIGHEST),
            (0, j0))
    return zp[:, :n]


def tridiag_evd(d, e, *, want_vectors: bool = True, max_sweeps_factor: int = 30,
                use_dnc: bool | None = None):
    """Eigendecomposition of the symmetric tridiagonal (d, e).

    Returns ``(w, z, info)``: ascending eigenvalues ``w``; ``z`` the real
    orthogonal eigenvector matrix of the tridiagonal (or None).

    Large problems route to divide & conquer (GEMM-dominated merges —
    faer's own large-n choice, ``tridiag_evd.rs:608``); small sizes use the
    implicit-shift QR iteration.
    """
    n = d.shape[0]
    if use_dnc is None:
        use_dnc = n >= 512 and d.dtype in (jnp.float32, jnp.float64)
    if use_dnc and n > 64:
        from faer_tpu.linalg.tridiag_dnc import tridiag_evd_dnc

        return tridiag_evd_dnc(d, e, want_vectors=want_vectors)
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
        """One implicit-shift QR sweep on block [l, m] (e[i]≠0 for l ≤ i < m).

        The (d, e) recurrence runs as a ``lax.scan`` with scalar carries (XLA
        compiles it ~10× tighter than array-scatter fori bodies) and *emits*
        the Givens coefficients; the eigenvector matrix absorbs each sweep's
        rotation chain afterwards via chunked batched GEMMs
        (``_apply_rotation_chain``) instead of 2-column scatters per step.
        """
        dm = d[m]
        dm1 = d[m - 1]
        em1 = e[m - 1]
        mu = _wilkinson_shift(dm1, em1, dm)

        from faer_tpu.core.config import panel_kernels_enabled

        if panel_kernels_enabled(rdt):
            # VMEM-resident Mosaic sweep: the XLA scan pays ~8 tiny HBM DMAs
            # per step (~6 µs measured); the kernel runs the same recurrence
            # on VMEM rows
            from faer_tpu.ops.pallas.panel_kernels import tridiag_sweep_pallas

            d, e, c_arr, s_arr = tridiag_sweep_pallas(d, e, l, m, mu)
            if z is not None:
                z = _apply_rotation_chain(z, c_arr, s_arr)
            return d, e, z

        x0 = d[l] - mu
        z0 = e[l]
        steps = jax.lax.broadcasted_iota(jnp.int32, (n - 1, 1), 0)[:, 0]
        d_next = d[1:]                      # d[i+1] entering step i (original)
        e_next = jnp.concatenate([e[1:], jnp.zeros((1,), rdt)])  # e[i+1]
        e_in = e                            # e[i] originals (pre-sweep)

        def body(carry, xs):
            d_cur, e_cur, x, bz = carry
            i, dip1, e_nx, e_im1 = xs
            active = (i >= l) & (i < m)
            c, s, r = _givens_real(x, bz)
            c = jnp.where(active, c, jnp.ones_like(c))
            s = jnp.where(active, s, jnp.zeros_like(s))
            new_di = c * c * d_cur + 2 * c * s * e_cur + s * s * dip1
            new_dip1 = s * s * d_cur - 2 * c * s * e_cur + c * c * dip1
            new_ei = c * s * (dip1 - d_cur) + (c * c - s * s) * e_cur
            has_next = active & (i + 1 < m)
            e_cur2 = jnp.where(has_next, c * e_nx, e_nx)   # e[i+1] entering i+1
            new_bz = jnp.where(active, jnp.where(has_next, s * e_nx, 0.0), bz)
            new_x = jnp.where(active, new_ei, x)
            # final value of e[i-1]: r inside the block; the carried pending
            # value right past the block end (i == m reads step m-1's new_ei
            # via x); the sweep input elsewhere
            e_out = jnp.where(active & (i > l), r,
                              jnp.where((i == m) & (m > l), x, e_im1))
            d_out = jnp.where(active, new_di, d_cur)
            return ((jnp.where(active, new_dip1, dip1), e_cur2, new_x, new_bz),
                    (d_out, e_out, c, s))

        e_im1 = jnp.concatenate([jnp.zeros((1,), rdt), e_in[:-1]])
        (d_end, _, x_end, _), (d_outs, e_outs, c_arr, s_arr) = jax.lax.scan(
            body, (d[0], e_in[0], x0, z0),
            (steps, d_next, e_next, e_im1))
        d = jnp.concatenate([d_outs, d_end[None]])
        # e_outs[i] is the final e[i-1] (emitted at step i ≥ 1); the last slot
        # e[n-2] is the carried pending value iff the block ran to the end
        e = jnp.concatenate([e_outs[1:],
                             jnp.where(m >= n - 1, x_end, e_in[n - 2])[None]])
        if z is not None:
            z = _apply_rotation_chain(z, c_arr, s_arr)
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
