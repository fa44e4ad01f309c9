"""Singular value decomposition.

Reference parity: ``faer/src/linalg/svd/mod.rs`` — ``svd`` (``:530``) with the
m/n aspect normalization (operate on Aᴴ when m < n), QR preprocessing when
m/n > 11/6 (``SvdParams.qr_ratio_threshold``, ``:43-57``), bidiagonalization →
real bidiag SVD → Householder back-transform; ``pseudoinverse_from_svd``
(``:689``).

TPU-native pipeline: QR preprocess (MXU-blocked) → ``bidiag_in_place`` →
``bidiag_svd`` (while_loop QR iteration) → back-transform.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.params import SvdParams
from faer_tpu.linalg.bidiag import (
    bidiag_apply_ql,
    bidiag_apply_qr_mat,
    bidiag_in_place,
)
from faer_tpu.linalg.bidiag_svd import bidiag_svd
from faer_tpu.linalg.qr import qr_compute_q, qr_in_place
from faer_tpu.ops.matmul import matmul


def _svd_tall(a, params: SvdParams, want_u: bool, want_v: bool):
    """SVD of a (m ≥ n). Returns (u_thin m×n, s, v n×n)."""
    m, n = a.shape
    dtype = a.dtype
    if n == 0:
        return (jnp.zeros((m, 0), dtype), jnp.zeros((0,), dtypes.real_dtype_of(dtype)),
                jnp.zeros((0, 0), dtype), None)

    q_pre = None
    if m / max(n, 1) > params.qr_ratio_threshold:
        packed, ts, block = qr_in_place(a)
        q_pre = qr_compute_q(packed, ts, block, thin=True) if want_u else None
        a = jnp.triu(packed)[:n, :]
        m = n

    d, e, vl, taul, vr, taur = bidiag_in_place(a)
    s, ub, vb, info = bidiag_svd(d, e, want_u=want_u, want_v=want_v,
                                 max_sweeps_factor=params.max_iters_per_value)
    u = v = None
    if want_u:
        ub_full = jnp.zeros((m, n), dtype).at[:n, :].set(ub.astype(dtype))
        u = bidiag_apply_ql(vl, taul, ub_full)
        if q_pre is not None:
            u = matmul(None, q_pre, u)
    if want_v:
        v = bidiag_apply_qr_mat(vr, taur, vb.astype(dtype))
    return u, s.astype(dtypes.real_dtype_of(dtype)), v, info


@functools.partial(jax.jit, static_argnames=("thin", "params", "want_u", "want_v"))
def svd(a, *, thin: bool = True, params: SvdParams | None = None,
        want_u: bool = True, want_v: bool = True):
    """SVD: ``A = U diag(S) Vᴴ``; returns ``(u, s, v, info)``, s descending.

    ``thin=True`` gives U (m×k), V (n×k) with k = min(m, n); the full variant
    pads U/V to square with an orthonormal completion (faer ``svd/mod.rs:466``
    full-vector mode).
    """
    params = params or SvdParams.auto(a.dtype, a.shape)
    m, n = a.shape
    if m >= n:
        u, s, v, info = _svd_tall(a, params, want_u, want_v)
    else:
        v, s, u, info = _svd_tall(jnp.conj(a).T, params, want_v, want_u)

    if not thin:
        # complete U (m×k → m×m) / V (n×k → n×n) via QR of the thin factor
        if want_u and u is not None and u.shape[1] < m:
            u = _complete_orthonormal(u)
        if want_v and v is not None and v.shape[1] < n:
            v = _complete_orthonormal(v)
    return u, s, v, info


def _complete_orthonormal(q_thin):
    """Extend an m×k orthonormal set to an m×m unitary basis."""
    m, k = q_thin.shape
    packed, ts, block = qr_in_place(q_thin)
    full = qr_compute_q(packed, ts, block, thin=False)
    # first k columns of full span the same subspace; replace by q_thin to keep
    # exact singular vectors and append the completion
    return jnp.concatenate([q_thin, full[:, k:]], axis=1)


def singular_values(a, params: SvdParams | None = None):
    """Singular values only (faer ``Mat::singular_values``)."""
    _, s, _, _ = svd(a, want_u=False, want_v=False,
                     params=params or SvdParams.auto(a.dtype, a.shape))
    return s


def pseudoinverse_from_svd(u, s, v, tol=None):
    """Moore-Penrose pseudoinverse (faer ``svd/mod.rs:689``)."""
    if tol is None:
        tol = jnp.max(s) * max(u.shape[0], v.shape[0]) * dtypes.eps(u.dtype)
    sinv = jnp.where(s > tol, 1.0 / jnp.where(s == 0, jnp.ones_like(s), s),
                     jnp.zeros_like(s))
    return matmul(None, v * sinv[None, :].astype(v.dtype), jnp.conj(u).T)


def pseudoinverse(a, tol=None):
    u, s, v, _ = svd(a, thin=True)
    return pseudoinverse_from_svd(u, s, v, tol=tol)
