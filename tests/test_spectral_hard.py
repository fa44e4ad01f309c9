"""Hard spectral regression cases.

Analogue of faer's golden bidiagonal fixtures (``faer/test_data/svd``,
``svd_josef`` hard-convergence cases — SURVEY §4.2): graded matrices,
clustered/repeated spectra, Wilkinson matrices, zero rows/cols — the shapes
that historically break implicit-shift iterations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg import evd as fevd
from faer_tpu.linalg import svd as fsvd
from faer_tpu.linalg.bidiag_svd import bidiag_svd
from faer_tpu.linalg.tridiag_evd import tridiag_evd
from faer_tpu.utils.approx import assert_approx_eq, size_scale


def test_wilkinson_tridiagonal():
    """W21+: famous near-degenerate pairs of eigenvalues."""
    n = 21
    d = jnp.asarray(np.abs(np.arange(n) - (n - 1) / 2.0))
    e = jnp.ones((n - 1,))
    w, z, info = tridiag_evd(d, e)
    assert bool(info.converged)
    T = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) + np.diag(np.asarray(e), -1)
    assert_approx_eq(np.asarray(w), np.linalg.eigvalsh(T), scale=size_scale(n) * 8)
    zn = np.asarray(z)
    assert_approx_eq(zn.T @ zn, np.eye(n), scale=size_scale(n) * 8)


def test_graded_tridiagonal():
    """Strongly graded d (12 orders of magnitude)."""
    n = 30
    d = jnp.asarray(np.logspace(0, -12, n))
    e = jnp.asarray(np.logspace(-1, -12, n - 1))
    w, z, info = tridiag_evd(d, e)
    assert bool(info.converged)
    T = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) + np.diag(np.asarray(e), -1)
    wref = np.linalg.eigvalsh(T)
    assert np.abs(np.asarray(w) - wref).max() < 1e-13


def test_bidiag_svd_graded_and_zero():
    n = 24
    d = jnp.asarray(np.logspace(0, -10, n))
    e = jnp.asarray(np.logspace(-0.5, -10, n - 1))
    s, u, v, info = bidiag_svd(d, e)
    assert bool(info.converged)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    sref = np.linalg.svd(B, compute_uv=False)
    assert np.abs(np.asarray(s) - sref).max() < 1e-12

    # an exact zero on the diagonal (splitting case)
    d2 = jnp.asarray(np.linspace(1.0, 2.0, n)).at[n // 2].set(0.0)
    e2 = jnp.asarray(np.linspace(0.5, 0.1, n - 1))
    s2, u2, v2, info2 = bidiag_svd(d2, e2)
    B2 = np.diag(np.asarray(d2)) + np.diag(np.asarray(e2), 1)
    sref2 = np.linalg.svd(B2, compute_uv=False)
    assert np.abs(np.asarray(s2) - sref2).max() < 1e-10
    rec = np.asarray(u2) @ np.diag(np.asarray(s2)) @ np.asarray(v2).T
    assert np.abs(rec - B2).max() < 1e-10


def test_repeated_eigenvalues_evd():
    # A = blockdiag(2I, diag(1..)) via similarity — repeated eigenvalue 2 (×10)
    n = 20
    rng = np.random.default_rng(5)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([np.full(10, 2.0), np.linspace(-1, 1, 10)])
    a = jnp.asarray(q @ np.diag(lam) @ q.T)
    a = 0.5 * (a + a.T)
    w, v, info = fevd.self_adjoint_evd(a)
    assert bool(info.converged)
    assert_approx_eq(np.asarray(w), np.sort(lam), scale=size_scale(n) * 32)
    vn = np.asarray(v)
    assert_approx_eq(vn.T @ vn, np.eye(n), scale=size_scale(n) * 32)


def test_rank_deficient_svd():
    m, n, r = 30, 18, 5
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((m, r)) @ rng.standard_normal((r, n)))
    u, s, v, info = fsvd.svd(a)
    sn = np.asarray(s)
    assert (sn[r:] < 1e-12 * sn[0]).all()
    rec = np.asarray(u) @ np.diag(sn) @ np.asarray(v).T
    assert np.abs(rec - np.asarray(a)).max() < 1e-12 * max(1, sn[0]) * 100


def test_zero_and_identity_matrices():
    z = jnp.zeros((7, 7))
    w, v, info = fevd.self_adjoint_evd(z)
    assert np.allclose(np.asarray(w), 0)
    u, s, vv, _ = fsvd.svd(z)
    assert np.allclose(np.asarray(s), 0)

    eye = jnp.eye(9)
    w2, v2, info2 = fevd.self_adjoint_evd(eye)
    assert np.allclose(np.asarray(w2), 1)
    assert_approx_eq(np.asarray(v2).T @ np.asarray(v2), np.eye(9), scale=64)


def test_near_defective_general_evd():
    # companion-like matrix with clustered eigenvalues
    n = 12
    rng = np.random.default_rng(7)
    lam = np.concatenate([np.full(4, 1.0 + 1e-4), np.linspace(2, 3, n - 4)])
    g = rng.standard_normal((n, n))
    a = jnp.asarray(g @ np.diag(lam) @ np.linalg.inv(g))
    w, v, info = fevd.evd(a)
    assert bool(info.converged)
    wn = np.sort(np.asarray(w).real)
    assert np.abs(np.sort(lam) - wn).max() < 5e-6 * max(np.abs(lam))
