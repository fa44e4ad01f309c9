"""Spectral stack tests: SVD, self-adjoint EVD, general EVD, GEVD.

Mirrors faer's property tests; oracles are numpy/scipy (SURVEY §4 point 3).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu.linalg import evd as fevd
from faer_tpu.linalg import gevd as fgevd
from faer_tpu.linalg import svd as fsvd
from faer_tpu.utils.approx import assert_approx_eq, size_scale

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("m,n", [(1, 1), (12, 12), (40, 25), (25, 40), pytest.param(100, 20, marks=pytest.mark.slow)])
def test_svd(dtype, m, n):
    a = stats.standard_normal_mat(jax.random.key(51), m, n, dtype)
    u, s, v, info = fsvd.svd(a)
    assert bool(info.converged)
    an, un, sn, vn = map(np.asarray, (a, u, s, v))
    k = min(m, n)
    scale = size_scale(max(m, n)) * 16
    assert_approx_eq(un @ np.diag(sn.astype(un.dtype)) @ np.conj(vn).T, an,
                     scale=scale, tol_dtype=dtype)
    assert_approx_eq(np.conj(un).T @ un, np.eye(k), scale=scale, tol_dtype=dtype)
    assert_approx_eq(np.conj(vn).T @ vn, np.eye(k), scale=scale, tol_dtype=dtype)
    sref = np.linalg.svd(an, compute_uv=False)
    assert_approx_eq(sn, sref, scale=scale, tol_dtype=dtype)
    assert np.all(np.diff(sn) <= 1e-12 * max(sn[0], 1))  # descending


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_svd_full_and_pinv(dtype):
    m, n = 30, 12
    a = stats.standard_normal_mat(jax.random.key(52), m, n, dtype)
    u, s, v, _ = fsvd.svd(a, thin=False)
    an, un = np.asarray(a), np.asarray(u)
    assert un.shape == (m, m)
    assert_approx_eq(np.conj(un).T @ un, np.eye(m), scale=size_scale(m) * 16)

    pinv = fsvd.pseudoinverse(a)
    assert_approx_eq(np.asarray(pinv), np.linalg.pinv(an), scale=size_scale(m) * 64)

    sv = fsvd.singular_values(a)
    assert_approx_eq(sv, np.linalg.svd(an, compute_uv=False), scale=size_scale(m) * 16)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", [1, 2, 16, pytest.param(80, marks=pytest.mark.slow)])
def test_self_adjoint_evd(dtype, n):
    a = stats.self_adjoint_mat(jax.random.key(53), n, dtype)
    w, v, info = fevd.self_adjoint_evd(a)
    assert bool(info.converged)
    an, vn, wn = map(np.asarray, (a, v, w))
    scale = size_scale(n) * 16
    assert_approx_eq(an @ vn, vn * wn[None, :], scale=scale, tol_dtype=dtype)
    assert_approx_eq(np.conj(vn).T @ vn, np.eye(n), scale=scale, tol_dtype=dtype)
    assert_approx_eq(wn, np.linalg.eigvalsh(an), scale=scale, tol_dtype=dtype)
    assert np.all(np.diff(wn) >= -1e-12 * max(abs(wn).max(), 1))  # ascending


def _match_eigs(got, want):
    """Greedy bipartite match |got_i − want_j| (conjugate-pair order varies)."""
    got = list(got)
    err = 0.0
    for w in want:
        i = int(np.argmin([abs(g - w) for g in got]))
        err = max(err, abs(got[i] - w))
        got.pop(i)
    return err


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", [2, 5, 20, pytest.param(60, marks=pytest.mark.slow)])
def test_general_evd(dtype, n):
    a = stats.standard_normal_mat(jax.random.key(54), n, n, dtype)
    w, v, info = fevd.evd(a)
    assert bool(info.converged)
    an, vn, wn = map(np.asarray, (a, v, w))
    resid = np.abs(an @ vn - vn * wn[None, :]).max()
    tol = size_scale(n) * 64 * np.finfo(np.asarray(a).real.dtype).eps * max(1.0, np.abs(an).max())
    assert resid < tol, f"residual {resid} vs {tol}"
    werr = _match_eigs(wn, np.linalg.eigvals(an))
    assert werr < tol, f"eigenvalue error {werr} vs {tol}"


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_evd_defective_and_repeated(dtype):
    # repeated eigenvalues (identity block) and near-defective Jordan-ish case
    n = 8
    a = jnp.eye(n, dtype=dtype) * 2.0
    w, v, info = fevd.evd(a)
    assert_approx_eq(np.sort(np.asarray(w).real), 2.0 * np.ones(n), scale=size_scale(n) * 8)

    jord = jnp.eye(n, k=1, dtype=dtype) + jnp.eye(n, dtype=dtype) * 0.5
    w2, _, info2 = fevd.evd(jord)
    assert bool(info2.converged)
    assert np.abs(np.asarray(w2) - 0.5).max() < 2e-2  # Jordan: eigenvalues ill-conditioned


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_gevd_self_adjoint(dtype):
    n = 24
    k1, k2 = jax.random.split(jax.random.key(55))
    a = stats.self_adjoint_mat(k1, n, dtype)
    b = stats.spd_mat(k2, n, dtype)
    w, v, info = fgevd.gevd_self_adjoint(a, b)
    an, bn, vn, wn = map(np.asarray, (a, b, v, w))
    scale = size_scale(n) * 64
    assert_approx_eq(an @ vn, bn @ vn * wn[None, :], scale=scale)
    # B-orthonormality
    assert_approx_eq(np.conj(vn).T @ bn @ vn, np.eye(n), scale=scale)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_gevd_general(dtype):
    n = 16
    k1, k2 = jax.random.split(jax.random.key(56))
    a = stats.standard_normal_mat(k1, n, n, dtype)
    b = stats.standard_normal_mat(k2, n, n, dtype) + 3.0 * jnp.eye(n, dtype=dtype)
    alpha, beta, v, info = fgevd.gevd(a, b)
    an, bn, vn = map(np.asarray, (a, b, v))
    lam = np.asarray(alpha) / np.asarray(beta)
    resid = np.abs(an @ vn - bn @ vn * lam[None, :]).max()
    assert resid < size_scale(n) * 512 * np.finfo(np.asarray(a).real.dtype).eps * np.abs(bn).max() * np.abs(lam).max()


def test_solver_objects_spectral():
    import faer_tpu as ft

    a = ft.Mat(stats.self_adjoint_mat(jax.random.key(57), 20, jnp.float64))
    e = a.self_adjoint_eigen()
    assert_approx_eq(e.reconstruct(), np.asarray(a.a), scale=size_scale(20) * 32)

    g = ft.Mat(stats.standard_normal_mat(jax.random.key(58), 15, 10, jnp.float64))
    svd_obj = g.svd()
    assert_approx_eq(svd_obj.reconstruct(), np.asarray(g.a), scale=size_scale(15) * 32)
    assert int(svd_obj.rank()) == 10

    eig = ft.Mat(stats.standard_normal_mat(jax.random.key(59), 12, 12, jnp.float64)).eigen()
    an, vn, wn = np.asarray(ft.Mat._coerce(eig.eigenvectors)), np.asarray(eig.eigenvectors), np.asarray(eig.eigenvalues)
    a12 = np.asarray(stats.standard_normal_mat(jax.random.key(59), 12, 12, jnp.float64))
    assert np.abs(a12 @ vn - vn * wn[None, :]).max() < 1e-10


@pytest.mark.parametrize("dtype", [jnp.complex128])
def test_qz_generalized_schur(dtype):
    import scipy.linalg as sla

    from faer_tpu.linalg import qz as fqz

    n = 16
    k1, k2 = jax.random.split(jax.random.key(60))
    a = stats.standard_normal_mat(k1, n, n, dtype)
    b = stats.standard_normal_mat(k2, n, n, dtype)
    s_, t_, q, v, info = fqz.qz(a, b)
    assert bool(info.converged)
    an, bn = np.asarray(a), np.asarray(b)
    sn, tn, qn, vn = map(np.asarray, (s_, t_, q, v))
    scale = size_scale(n) * 32
    assert_approx_eq(qn @ sn @ np.conj(vn).T, an, scale=scale)
    assert_approx_eq(qn @ tn @ np.conj(vn).T, bn, scale=scale)
    assert np.abs(np.tril(sn, -1)).max() == 0
    assert np.abs(np.tril(tn, -1)).max() == 0
    lam = np.diag(sn) / np.diag(tn)
    assert _match_eigs(lam, sla.eigvals(an, bn)) < scale * np.finfo(np.float64).eps * 100


def test_gevd_qz_singular_b():
    """True QZ handles singular B (infinite eigenvalues) — the reduction
    method cannot."""
    from faer_tpu.linalg import qz as fqz

    n = 8
    a = stats.standard_normal_mat(jax.random.key(62), n, n, jnp.float64)
    bsing = stats.standard_normal_mat(jax.random.key(63), n, 3, jnp.float64)
    b = bsing @ bsing.T  # rank 3 → 5 infinite eigenvalues
    alpha, beta, v, info = fqz.gevd_qz(a, jnp.asarray(b))
    # finite eigenvalues must satisfy the pencil equation
    an, bn, vn = np.asarray(a), np.asarray(b), np.asarray(v)
    resid = np.abs(an @ vn * np.asarray(beta)[None, :] -
                   bn @ vn * np.asarray(alpha)[None, :]).max()
    assert resid < 1e-10 * max(np.abs(an).max(), np.abs(bn).max()) * 100
    assert int(np.sum(np.abs(np.asarray(beta)) < 1e-10)) >= 3  # infinite eigs detected


def test_blocked_tridiag_matches_unblocked():
    """latrd-style panelled tridiagonalization: same contract, machine-
    precision reconstruction (tridiag.rs:274 parity)."""
    from faer_tpu.linalg.tridiag import tridiag_apply_q, tridiag_in_place

    rng = np.random.default_rng(5)
    for n, dt in ((300, jnp.float64), (300, jnp.complex128)):
        g = rng.standard_normal((n, n))
        if jnp.issubdtype(dt, jnp.complexfloating):
            g = g + 1j * rng.standard_normal((n, n))
        a = jnp.asarray(g + np.conj(g).T, dt)
        d, e, hh, taus = tridiag_in_place(a, block=64)
        t = (np.diag(np.asarray(d, np.float64))
             + np.diag(np.asarray(e, np.float64), -1)
             + np.diag(np.asarray(e, np.float64), 1))
        q = np.asarray(tridiag_apply_q(hh, taus, jnp.eye(n, dtype=a.dtype)),
                       np.complex128)
        an = np.asarray(a, np.complex128)
        rec = np.abs(q @ t @ np.conj(q).T - an).max() / np.abs(an).max()
        orth = np.abs(np.conj(q).T @ q - np.eye(n)).max()
        assert rec < 64 * n * np.finfo(np.float64).eps, rec
        assert orth < 64 * n * np.finfo(np.float64).eps, orth


def test_blocked_bidiag_matches_unblocked():
    """labrd-style panelled bidiagonalization (bidiag.rs:47 parity)."""
    from faer_tpu.linalg.bidiag import (
        bidiag_apply_ql,
        bidiag_apply_qr_mat,
        bidiag_in_place,
    )

    rng = np.random.default_rng(6)
    for (m, n), dt in (((340, 300), jnp.float64), ((300, 300), jnp.complex128)):
        g = rng.standard_normal((m, n))
        if jnp.issubdtype(dt, jnp.complexfloating):
            g = g + 1j * rng.standard_normal((m, n))
        a = jnp.asarray(g, dt)
        d, e, vl, taul, vr, taur = bidiag_in_place(a, block=64)
        b = np.zeros((m, n))
        b[np.arange(n), np.arange(n)] = np.asarray(d, np.float64)
        b[np.arange(n - 1), np.arange(1, n)] = np.asarray(e, np.float64)
        ql_b = bidiag_apply_ql(vl, taul, jnp.asarray(b, a.dtype))
        rec = bidiag_apply_qr_mat(vr, taur, jnp.conj(ql_b).T)
        rec = np.conj(np.asarray(rec, np.complex128)).T
        an = np.asarray(a, np.complex128)
        err = np.abs(rec - an).max() / np.abs(an).max()
        assert err < 64 * n * np.finfo(np.float64).eps, err


def test_blocked_hessenberg_matches_unblocked():
    """lahr2-panel Hessenberg reduction (hessenberg.rs:549 parity)."""
    from faer_tpu.linalg.evd import hessenberg_blocked

    rng = np.random.default_rng(7)
    for n, dt in ((300, jnp.float64), (260, jnp.complex128)):
        g = rng.standard_normal((n, n))
        if jnp.issubdtype(dt, jnp.complexfloating):
            g = g + 1j * rng.standard_normal((n, n))
        a = jnp.asarray(g, dt)
        h, q = hessenberg_blocked(a, block=64)
        hn = np.asarray(h, np.complex128)
        qn = np.asarray(q, np.complex128)
        an = np.asarray(a, np.complex128)
        rec = np.abs(qn @ hn @ np.conj(qn).T - an).max() / np.abs(an).max()
        orth = np.abs(np.conj(qn).T @ qn - np.eye(n)).max()
        assert rec < 64 * n * np.finfo(np.float64).eps, rec
        assert orth < 64 * n * np.finfo(np.float64).eps, orth
        assert np.abs(np.tril(hn, -2)).max() == 0.0
