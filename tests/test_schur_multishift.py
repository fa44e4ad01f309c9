"""Multishift QR + aggressive early deflation (large-matrix real Schur).

Mirrors the reference's multishift tests
(``faer/src/linalg/evd/schur/real_schur.rs:2117`` ``multishift_qr``,
``:771`` ``aggressive_early_deflation``): random matrices, structure checks
on the quasi-triangular form, eigenvalue parity against LAPACK, hard spectra
(defective clusters, unit-circle rotations), and agreement with the
small-matrix lahqr path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg import evd as fevd
from faer_tpu.linalg.evd import hessenberg_in_place
from faer_tpu.linalg.real_schur import schur_eigenvalues_pair
from faer_tpu.linalg.schur_multishift import multishift_real_schur


def _ms_schur_of(a, **kw):
    h, q = hessenberg_in_place(a)
    return multishift_real_schur(h, q, **kw)


def _check_schur(a, t, q, info, tol):
    an = np.asarray(a, np.float64)
    tn = np.asarray(t, np.float64)
    qn = np.asarray(q, np.float64)
    n = an.shape[0]
    assert bool(info.converged)
    assert np.linalg.norm(qn @ tn @ qn.T - an) <= tol * max(1.0, np.linalg.norm(an))
    assert np.linalg.norm(qn.T @ qn - np.eye(n)) <= tol * n
    assert np.all(np.tril(tn, -2) == 0)
    sd = np.abs(np.diag(tn, -1)) > 0
    assert not np.any(sd[:-1] & sd[1:])


def _check_eigs(a, t, tol):
    wr, wi = schur_eigenvalues_pair(t)
    w = np.sort_complex(np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64))
    wref = np.sort_complex(np.linalg.eigvals(np.asarray(a, np.float64)))
    scale = max(1.0, np.max(np.abs(wref)))
    assert np.max(np.abs(w - wref)) <= tol * scale


@pytest.mark.parametrize("n,dtype,tol", [
    (150, jnp.float32, 2e-4),
    (200, jnp.float64, 1e-10),
    pytest.param(300, jnp.float32, 3e-4, marks=pytest.mark.slow),
    pytest.param(512, jnp.float32, 5e-4, marks=pytest.mark.slow),
])
def test_multishift_random(n, dtype, tol):
    rng = np.random.default_rng(n)
    a = jnp.asarray(rng.standard_normal((n, n)), dtype)
    t, q, info = _ms_schur_of(a)
    _check_schur(a, t, q, info, tol)
    _check_eigs(a, t, tol)


def test_multishift_defective_cluster():
    # I + nilpotent superdiagonal: single defective eigenvalue 1.  AED must
    # still terminate; trace/n is exact even when the cluster smears.
    n = 150
    a = jnp.asarray(np.eye(n) + np.diag(np.ones(n - 1), 1), jnp.float32)
    t, q, info = _ms_schur_of(a)
    assert bool(info.converged)
    assert abs(float(jnp.trace(t)) / n - 1.0) < 1e-3


def test_multishift_rotation_spectrum():
    # orthogonal-similarity of 2x2 rotations: every eigenvalue is a complex
    # pair on the unit circle — the all-2x2-blocks stress case for AED's
    # block-atomic spike truncation and pair-aligned shift selection.
    rng = np.random.default_rng(5)
    n = 160
    thetas = rng.uniform(0.1, np.pi - 0.1, n // 2)
    a0 = np.zeros((n, n))
    for i, th in enumerate(thetas):
        c, s = np.cos(th), np.sin(th)
        a0[2 * i:2 * i + 2, 2 * i:2 * i + 2] = [[c, -s], [s, c]]
    qh, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = jnp.asarray(qh @ a0 @ qh.T, jnp.float32)
    t, q, info = _ms_schur_of(a)
    _check_schur(a, t, q, info, 5e-4)
    wr, wi = schur_eigenvalues_pair(t)
    mod = np.abs(np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64))
    assert np.max(np.abs(mod - 1.0)) < 5e-4


def test_multishift_agrees_with_lahqr():
    # same matrix through both engines → same spectrum
    from faer_tpu.linalg.real_schur import real_schur

    n = 144
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h, q = hessenberg_in_place(a)
    t1, _, i1 = multishift_real_schur(h, q)
    t2, _, i2 = real_schur(h, q)
    assert bool(i1.converged) and bool(i2.converged)
    w1r, w1i = schur_eigenvalues_pair(t1)
    w2r, w2i = schur_eigenvalues_pair(t2)
    w1 = np.sort_complex(np.asarray(w1r, np.float64) + 1j * np.asarray(w1i, np.float64))
    w2 = np.sort_complex(np.asarray(w2r, np.float64) + 1j * np.asarray(w2i, np.float64))
    assert np.max(np.abs(w1 - w2)) < 2e-4 * max(1.0, np.max(np.abs(w1)))


def test_evd_pair_routes_large_to_multishift():
    # public dispatch: n >= 128 goes through the multishift engine and the
    # full eigendecomposition stays accurate
    n = 130
    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    (wr, wi), (vr, vi), info = fevd.evd_pair(a)
    assert bool(info.converged)
    an = np.asarray(a, np.float64)
    v = np.asarray(vr, np.float64) + 1j * np.asarray(vi, np.float64)
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    assert np.linalg.norm(an @ v - v * w[None, :]) < 5e-4 * np.linalg.norm(an)
