"""Real Francis double-shift Schur + quasi-triangular eigenvectors.

Mirrors the reference's real Schur test strategy
(``faer/src/linalg/evd/schur/real_schur.rs`` tests): random matrices,
rotation-like matrices with complex spectra, repeated eigenvalues, and
structure checks on the quasi-triangular form.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg import evd as fevd
from faer_tpu.linalg.evd import hessenberg_in_place
from faer_tpu.linalg.eigvec import quasi_triangular_eigenvectors_pair
from faer_tpu.linalg.real_schur import real_schur, schur_eigenvalues_pair


def _schur_of(a):
    h, q = hessenberg_in_place(a)
    return real_schur(h, q)


def _check_schur(a, t, q, info, tol):
    an = np.asarray(a, np.float64)
    tn = np.asarray(t, np.float64)
    qn = np.asarray(q, np.float64)
    n = an.shape[0]
    assert bool(info.converged)
    assert np.linalg.norm(qn @ tn @ qn.T - an) <= tol * max(1.0, np.linalg.norm(an))
    assert np.linalg.norm(qn.T @ qn - np.eye(n)) <= tol * n
    # quasi-triangular: nothing below the first subdiagonal, no two
    # consecutive nonzero subdiagonal entries (1x1/2x2 blocks only)
    assert np.all(np.tril(tn, -2) == 0)
    if n > 2:
        sd = np.abs(np.diag(tn, -1)) > 0
        assert not np.any(sd[:-1] & sd[1:])


@pytest.mark.parametrize("n", [1, 2, 3, 5, 16, pytest.param(64, marks=pytest.mark.slow)])
def test_real_schur_random(n):
    rng = np.random.default_rng(n)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    t, q, info = _schur_of(a)
    _check_schur(a, t, q, info, 5e-5)
    wr, wi = schur_eigenvalues_pair(t)
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    wref = np.linalg.eigvals(np.asarray(a, np.float64))
    scale = max(1.0, np.max(np.abs(wref)))
    assert np.max(np.abs(np.sort_complex(w) - np.sort_complex(wref))) <= 5e-5 * scale


def test_real_schur_rotation_block_spectrum():
    # block-diagonal rotations: all eigenvalues on the unit circle, complex
    thetas = [0.3, 1.1, 2.5, 0.9]
    blocks = []
    for th in thetas:
        c, s = np.cos(th), np.sin(th)
        blocks.append(np.array([[c, -s], [s, c]]))
    a0 = np.zeros((8, 8))
    for i, b in enumerate(blocks):
        a0[2 * i : 2 * i + 2, 2 * i : 2 * i + 2] = b
    rng = np.random.default_rng(0)
    g = rng.standard_normal((8, 8))
    qh, _ = np.linalg.qr(g)
    a = jnp.asarray(qh @ a0 @ qh.T, jnp.float32)
    t, q, info = _schur_of(a)
    _check_schur(a, t, q, info, 1e-4)
    wr, wi = schur_eigenvalues_pair(t)
    w = np.sort_complex(np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64))
    wref = np.sort_complex(np.exp(1j * np.array(thetas)).repeat(1).tolist()
                           + np.exp(-1j * np.array(thetas)).tolist())
    assert np.max(np.abs(w - wref)) < 1e-4


def test_real_schur_repeated_eigenvalues():
    # A = I + nilpotent: all eigenvalues 1 (defective)
    n = 12
    a0 = np.eye(n) + np.diag(np.ones(n - 1), 1)
    a = jnp.asarray(a0, jnp.float32)
    t, q, info = _schur_of(a)
    _check_schur(a, t, q, info, 1e-4)
    wr, wi = schur_eigenvalues_pair(t)
    # defective eigenvalue cluster: accuracy only to eps^(1/n) — check the
    # mean (trace/n) instead, which is exact
    assert abs(float(jnp.sum(wr)) / n - 1.0) < 1e-4
    assert np.all(np.abs(np.asarray(wi)) < 0.5)


def test_real_schur_symmetric_input():
    n = 24
    rng = np.random.default_rng(3)
    g = rng.standard_normal((n, n))
    a = jnp.asarray(g + g.T, jnp.float32)
    t, q, info = _schur_of(a)
    _check_schur(a, t, q, info, 1e-4)
    wr, wi = schur_eigenvalues_pair(t)
    assert np.all(np.asarray(wi) == 0)  # symmetric → all real
    wref = np.linalg.eigvalsh(np.asarray(a, np.float64))
    assert np.max(np.abs(np.sort(np.asarray(wr, np.float64)) - wref)) < 1e-4 * max(
        1.0, np.max(np.abs(wref)))


@pytest.mark.parametrize("n", [2, 5, 16, pytest.param(64, marks=pytest.mark.slow)])
def test_quasi_triangular_eigenvectors(n):
    rng = np.random.default_rng(100 + n)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    t, q, info = _schur_of(a)
    wr, wi = schur_eigenvalues_pair(t)
    xr, xi = quasi_triangular_eigenvectors_pair(t, wr, wi)
    vr = np.asarray(q, np.float64) @ np.asarray(xr, np.float64)
    vi = np.asarray(q, np.float64) @ np.asarray(xi, np.float64)
    v = vr + 1j * vi
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    an = np.asarray(a, np.float64)
    assert np.linalg.norm(an @ v - v * w[None, :]) < 2e-4 * max(1.0, np.linalg.norm(an))
    # unit columns
    assert np.allclose(np.linalg.norm(v, axis=0), 1.0, atol=1e-4)


def test_evd_real_path_no_complexification():
    # public evd on a real matrix must route through the real Schur path and
    # agree with numpy
    n = 32
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    w, v, info = fevd.evd(a)
    assert bool(info.converged)
    wn = np.sort_complex(np.asarray(w))
    wref = np.sort_complex(np.linalg.eigvals(np.asarray(a, np.float64)))
    assert np.max(np.abs(wn - wref)) < 5e-5 * max(1.0, np.max(np.abs(wref)))
    an = np.asarray(a, np.float64)
    vn = np.asarray(v)
    assert np.linalg.norm(an @ vn - vn * np.asarray(w)[None, :]) < 2e-4 * np.linalg.norm(an)


def test_evd_pair_jittable():
    n = 16
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jax.jit(lambda m: fevd.evd_pair(m))
    (wr, wi), (vr, vi), info = f(a)
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    wref = np.linalg.eigvals(np.asarray(a, np.float64))
    assert np.max(np.abs(np.sort_complex(w) - np.sort_complex(wref))) < 5e-5 * max(
        1.0, np.max(np.abs(wref)))
