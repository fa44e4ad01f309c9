"""Divide & conquer tridiagonal eigensolver tests.

Reference parity: faer's divide-and-conquer coverage in
``faer/src/linalg/evd/tridiag_evd.rs`` tests (``divide_and_conquer``), plus
the classic D&C stress matrices (glued Wilkinson, clustered poles) that
exercise secular-equation deflation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg.tridiag_dnc import tridiag_evd_dnc
from faer_tpu.linalg.tridiag_evd import tridiag_evd


def _check(d, e, *, resid_tol, orth_tol):
    n = d.shape[0]
    w, v, info = tridiag_evd_dnc(jnp.asarray(d), jnp.asarray(e))
    vn = np.asarray(v, np.float64)
    wn = np.asarray(w, np.float64)
    T = (np.diag(d.astype(np.float64))
         + np.diag(e.astype(np.float64), 1)
         + np.diag(e.astype(np.float64), -1))
    sc = max(np.abs(T).max(), 1.0)
    resid = np.abs(T @ vn - vn * wn[None, :]).max() / sc
    orth = np.abs(vn.T @ vn - np.eye(n)).max()
    werr = np.abs(np.sort(wn) - np.linalg.eigvalsh(T)).max() / sc
    assert resid < resid_tol, f"resid {resid:.3e}"
    assert orth < orth_tol, f"orth {orth:.3e}"
    assert werr < resid_tol, f"werr {werr:.3e}"
    assert np.all(np.diff(wn) >= 0), "eigenvalues must be ascending"


@pytest.mark.parametrize("n,seed", [pytest.param(300, 0, marks=pytest.mark.slow), pytest.param(517, 3, marks=pytest.mark.slow)])
def test_dnc_random_f64(n, seed):
    rng = np.random.default_rng(seed)
    _check(rng.standard_normal(n), rng.standard_normal(n - 1),
           resid_tol=1e-12, orth_tol=1e-12)


def test_dnc_random_f32():
    rng = np.random.default_rng(1)
    n = 600
    _check(rng.standard_normal(n).astype(np.float32),
           rng.standard_normal(n - 1).astype(np.float32),
           resid_tol=5e-4, orth_tol=5e-4)


def test_dnc_glued_wilkinson():
    # glued Wilkinson W21 blocks: tight eigenvalue clusters that break
    # secular solvers without proper deflation
    w21d = np.abs(np.arange(-10, 11)).astype(np.float64)
    gd, ge = [], []
    for b in range(16):
        gd.append(w21d)
        ge.append(np.ones(20))
        if b < 15:
            ge.append(np.array([1e-12]))
    _check(np.concatenate(gd), np.concatenate(ge),
           resid_tol=1e-11, orth_tol=1e-11)


def test_dnc_clustered_poles():
    rng = np.random.default_rng(2)
    n = 321
    _check(np.ones(n), rng.standard_normal(n - 1) * 1e-8,
           resid_tol=1e-11, orth_tol=1e-10)


def test_dnc_pre_split_blocks():
    rng = np.random.default_rng(3)
    n = 321
    e = rng.standard_normal(n - 1)
    e[::7] = 0.0          # exactly decoupled blocks → zero-z deflation paths
    _check(rng.standard_normal(n), e, resid_tol=1e-12, orth_tol=1e-12)


def test_dnc_extreme_scales():
    rng = np.random.default_rng(4)
    n = 130
    _check(rng.standard_normal(n) * 1e150, rng.standard_normal(n - 1) * 1e150,
           resid_tol=1e-9, orth_tol=1e-9)
    _check(rng.standard_normal(n) * 1e-150,
           rng.standard_normal(n - 1) * 1e-150,
           resid_tol=1e-9, orth_tol=1e-9)


@pytest.mark.slow
def test_tridiag_evd_gate_routes_large_to_dnc():
    # the public entry point routes n >= 512 to D&C; results must agree with
    # the QR-iteration path to within both paths' accuracy
    rng = np.random.default_rng(5)
    n = 512
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))
    w_dnc, v_dnc, _ = tridiag_evd(d, e)               # gate: D&C
    w_qr, _, _ = tridiag_evd(d, e, use_dnc=False)     # forced QR iteration
    np.testing.assert_allclose(np.asarray(w_dnc), np.asarray(w_qr),
                               atol=1e-10, rtol=1e-10)
    vn = np.asarray(v_dnc)
    T = (np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
         + np.diag(np.asarray(e), -1))
    resid = np.abs(T @ vn - vn * np.asarray(w_dnc)[None, :]).max()
    assert resid < 1e-12
