"""Bidiagonal divide & conquer SVD: random + faer golden fixtures.

The fixture matrices are the reference's hard-convergence regressions
(``faer/test_data/svd/*.txt``, parse semantics at ``bidiag_svd.rs:1526``):
an (n+1)×n LOWER bidiagonal per file — its transpose is our (n, n+1) wide
upper bidiagonal, so the wide D&C path is exercised directly.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg.bidiag_dnc import _dnc, bidiag_svd_dnc
from faer_tpu.linalg.bidiag_svd import bidiag_svd

DATA = os.path.join(os.path.dirname(__file__), "data", "svd")


def parse_bidiag(path):
    diag, sub, cur = [], [], None
    for line in open(path):
        line = line.strip().rstrip(",")
        if line == "diag":
            cur = diag
            continue
        if line == "subdiag":
            cur = sub
            continue
        if line:
            cur.append(float(line))
    return np.array(diag), np.array(sub)


def _check(d, e, s, u, v, tol):
    n = d.shape[0]
    B = np.diag(np.asarray(d, np.float64)) + np.diag(np.asarray(e, np.float64), 1)
    un, vn, sn = (np.asarray(u, np.float64), np.asarray(v, np.float64),
                  np.asarray(s, np.float64))
    nb = max(1.0, np.linalg.norm(B))
    assert np.linalg.norm(un @ np.diag(sn) @ vn.T - B) <= tol * nb
    assert np.linalg.norm(un.T @ un - np.eye(n)) <= tol * n
    assert np.linalg.norm(vn.T @ vn - np.eye(n)) <= tol * n
    assert np.all(sn[:-1] >= sn[1:] - 1e-12) and np.all(sn >= 0)


@pytest.mark.parametrize("n", [80, 130, pytest.param(300, marks=pytest.mark.slow)])
def test_bidiag_dnc_random(n):
    rng = np.random.default_rng(n)
    d = jnp.asarray(rng.standard_normal(n), jnp.float32)
    e = jnp.asarray(rng.standard_normal(n - 1), jnp.float32)
    s, u, v, info = bidiag_svd_dnc(d, e)
    _check(d, e, s, u, v, 5e-5)
    sref = np.linalg.svd(
        np.diag(np.asarray(d, np.float64)) + np.diag(np.asarray(e, np.float64), 1),
        compute_uv=False)
    assert np.max(np.abs(np.asarray(s, np.float64) - sref)) <= 5e-5 * sref[0]


def test_bidiag_dnc_graded_and_zero_entries():
    n = 100
    rng = np.random.default_rng(0)
    d0 = (10.0 ** np.linspace(0, -6, n)) * rng.standard_normal(n)
    e0 = (10.0 ** np.linspace(0, -6, n - 1)) * rng.standard_normal(n - 1)
    d0[n // 2] = 0.0            # exact zero diagonal inside
    e0[n // 3] = 0.0            # exact split
    d = jnp.asarray(d0, jnp.float32)
    e = jnp.asarray(e0, jnp.float32)
    s, u, v, info = bidiag_svd_dnc(d, e)
    _check(d, e, s, u, v, 1e-4)


@pytest.mark.slow
def test_bidiag_svd_routes_to_dnc():
    n = 600
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.standard_normal(n), jnp.float32)
    e = jnp.asarray(rng.standard_normal(n - 1), jnp.float32)
    s, u, v, info = bidiag_svd(d, e)   # auto-routes (n >= 512)
    _check(d, e, s, u, v, 1e-4)


@pytest.mark.parametrize("name", ["svd64.txt", "svd128.txt"])
def test_golden_fixture_small(name):
    diag, sub = parse_bidiag(os.path.join(DATA, name))
    # (n+1, n) lower bidiagonal transposed -> (n, n+1) wide upper bidiagonal
    n = diag.shape[0]
    d = jnp.asarray(diag, jnp.float32)
    e = jnp.asarray(sub, jnp.float32)
    u, s, w = _dnc(d, e, 1)
    B = np.zeros((n, n + 1))
    B[np.arange(n), np.arange(n)] = diag
    B[np.arange(n), np.arange(n) + 1] = sub
    un, wn = np.asarray(u, np.float64), np.asarray(w, np.float64)
    sn = np.asarray(s, np.float64)
    S = np.zeros((n, n + 1))
    S[np.arange(n), np.arange(n)] = sn[:n]
    nb = max(1.0, np.linalg.norm(B))
    assert np.linalg.norm(un @ S @ wn.T - B) <= 1e-4 * nb
    assert np.linalg.norm(un.T @ un - np.eye(n)) <= 1e-4 * n
    assert np.linalg.norm(wn.T @ wn - np.eye(n + 1)) <= 1e-4 * (n + 1)
    sref = np.linalg.svd(B, compute_uv=False)
    assert np.max(np.abs(np.sort(sn[:n])[::-1] - sref)) <= 1e-4 * max(1.0, sref[0])


@pytest.mark.slow
@pytest.mark.parametrize("name", ["svd512.txt", "svd1024_0.txt", "svd1024_1.txt",
                                  "svd1024_2.txt"])
def test_golden_fixture_large(name):
    diag, sub = parse_bidiag(os.path.join(DATA, name))
    n = diag.shape[0]
    d = jnp.asarray(diag, jnp.float32)
    e = jnp.asarray(sub, jnp.float32)
    u, s, w = _dnc(d, e, 1)
    B = np.zeros((n, n + 1))
    B[np.arange(n), np.arange(n)] = diag
    B[np.arange(n), np.arange(n) + 1] = sub
    un, wn = np.asarray(u, np.float64), np.asarray(w, np.float64)
    sn = np.asarray(s, np.float64)
    S = np.zeros((n, n + 1))
    S[np.arange(n), np.arange(n)] = sn[:n]
    nb = max(1.0, np.linalg.norm(B))
    assert np.linalg.norm(un @ S @ wn.T - B) <= 2e-4 * nb
    assert np.linalg.norm(un.T @ un - np.eye(n)) <= 2e-4 * n
    assert np.linalg.norm(wn.T @ wn - np.eye(n + 1)) <= 2e-4 * (n + 1)
