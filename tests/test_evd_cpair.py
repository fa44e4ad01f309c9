"""Split-(re,im) complex eigendecomposition — the complex-on-TPU path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg.evd_cpair import (
    complex_schur_pair,
    eigenvalues_cpair,
    evd_cpair,
    hessenberg_pair,
)


@pytest.mark.parametrize("n", [2, 5, 16, 48])
def test_evd_cpair_random(n):
    rng = np.random.default_rng(n)
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    ar = jnp.asarray(an.real, jnp.float32)
    ai = jnp.asarray(an.imag, jnp.float32)
    (wr, wi), (vr, vi), info = evd_cpair(ar, ai)
    assert bool(info.converged)
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    v = np.asarray(vr, np.float64) + 1j * np.asarray(vi, np.float64)
    wref = np.linalg.eigvals(an)
    scale = max(1.0, np.max(np.abs(wref)))
    assert np.max(np.abs(np.sort_complex(w) - np.sort_complex(wref))) < 1e-4 * scale
    assert np.linalg.norm(an @ v - v * w[None, :]) < 1e-4 * np.linalg.norm(an)


def test_hessenberg_pair_unitary():
    n = 20
    rng = np.random.default_rng(1)
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h, q = hessenberg_pair(jnp.asarray(an.real, jnp.float32),
                           jnp.asarray(an.imag, jnp.float32))
    hn = np.asarray(h[0], np.float64) + 1j * np.asarray(h[1], np.float64)
    qn = np.asarray(q[0], np.float64) + 1j * np.asarray(q[1], np.float64)
    assert np.allclose(np.tril(hn, -2), 0)
    assert np.linalg.norm(qn.conj().T @ qn - np.eye(n)) < 1e-5 * n
    assert np.linalg.norm(qn @ hn @ qn.conj().T - an) < 1e-5 * np.linalg.norm(an)


def test_schur_pair_triangular():
    n = 24
    rng = np.random.default_rng(2)
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h, q = hessenberg_pair(jnp.asarray(an.real, jnp.float32),
                           jnp.asarray(an.imag, jnp.float32))
    t, qs, info = complex_schur_pair(h, q)
    assert bool(info.converged)
    tn = np.asarray(t[0], np.float64) + 1j * np.asarray(t[1], np.float64)
    qn = np.asarray(qs[0], np.float64) + 1j * np.asarray(qs[1], np.float64)
    assert np.allclose(np.tril(tn, -1), 0)
    assert np.linalg.norm(qn @ tn @ qn.conj().T - an) < 2e-5 * max(1, np.linalg.norm(an))


def test_public_evd_routes_complex_by_backend():
    # on a complex-capable backend the public evd keeps the native path; the
    # pair path agrees with it on the same input
    from faer_tpu.linalg import evd as fevd

    n = 12
    rng = np.random.default_rng(3)
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    w_native, v_native, _ = fevd.evd(jnp.asarray(an, jnp.complex64))
    wr, wi = eigenvalues_cpair(jnp.asarray(an.real, jnp.float32),
                               jnp.asarray(an.imag, jnp.float32))
    w_pair = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    assert np.max(np.abs(np.sort_complex(np.asarray(w_native))
                         - np.sort_complex(w_pair))) < 1e-4 * max(
        1.0, np.max(np.abs(w_pair)))


@pytest.mark.parametrize("n", [4, 16])
def test_qz_pair_generalized_schur(n):
    from faer_tpu.linalg.qz_cpair import gevd_qz_pair, qz_pair

    rng = np.random.default_rng(50 + n)
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    bn = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    args = [jnp.asarray(x, jnp.float32)
            for x in (an.real, an.imag, bn.real, bn.imag)]
    s_, t_, q, z, info = qz_pair(*args)
    assert bool(info.converged)
    S = np.asarray(s_[0], np.float64) + 1j * np.asarray(s_[1], np.float64)
    T = np.asarray(t_[0], np.float64) + 1j * np.asarray(t_[1], np.float64)
    Q = np.asarray(q[0], np.float64) + 1j * np.asarray(q[1], np.float64)
    Z = np.asarray(z[0], np.float64) + 1j * np.asarray(z[1], np.float64)
    assert np.allclose(np.tril(S, -1), 0) and np.allclose(np.tril(T, -1), 0)
    assert np.linalg.norm(Q @ S @ Z.conj().T - an) < 1e-4 * np.linalg.norm(an)
    assert np.linalg.norm(Q @ T @ Z.conj().T - bn) < 1e-4 * np.linalg.norm(bn)
    al, be, v, _ = gevd_qz_pair(*args)
    V = np.asarray(v[0], np.float64) + 1j * np.asarray(v[1], np.float64)
    aln = np.asarray(al[0], np.float64) + 1j * np.asarray(al[1], np.float64)
    ben = np.asarray(be[0], np.float64) + 1j * np.asarray(be[1], np.float64)
    pen = np.linalg.norm(an @ V * ben[None, :] - bn @ V * aln[None, :])
    assert pen < 1e-4 * max(1.0, np.linalg.norm(an))


def test_multishift_complex_schur_pair():
    from faer_tpu.linalg.evd_cpair import hessenberg_pair
    from faer_tpu.linalg.schur_multishift_cpair import (
        multishift_complex_schur_pair)

    rng = np.random.default_rng(7)
    n = 160
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h, q = hessenberg_pair(jnp.asarray(an.real, jnp.float32),
                           jnp.asarray(an.imag, jnp.float32))
    t, qq, info = multishift_complex_schur_pair(h, q, ns=16, w=24)
    assert bool(info.converged)
    T = np.asarray(t[0], np.float64) + 1j * np.asarray(t[1], np.float64)
    Q = np.asarray(qq[0], np.float64) + 1j * np.asarray(qq[1], np.float64)
    assert np.allclose(np.tril(T, -1), 0)
    scale = np.linalg.norm(an)
    assert np.linalg.norm(Q @ T @ Q.conj().T - an) < 2e-4 * scale
    assert np.max(np.abs(Q @ Q.conj().T - np.eye(n))) < 1e-4
    werr = np.max(np.abs(np.sort_complex(np.diag(T))
                         - np.sort_complex(np.linalg.eigvals(an))))
    assert werr < 5e-3 * np.max(np.abs(np.diag(T)))


def test_evd_cpair_routes_multishift():
    # n >= 128 goes through the multishift+AED pair path
    from faer_tpu.linalg.evd_cpair import evd_cpair

    rng = np.random.default_rng(8)
    n = 130
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    (wr, wi), (vr, vi), info = evd_cpair(jnp.asarray(an.real, jnp.float32),
                                         jnp.asarray(an.imag, jnp.float32))
    assert bool(info.converged)
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    v = np.asarray(vr, np.float64) + 1j * np.asarray(vi, np.float64)
    resid = np.linalg.norm(an @ v - v * w[None, :])
    assert resid < 2e-3 * np.linalg.norm(an)
