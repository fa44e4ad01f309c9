"""Complex multishift QZ + AED over (re, im) pairs.

Reference parity: faer ``gevd/qz_cplx/mod.rs:1140`` (multishift Moler–Stewart
with deflation); oracle: scipy generalized eigenvalues, plus the algebraic
invariants A = Q S Zᴴ, B = Q T Zᴴ with S, T triangular and Q, Z unitary.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg.qz_cpair import hessenberg_triangular_pair, qz_pair
from faer_tpu.linalg.qz_multishift_cpair import multishift_qz_pair


def _topair(m, dtype):
    return (jnp.asarray(m.real, dtype), jnp.asarray(m.imag, dtype))


def _tonp(p):
    return np.asarray(p[0], np.float64) + 1j * np.asarray(p[1], np.float64)


@pytest.mark.parametrize("n,ns,w", [(96, 16, 24), (160, 16, 24)])
def test_multishift_qz_pair_random(n, ns, w):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    b = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h, r, q, z = hessenberg_triangular_pair(
        _topair(a, jnp.float64), _topair(b, jnp.float64))
    s_, t_, qo, zo, info = multishift_qz_pair(h, r, q, z, ns=ns, w=w)
    assert bool(info.converged)
    S, T, Q, Z = _tonp(s_), _tonp(t_), _tonp(qo), _tonp(zo)
    scale_a = np.abs(a).max()
    scale_b = np.abs(b).max()
    assert np.abs(Q @ S @ Z.conj().T - a).max() < 1e-11 * n * scale_a
    assert np.abs(Q @ T @ Z.conj().T - b).max() < 1e-11 * n * scale_b
    assert np.abs(Q.conj().T @ Q - np.eye(n)).max() < 1e-12 * n
    assert np.abs(Z.conj().T @ Z - np.eye(n)).max() < 1e-12 * n
    assert np.abs(np.tril(S, -1)).max() == 0.0
    assert np.abs(np.tril(T, -1)).max() == 0.0

    import scipy.linalg as sla

    ev_ref = np.sort_complex(sla.eigvals(a, b))
    ev = np.sort_complex(np.diag(S) / np.diag(T))
    assert np.abs(ev - ev_ref).max() < 1e-9 * max(1.0, np.abs(ev_ref).max())


def test_qz_pair_routes_multishift_f32():
    # the public qz_pair front door routes n >= 128 through multishift; f32
    # accuracy target is the faer test tolerance class (8n·eps)
    n = 160
    rng = np.random.default_rng(7)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    b = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    s_, t_, q, z, info = qz_pair(
        jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32),
        jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32))
    assert bool(info.converged)
    S, T, Q, Z = _tonp(s_), _tonp(t_), _tonp(q), _tonp(z)
    eps = np.finfo(np.float32).eps
    tol = 8 * n * eps
    assert np.abs(Q @ S @ Z.conj().T - a).max() < tol * np.abs(a).max()
    assert np.abs(Q @ T @ Z.conj().T - b).max() < tol * np.abs(b).max()
    assert np.abs(Q.conj().T @ Q - np.eye(n)).max() < tol
