"""Real double-shift QZ tests (faer ``qz_real/mod.rs:1508`` parity).

Covers: residuals/orthogonality on random pencils, quasi-triangular
structure, (alpha, beta) parity against scipy, singular-B infinite
eigenvalues, and the front-door dispatch (qz() routes real dtypes here).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu.linalg import qz as fqz
from faer_tpu.linalg.qz_real import qz_eigenvalues_pair, real_qz


def _match_eigs(got, ref):
    """Greedy nearest matching (sort_complex mispairs conjugates whose real
    parts differ in the last ulp)."""
    got = list(got)
    worst = 0.0
    for r in ref:
        i = int(np.argmin([abs(g - r) for g in got]))
        worst = max(worst, abs(got.pop(i) - r))
    return worst


def _check_pencil(a, b, tol):
    s, t, q, z, info = real_qz(jnp.asarray(a), jnp.asarray(b))
    assert bool(np.asarray(info.converged))
    s, t, q, z = map(lambda x: np.asarray(x, np.float64), (s, t, q, z))
    n = len(a)
    scale = max(np.abs(a).max(), np.abs(b).max(), 1.0)
    assert np.abs(a - q @ s @ z.T).max() < tol * scale
    assert np.abs(b - q @ t @ z.T).max() < tol * scale
    assert np.abs(q.T @ q - np.eye(n)).max() < tol
    assert np.abs(z.T @ z - np.eye(n)).max() < tol
    assert np.abs(np.tril(t, -1)).max() == 0          # T strictly triangular
    # S quasi-triangular: no two consecutive subdiagonal entries
    sd = np.diag(s, -1) != 0
    assert not np.any(sd[:-1] & sd[1:])
    assert np.abs(np.tril(s, -2)).max() == 0
    return s, t


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-5), (jnp.float64, 1e-12)])
@pytest.mark.parametrize("n", [4, 16, 48])
def test_real_qz_random(dtype, n, tol):
    import scipy.linalg as sla

    k1, k2 = jax.random.split(jax.random.key(70 + n))
    a = np.asarray(stats.standard_normal_mat(k1, n, n, dtype), np.float64)
    b = np.asarray(stats.standard_normal_mat(k2, n, n, dtype), np.float64)
    s, t = _check_pencil(a.astype(np.dtype(dtype)), b.astype(np.dtype(dtype)),
                         tol * n)
    ar, ai, be = map(np.asarray, qz_eigenvalues_pair(
        jnp.asarray(s, dtype), jnp.asarray(t, dtype)))
    lam = (ar + 1j * ai) / be
    lref = sla.eigvals(a, b)
    dl = _match_eigs(lam, lref)
    assert dl < tol * n * max(1.0, np.abs(lref).max())


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_real_qz_singular_b_infinite_eigenvalues(dtype):
    rng = np.random.default_rng(5)
    n = 12
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    b[:, 3] = 0                                        # rank n-1
    tol = 5e-5 if dtype == jnp.float32 else 1e-12
    s, t = _check_pencil(jnp.asarray(a, dtype), jnp.asarray(b, dtype), tol * n)
    ar, ai, be = map(np.asarray, qz_eigenvalues_pair(
        jnp.asarray(s, dtype), jnp.asarray(t, dtype)))
    n_inf = int(np.sum(be == 0))
    assert n_inf == 1                                  # exactly one infinite
    # finite eigenvalues still match scipy
    import scipy.linalg as sla
    lref = sla.eigvals(a, b)
    lref_fin = np.sort_complex(lref[np.isfinite(lref)])
    lam = (ar + 1j * ai)[be != 0] / be[be != 0]
    assert len(lam) == len(lref_fin)
    assert _match_eigs(lam, lref_fin) < tol * n * max(
        1.0, np.abs(lref_fin).max())


def test_qz_front_door_real_dispatch():
    n = 10
    k1, k2 = jax.random.split(jax.random.key(81))
    a = stats.standard_normal_mat(k1, n, n, jnp.float32)
    b = stats.standard_normal_mat(k2, n, n, jnp.float32)
    s, t, q, z, info = fqz.qz(a, b)
    assert s.dtype == jnp.float32                      # stayed real
    an = np.asarray(a, np.float64)
    rec = np.asarray(q, np.float64) @ np.asarray(s, np.float64) @ np.asarray(z, np.float64).T
    assert np.abs(rec - an).max() < 1e-4


def test_real_gevd_eigenvectors():
    """gevd_qz on real pencils: real QZ + the generalized quasi-triangular
    eigenvector scan — no complexification (VERDICT r2 #6 follow-through).
    Columnwise A v β = B v α, incl. a singular-B (infinite eigenvalue) case."""
    from faer_tpu.linalg.qz import gevd_qz

    rng = np.random.default_rng(5)
    n = 48
    a = jnp.asarray(rng.standard_normal((n, n)))
    b = jnp.asarray(rng.standard_normal((n, n)))
    al, be, v, info = gevd_qz(a, b)
    al, be, v = np.asarray(al), np.asarray(be), np.asarray(v)
    an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
    res = np.abs(an @ v * be[None, :] - bn @ v * al[None, :]).max()
    assert res < 1e-10 * max(np.abs(an).max(), np.abs(bn).max()) * n, res
    import scipy.linalg as sla

    wref = sla.eigvals(an, bn)
    w = al / be
    err = max(np.abs(wref - w[np.argmin(np.abs(w - x))]).min() for x in wref)
    assert err < 1e-10, err

    bs = rng.standard_normal((n, n))
    bs[:, 0] = 0
    bs[0] = 0
    al, be, v, info = gevd_qz(a, jnp.asarray(bs))
    al, be, v = np.asarray(al), np.asarray(be), np.asarray(v)
    res = np.abs(an @ v * be[None, :] - np.asarray(bs) @ v * al[None, :]).max()
    assert res < 1e-9, res
    assert (np.abs(be) < 1e-12).sum() >= 1     # infinite eigenvalue surfaced
