"""Matrix-free layer tests: LinOp, CG, BiCGSTAB, LSMR, Krylov-Schur."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu import matrix_free as mf
from faer_tpu.utils.approx import assert_approx_eq, size_scale

DTYPES = [jnp.float64, jnp.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
def test_cg(dtype):
    n = 60
    k1, k2 = jax.random.split(jax.random.key(70))
    a = stats.spd_mat(k1, n, dtype)
    b = stats.standard_normal_mat(k2, n, 2, dtype)
    x, info = mf.conjugate_gradient(a, b)
    assert bool(info.converged)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 512)

    # vector rhs + diag preconditioner
    pre = mf.DiagLinOp(jnp.real(jnp.diagonal(a)).astype(dtype))
    xv, info2 = mf.conjugate_gradient(a, b[:, 0], precond=pre)
    assert bool(info2.converged)
    assert xv.ndim == 1


@pytest.mark.parametrize("dtype", DTYPES)
def test_bicgstab(dtype):
    n = 50
    k1, k2 = jax.random.split(jax.random.key(71))
    a = stats.standard_normal_mat(k1, n, n, dtype) + 5.0 * jnp.eye(n, dtype=dtype)
    b = stats.standard_normal_mat(k2, n, 2, dtype)
    x, info = mf.bicgstab(a, b)
    assert bool(info.converged)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 1024)


@pytest.mark.parametrize("dtype", [jnp.float64])
def test_lsmr(dtype):
    m, n = 80, 30
    k1, k2 = jax.random.split(jax.random.key(72))
    a = stats.standard_normal_mat(k1, m, n, dtype)
    b = stats.standard_normal_mat(k2, m, 1, dtype)[:, 0]
    x, info = mf.lsmr(a, b)
    want, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    assert_approx_eq(x, want, scale=size_scale(m) * 4096)

    # matrix-free operator form
    fn = mf.FnLinOp(lambda v: a @ v, (m, n), adjoint=lambda v: a.T @ v)
    x2, _ = mf.lsmr(fn, b)
    assert_approx_eq(x2, want, scale=size_scale(m) * 4096)


@pytest.mark.parametrize("dtype", DTYPES)
def test_partial_self_adjoint_eigen(dtype):
    n, k = 80, 4
    a = stats.self_adjoint_mat(jax.random.key(73), n, dtype)
    w, v, info = mf.partial_self_adjoint_eigen(a, k)
    an, vn, wn = np.asarray(a), np.asarray(v), np.asarray(w)
    wref = np.linalg.eigvalsh(an)
    top = wref[np.argsort(-np.abs(wref))][:k]
    assert_approx_eq(np.sort(wn), np.sort(top), scale=size_scale(n) * 256)
    resid = np.abs(an @ vn - vn * wn[None, :]).max()
    assert resid < 1e-8 * max(1, np.abs(wn).max())


def test_partial_eigen_general():
    n, k = 60, 3
    a = stats.standard_normal_mat(jax.random.key(74), n, n, jnp.float64)
    w, v, info = mf.partial_eigen(a, k)
    an, vn, wn = np.asarray(a), np.asarray(v), np.asarray(w)
    resid = np.abs(an @ vn - vn * wn[None, :]).max()
    assert resid < 1e-7 * max(1, np.abs(wn).max()), resid
    wref = np.linalg.eigvals(an)
    top = wref[np.argsort(-np.abs(wref))][:k]
    assert np.abs(np.sort_complex(top) - np.sort_complex(wn)).max() < 1e-7


def test_partial_svd():
    m, n, k = 70, 40, 3
    a = stats.standard_normal_mat(jax.random.key(75), m, n, jnp.float64)
    s, u, v, info = mf.partial_svd(a, k)
    sref = np.linalg.svd(np.asarray(a), compute_uv=False)[:k]
    assert_approx_eq(np.sort(np.asarray(s)), np.sort(sref), scale=size_scale(m) * 1024)
    # A v = s u
    assert np.abs(np.asarray(a) @ np.asarray(v) - np.asarray(u) * np.asarray(s)[None, :]).max() < 1e-8


@pytest.mark.parametrize("n,k", [(60, 4), (150, 6)])
def test_partial_eigen_pair_real_path(n, k):
    # TPU-native real Krylov-Schur: real arithmetic end to end, conjugate
    # pairs as adjacent (re, im) entries; the restart drops a pair that
    # straddles the compression cut (its half-span is not H-invariant)
    from faer_tpu.matrix_free.eigen import partial_eigen_pair

    rng = np.random.default_rng(n)
    an = rng.standard_normal((n, n))
    a = jnp.asarray(an, jnp.float32)
    (wr, wi), (vr, vi), info = partial_eigen_pair(a, k)
    assert int(info.n_converged) == k
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    v = np.asarray(vr, np.float64) + 1j * np.asarray(vi, np.float64)
    wref = np.linalg.eigvals(an)
    top = wref[np.argsort(-np.abs(wref))][:k]
    assert np.max(np.abs(np.sort_complex(w) - np.sort_complex(top))) < 1e-4 * np.max(
        np.abs(top))
    assert np.linalg.norm(an @ v - v * w[None, :]) < 1e-4 * np.linalg.norm(an)


def test_partial_svd_no_condition_squaring():
    """VERDICT r2 #8 done-criterion: the GKL (Jordan-Wielandt) path recovers
    clustered small singular values at f32 that the old A^T A normal-equations
    operator loses (sigma^2 below eps*sigma_max^2 is invisible after
    squaring)."""
    m, n, k = 90, 60, 4
    rng = np.random.default_rng(11)
    sv = np.zeros(n)
    sv[:k] = [1.0, 3e-4, 2.5e-4, 2e-4]   # kappa(top-k) ~ 5e3, sigma^2 ~ 6e-8
    sv[k:] = 1e-5
    qu, _ = np.linalg.qr(rng.standard_normal((m, n)))
    qv, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = jnp.asarray((qu * sv) @ qv.T, jnp.float32)
    s, u, v, info = mf.partial_svd(a, k, tol=1e-6, max_restarts=4000)
    s = np.sort(np.asarray(s, np.float64))[::-1]
    want = np.sort(sv)[::-1][:k]
    # absolute accuracy ~ eps*sigma_max, NOT sqrt(eps)*sigma_max (~2.4e-4,
    # the normal-equations floor that would swamp the 2e-4 cluster)
    assert np.abs(s - want).max() < 3e-5, s
    # triplet consistency: A v ~= s u for every returned triplet
    res = np.abs(np.asarray(a, np.float64) @ np.asarray(v, np.float64)
                 - np.asarray(u, np.float64) * s[None, :]).max()
    assert res < 5e-5, res


def test_partial_eigen_cpair_complex_path():
    # split-pair complex Krylov-Schur (faer partial_schur_cplx_imp): the
    # whole restart loop runs over (re, im) pairs on the TPU runtime
    from faer_tpu.matrix_free.eigen import partial_eigen_cpair

    n, k = 60, 3
    rng = np.random.default_rng(60)
    an = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    (wr, wi), (vr, vi), info = partial_eigen_cpair(
        (jnp.asarray(an.real, jnp.float64), jnp.asarray(an.imag, jnp.float64)),
        k)
    assert int(info.n_converged) == k
    w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    v = np.asarray(vr, np.float64) + 1j * np.asarray(vi, np.float64)
    wref = np.linalg.eigvals(an)
    top = wref[np.argsort(-np.abs(wref))][:k]
    assert np.abs(np.sort_complex(w) - np.sort_complex(top)).max() < 1e-7 * np.abs(
        top).max()
    assert np.linalg.norm(an @ v - v * w[None, :]) < 1e-7 * np.linalg.norm(an)

    # the public front door routes complex dense input through the pair path
    wc, vc, info2 = mf.partial_eigen(jnp.asarray(an), k)
    assert np.abs(np.sort_complex(np.asarray(wc)) - np.sort_complex(top)
                  ).max() < 1e-7 * np.abs(top).max()


def test_krylov_schur_locking_deflates_converged_prefix():
    # converged leading Ritz columns get their residual spike zeroed (locked
    # out of the active basis); a converged column BEHIND an unconverged one
    # must not lock
    from faer_tpu.matrix_free.eigen import _prefix_lock

    spike = (jnp.asarray([1.0, 2.0, 3.0, 4.0]),
             jnp.asarray([-1.0, -2.0, -3.0, -4.0]))
    conv = jnp.asarray([True, True, False, True])
    (sr, si), prefix = _prefix_lock(spike, conv)
    np.testing.assert_array_equal(np.asarray(prefix), [True, True, False, False])
    np.testing.assert_array_equal(np.asarray(sr), [0.0, 0.0, 3.0, 4.0])
    np.testing.assert_array_equal(np.asarray(si), [0.0, 0.0, -3.0, -4.0])


def test_krylov_schur_locked_pairs_stay_converged():
    # once the top-k eigenpairs converge, extra restarts with locking keep
    # them converged and accurate (deflation does not let them drift)
    from faer_tpu.matrix_free.eigen import partial_eigen_cpair

    n, k = 48, 2
    rng = np.random.default_rng(7)
    # well-separated dominant eigenvalues -> fast convergence of the top pair
    d = np.diag(np.concatenate([[9.0, 7.0], rng.uniform(0.1, 1.0, n - 2)])
                ).astype(np.complex128)
    q, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    an = q @ d @ q.conj().T
    (wr, wi), (vr, vi), info = partial_eigen_cpair(
        (jnp.asarray(an.real, jnp.float64), jnp.asarray(an.imag, jnp.float64)),
        k, max_restarts=200)
    assert int(info.n_converged) == k
    w = np.sort(np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64))
    assert np.abs(np.sort(w.real) - np.array([7.0, 9.0])).max() < 1e-8
