"""QR tests: blocked Householder ± column pivoting, lstsq, Q properties."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu.core.params import QrParams
from faer_tpu.linalg import qr
from faer_tpu.utils.approx import assert_approx_eq, size_scale

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("m,n", [(5, 5), (64, 64), (130, 60), (60, 100)])
def test_qr_reconstruct(dtype, m, n):
    key = jax.random.key(30)
    a = stats.standard_normal_mat(key, m, n, dtype)
    packed, ts, block = qr.qr_in_place(a)
    rec = qr.qr_reconstruct(packed, ts, block)
    assert_approx_eq(rec, a, scale=size_scale(max(m, n)) * 8, tol_dtype=dtype)
    # R upper triangular with real diagonal sign convention applied by faer? —
    # we only require upper-triangularity of the packed R part
    r = np.triu(np.asarray(packed))[: min(m, n), :]
    assert np.all(np.tril(r, -1) == 0)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("m,n", [(40, 40), (100, 30)])
def test_qr_q_unitary(dtype, m, n):
    key = jax.random.key(31)
    a = stats.standard_normal_mat(key, m, n, dtype)
    packed, ts, block = qr.qr_in_place(a)
    q = qr.qr_compute_q(packed, ts, block, thin=True)
    qhq = np.conj(np.asarray(q)).T @ np.asarray(q)
    assert_approx_eq(qhq, np.eye(min(m, n)), scale=size_scale(m) * 8)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_qr_lstsq(dtype):
    key = jax.random.key(32)
    m, n = 80, 30
    k1, k2 = jax.random.split(key)
    a = stats.standard_normal_mat(k1, m, n, dtype)
    b = stats.standard_normal_mat(k2, m, 2, dtype)
    packed, ts, block = qr.qr_in_place(a)
    x = qr.qr_solve_lstsq(packed, ts, block, b)
    want, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    assert_approx_eq(x, want, scale=size_scale(m) * 64)


def test_qr_block_sizes_agree():
    key = jax.random.key(33)
    a = stats.standard_normal_mat(key, 70, 50, jnp.float64)
    p1, t1, b1 = qr.qr_in_place(a, QrParams(block_size=8))
    p2, t2, b2 = qr.qr_in_place(a, QrParams(block_size=50))
    assert_approx_eq(p1, p2, scale=size_scale(70) * 8)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("m,n", [(30, 30), (60, 25)])
def test_col_piv_qr(dtype, m, n):
    key = jax.random.key(34)
    a = stats.standard_normal_mat(key, m, n, dtype)
    packed, taus, perm = qr.col_piv_qr_in_place(a)
    rec = qr.col_piv_qr_reconstruct(packed, taus, perm)
    assert_approx_eq(rec, a, scale=size_scale(max(m, n)) * 16)
    # rank-revealing: |diag(R)| non-increasing
    d = np.abs(np.diag(np.asarray(packed)[: min(m, n), : min(m, n)]))
    assert np.all(d[:-1] >= d[1:] - 1e-6 * d[0])

    b = stats.standard_normal_mat(jax.random.key(35), m, 2, dtype)
    x = qr.col_piv_qr_solve_lstsq(packed, taus, perm, b)
    want, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    assert_approx_eq(x, want, scale=size_scale(m) * 128)


class TestCholQrPanel:
    """The CholeskyQR2 + Householder-reconstruction panel (TPU fast path) —
    exercised directly here since the dispatch gate is TPU-only."""

    def _check(self, panel, expect_ok=True):
        from faer_tpu.ops.householder import form_block_t
        m, b = panel.shape
        packed, taus, ok = qr._panel_qr_cholqr(panel)
        assert bool(ok) == expect_ok
        if not expect_ok:
            return
        v = qr._extract_v(packed, b)
        t = form_block_t(v, taus)
        r = np.triu(np.asarray(packed))[:b]
        # A = (I - V T V^T) [R; 0]
        rfull = np.zeros((m, b), np.float32)
        rfull[:b] = r
        h_rfull = np.asarray(packed, dtype=np.float64) * 0  # placeholder shape
        vn = np.asarray(v, np.float64)
        tn = np.asarray(t, np.float64)
        rec = rfull - vn @ (tn @ (vn.T @ rfull))
        a = np.asarray(panel, np.float64)
        assert np.abs(rec - a).max() <= 1e-4 * np.abs(a).max() * np.sqrt(m)
        # Q orthonormality through the reflector form
        q = np.eye(m, b) - vn @ (tn @ vn[:b].T @ np.eye(b))
        assert np.abs(q.T @ q - np.eye(b)).max() < 1e-4 * np.sqrt(m)

    def test_tall_panel(self):
        key = jax.random.key(7)
        self._check(stats.standard_normal_mat(key, 700, 96, jnp.float32))

    def test_square_panel(self):
        key = jax.random.key(8)
        self._check(stats.standard_normal_mat(key, 512, 512, jnp.float32))

    def test_ill_conditioned_falls_back(self):
        # kappa ~ 1e8 >> eps^-1/2: chol(G) must fail and signal fallback
        key = jax.random.key(9)
        a = np.asarray(stats.standard_normal_mat(key, 600, 64, jnp.float32),
                       np.float64)
        u, _, vt = np.linalg.svd(a, full_matrices=False)
        sv = np.logspace(0, -8, 64)
        bad = jnp.asarray((u * sv) @ vt, jnp.float32)
        self._check(bad, expect_ok=False)

    def test_blocked_qr_dispatch_matches_classic(self):
        # full qr_in_place equality is not required (signs may differ);
        # reconstruct must agree with the input either way
        key = jax.random.key(10)
        a = stats.standard_normal_mat(key, 640, 640, jnp.float32)
        packed, ts, block = qr.qr_in_place(a)
        rec = qr.qr_reconstruct(packed, ts, block)
        assert_approx_eq(rec, a, scale=size_scale(640) * 8, tol_dtype=jnp.float32)
