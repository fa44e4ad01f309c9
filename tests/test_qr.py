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
