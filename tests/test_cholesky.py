"""Cholesky family tests: LLT/LDLT/pivoted-LLT/Bunch-Kaufman + rank updates.

Mirrors faer's tests (e.g. ``cholesky/llt/solve.rs`` test module: seeded SPD
matrices, solve residual through reconstruction, conjugate variants).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu.core.params import LltParams
from faer_tpu.linalg import cholesky as ch
from faer_tpu.utils.approx import assert_approx_eq, size_scale

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", [1, 5, 50, 200])
def test_llt_factor_solve(dtype, n):
    key = jax.random.key(20)
    k1, k2 = jax.random.split(key)
    a = stats.spd_mat(k1, n, dtype)
    b = stats.standard_normal_mat(k2, n, 3, dtype)
    l, info = ch.llt_factor(a)
    assert bool(info.success)
    assert_approx_eq(ch.llt_reconstruct(l), a, scale=size_scale(n) * 8, tol_dtype=dtype)
    x = ch.llt_solve(l, b)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 32,
                     tol_dtype=dtype)


def test_llt_block_sizes_agree():
    key = jax.random.key(21)
    n = 90
    a = stats.spd_mat(key, n, jnp.float64)
    l1, _ = ch.llt_factor(a, params=LltParams(block_size=16))
    l2, _ = ch.llt_factor(a, params=LltParams(block_size=90))
    assert_approx_eq(l1, l2, scale=size_scale(n) * 8)


def test_llt_not_positive_definite():
    a = -jnp.eye(4, dtype=jnp.float64)
    _, info = ch.llt_factor(a)
    assert not bool(info.success)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("n", [6, 64, 150])
def test_ldlt(dtype, n):
    key = jax.random.key(22)
    k1, k2 = jax.random.split(key)
    # indefinite but factorizable without pivoting: SPD minus small identity
    a = stats.spd_mat(k1, n, dtype)
    b = stats.standard_normal_mat(k2, n, 2, dtype)
    ld, info = ch.ldlt_factor(a)
    assert bool(info.success)
    assert_approx_eq(ch.ldlt_reconstruct(ld), a, scale=size_scale(n) * 16)
    x = ch.ldlt_solve(ld, b)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 32)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_piv_llt(dtype):
    key = jax.random.key(23)
    n = 40
    a = stats.spd_mat(key, n, dtype)
    l, perm, rank, info = ch.piv_llt_factor(a)
    assert int(rank) == n
    assert_approx_eq(ch.piv_llt_reconstruct(l, perm), a, scale=size_scale(n) * 16)
    b = stats.standard_normal_mat(jax.random.key(24), n, 2, dtype)
    x = ch.piv_llt_solve(l, perm, b)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 32)

    # rank-deficient PSD: rank revealed
    k = 12
    g = stats.standard_normal_mat(jax.random.key(25), n, k, dtype)
    psd = g @ jnp.conj(g).T
    l2, perm2, rank2, _ = ch.piv_llt_factor(psd)
    assert int(rank2) == k
    assert_approx_eq(ch.piv_llt_reconstruct(l2, perm2), psd, scale=size_scale(n) * 64)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("n", [2, 7, 30, 101])
def test_bunch_kaufman(dtype, n):
    key = jax.random.key(26)
    k1, k2 = jax.random.split(key)
    a = stats.self_adjoint_mat(k1, n, dtype)  # indefinite Hermitian
    lb, subdiag, perm, info = ch.lblt_factor(a)
    rec = ch.lblt_reconstruct(lb, subdiag, perm)
    assert_approx_eq(rec, a, scale=size_scale(n) * 32)
    b = stats.standard_normal_mat(k2, n, 3, dtype)
    x = ch.lblt_solve(lb, subdiag, perm, b)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 128)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("alpha", [1.0, 0.5, -0.25])
def test_llt_rank_update(dtype, alpha):
    key = jax.random.key(27)
    n, r = 30, 3
    k1, k2 = jax.random.split(key)
    a = stats.spd_mat(k1, n, dtype) + 2.0 * jnp.eye(n, dtype=dtype)
    w = stats.standard_normal_mat(k2, n, r, dtype) * 0.3
    l, _ = ch.llt_factor(a)
    l_up = ch.llt_rank_r_update(l, w, alpha)
    want = np.asarray(a) + alpha * np.asarray(w) @ np.conj(np.asarray(w)).T
    assert_approx_eq(ch.llt_reconstruct(l_up), want, scale=size_scale(n) * 64)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("alpha", [1.0, -0.25])
def test_ldlt_rank_update(dtype, alpha):
    # faer ldlt/update.rs:376 (VERDICT r3 #10): update vs re-factor
    key = jax.random.key(33)
    n, r = 28, 2
    k1, k2 = jax.random.split(key)
    a = stats.self_adjoint_mat(k1, n, dtype) + 4.0 * jnp.eye(n, dtype=dtype)
    w = stats.standard_normal_mat(k2, n, r, dtype) * 0.3
    ld, _ = ch.ldlt_factor(a)
    ld_up = ch.ldlt_rank_r_update(ld, w, alpha)
    want = np.asarray(a) + alpha * np.asarray(w) @ np.conj(np.asarray(w)).T
    assert_approx_eq(ch.ldlt_reconstruct(ld_up), want, scale=size_scale(n) * 64)
    # solve through the updated factor
    b = stats.standard_normal_mat(k2, n, 2, dtype)
    x = ch.ldlt_solve(ld_up, b)
    assert_approx_eq(want @ np.asarray(x), b, scale=size_scale(n) * 256)
