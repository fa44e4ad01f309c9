"""Kernel-layer tests: matmul front door, triangular matmul, TRSM, TRTRI.

Mirrors faer's in-crate property tests (SURVEY §4): seeded random matrices,
size sweeps, dtype sweeps, conj/transpose variants, abs+rel tolerance rule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import faer_tpu as ft
from faer_tpu import stats
from faer_tpu.core.flags import Accum, BlockStructure, Conj
from faer_tpu.ops import matmul, rank_update, triangular_matmul
from faer_tpu.ops.triangular import (
    invert_lower_triangular,
    invert_upper_triangular,
)
from faer_tpu.ops import triangular_solve as ts
from faer_tpu.utils.approx import assert_approx_eq, size_scale

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]
SIZES = [(3, 4, 5), (16, 16, 16), (50, 33, 41), (128, 64, 200)]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("m,k,n", SIZES)
def test_matmul_against_numpy(dtype, m, k, n):
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    a = stats.standard_normal_mat(k1, m, k, dtype)
    b = stats.standard_normal_mat(k2, k, n, dtype)
    got = matmul(None, a, b)
    want = np.asarray(a) @ np.asarray(b)
    assert_approx_eq(got, want, scale=size_scale(k))


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_matmul_flags(dtype):
    key = jax.random.key(1)
    k1, k2, k3 = jax.random.split(key, 3)
    a = stats.standard_normal_mat(k1, 20, 30, dtype)
    b = stats.standard_normal_mat(k2, 20, 25, dtype)
    acc = stats.standard_normal_mat(k3, 30, 25, dtype)
    got = matmul(acc, a, b, alpha=2.5, accum=Accum.ADD,
                 conj_lhs=Conj.YES, transpose_lhs=True)
    want = np.asarray(acc) + 2.5 * np.conj(np.asarray(a)).T @ np.asarray(b)
    assert_approx_eq(got, want, scale=size_scale(30))


def test_rank_update():
    key = jax.random.key(2)
    k1, k2, k3 = jax.random.split(key, 3)
    u = stats.standard_normal_mat(k1, 10, 1, jnp.complex128)[:, 0]
    v = stats.standard_normal_mat(k2, 12, 1, jnp.complex128)[:, 0]
    acc = stats.standard_normal_mat(k3, 10, 12, jnp.complex128)
    got = rank_update(acc, u, v, alpha=0.5)
    want = np.asarray(acc) + 0.5 * np.outer(np.asarray(u), np.conj(np.asarray(v)))
    assert_approx_eq(got, want, scale=size_scale(12))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex128])
@pytest.mark.parametrize(
    "lhs_s,rhs_s",
    [
        (BlockStructure.TRIANGULAR_LOWER, BlockStructure.RECTANGULAR),
        (BlockStructure.RECTANGULAR, BlockStructure.TRIANGULAR_UPPER),
        (BlockStructure.UNIT_TRIANGULAR_LOWER, BlockStructure.STRICT_TRIANGULAR_UPPER),
    ],
)
def test_triangular_matmul(dtype, lhs_s, rhs_s):
    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    n = 37
    a = stats.standard_normal_mat(k1, n, n, dtype)
    b = stats.standard_normal_mat(k2, n, n, dtype)

    def ref_structure(x, s):
        x = np.asarray(x)
        if s is BlockStructure.RECTANGULAR:
            return x
        tri = np.tril if s.is_lower else np.triu
        k = -1 if (s.is_strict or s.is_unit) else 0
        if s.is_upper:
            k = -k
        y = tri(x, k)
        if s.is_unit:
            y = y + np.eye(n)
        return y

    got = triangular_matmul(None, a, b, lhs_structure=lhs_s, rhs_structure=rhs_s)
    want = ref_structure(a, lhs_s) @ ref_structure(b, rhs_s)
    assert_approx_eq(got, want, scale=size_scale(n))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n", [1, 2, 7, 16, 64, 130, 257])
@pytest.mark.parametrize("unit", [False, True])
def test_triangular_inverse(dtype, n, unit):
    key = jax.random.key(4)
    # strongly diagonally dominant so cond(L) stays small: the check below is
    # an inverse-residual bound, which scales with cond(L)·eps (random *unit*
    # triangulars have exponentially large inverses, hence the 1/√n scaling)
    g = stats.standard_normal_mat(key, n, n, dtype) * (0.5 / np.sqrt(n))
    l = jnp.tril(g, -1) + (3.0 + jnp.abs(jnp.diagonal(g))) * jnp.eye(n, dtype=dtype)
    li = invert_lower_triangular(l, unit=unit)
    lref = np.tril(np.asarray(l), -1) + np.eye(n) if unit else np.asarray(jnp.tril(l))
    assert_approx_eq(np.asarray(li) @ lref, np.eye(n), scale=size_scale(n) * 4,
                     tol_dtype=dtype)

    u = jnp.triu(g, 1) + (3.0 + jnp.abs(jnp.diagonal(g))) * jnp.eye(n, dtype=dtype)
    ui = invert_upper_triangular(u, unit=unit)
    uref = np.triu(np.asarray(u), 1) + np.eye(n) if unit else np.asarray(jnp.triu(u))
    assert_approx_eq(np.asarray(ui) @ uref, np.eye(n), scale=size_scale(n) * 4,
                     tol_dtype=dtype)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("n,k", [(5, 3), (64, 16), (200, 50), (333, 8)])
def test_triangular_solve(dtype, n, k):
    key = jax.random.key(5)
    k1, k2 = jax.random.split(key)
    # keep cond(L) modest: solve residuals scale with cond (see TRTRI test)
    g = stats.standard_normal_mat(k1, n, n, dtype) * (2.0 / np.sqrt(n))
    b = stats.standard_normal_mat(k2, n, k, dtype)
    scale = size_scale(n) * 8

    l = jnp.tril(g) + 4.0 * jnp.eye(n, dtype=dtype)
    x = ts.solve_lower_triangular(l, b)
    assert_approx_eq(np.asarray(l) @ np.asarray(x), b, scale=scale)

    u = jnp.triu(g) + 4.0 * jnp.eye(n, dtype=dtype)
    x = ts.solve_upper_triangular(u, b)
    assert_approx_eq(np.asarray(u) @ np.asarray(x), b, scale=scale)

    # unit variants
    lu_ = jnp.tril(g, -1) * 0.1
    x = ts.solve_unit_lower_triangular(lu_, b)
    lref = np.asarray(lu_) * np.tri(n, n, -1) + np.eye(n)
    assert_approx_eq(lref @ np.asarray(x), b, scale=scale, tol_dtype=dtype)

    # adjoint variant
    x = ts.solve_lower_triangular_adjoint(l, b)
    assert_approx_eq(np.conj(np.asarray(jnp.tril(l))).T @ np.asarray(x), b, scale=scale)

    # right-side variant: X L = B with B (k, n)
    bt = b.T
    x = ts.solve_lower_triangular_on_right(l, bt)
    assert_approx_eq(np.asarray(x) @ np.asarray(jnp.tril(l)), bt, scale=scale)


def test_matmul_jit_and_mat_facade():
    key = jax.random.key(6)
    a = ft.Mat(stats.standard_normal_mat(key, 12, 12, jnp.float64))

    @jax.jit
    def f(m: ft.Mat):
        return (m @ m.T + 2.0 * m).norm_l2()

    v = f(a)
    an = np.asarray(a.a)
    want = np.linalg.norm(an @ an.T + 2.0 * an)
    assert_approx_eq(v, want, scale=size_scale(12))
