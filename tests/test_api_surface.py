"""API-surface tests: Mat/Col/Row/Diag sugar, perm, zip/kron, solver objects."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import faer_tpu as ft
from faer_tpu import stats
from faer_tpu.core import perm as permod
from faer_tpu.ops import zip as fzip
from faer_tpu.utils.approx import assert_approx_eq, size_scale


def test_mat_constructors_and_ops():
    m = ft.Mat.from_fn(3, 4, lambda i, j: i * 10 + j, jnp.float64)
    assert float(m[2, 3]) == 23
    assert ft.Mat.identity(3, 3).trace() == 3
    a = ft.Mat(jnp.arange(6.0).reshape(2, 3))
    assert (a.T).shape == (3, 2)
    s = ft.Scale(2.0) * a
    np.testing.assert_allclose(np.asarray(s.a), 2 * np.asarray(a.a))
    np.testing.assert_allclose(np.asarray((a + a - a).a), np.asarray(a.a))
    np.testing.assert_allclose(np.asarray((a / 2.0).a), np.asarray(a.a) / 2)
    b = a.at_set((0, 0), 99.0)
    assert float(b[0, 0]) == 99 and float(a[0, 0]) == 0


def test_mat_solve_and_inverse():
    a = ft.Mat(stats.standard_normal_mat(jax.random.key(90), 16, 16, jnp.float64))
    b = stats.standard_normal_mat(jax.random.key(91), 16, 2, jnp.float64)
    x = a.solve(b)
    assert_approx_eq(np.asarray(a.a) @ np.asarray(x), b, scale=size_scale(16) * 32)
    inv = a.inverse()
    assert_approx_eq(np.asarray(inv.a) @ np.asarray(a.a), np.eye(16),
                     scale=size_scale(16) * 32)
    det = a.determinant()
    assert_approx_eq(det, np.linalg.det(np.asarray(a.a)), scale=size_scale(16) * 16)


def test_col_row_diag():
    c = ft.Col(jnp.asarray([1.0, 2.0, 3.0]))
    r = c.T
    assert float(r @ c) == 14.0
    assert c.as_mat().shape == (3, 1)
    d = ft.Diag(jnp.asarray([2.0, 4.0]))
    y = d @ jnp.eye(2)
    np.testing.assert_allclose(np.asarray(y.a), np.diag([2.0, 4.0]))
    np.testing.assert_allclose(np.asarray(d.inverse().a), [0.5, 0.25])
    assert float(c.norm_l2()) == pytest.approx(np.sqrt(14.0))


def test_perm_module():
    p = jnp.asarray([2, 0, 1], jnp.int32)
    a = jnp.arange(9.0).reshape(3, 3)
    pr = permod.permute_rows(a, p)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(a)[[2, 0, 1]])
    ip = permod.invert_perm(p)
    np.testing.assert_allclose(np.asarray(permod.permute_rows(pr, ip)), np.asarray(a))
    pm = permod.perm_to_matrix(p, jnp.float64)
    np.testing.assert_allclose(np.asarray(pm @ a), np.asarray(pr))
    sw = permod.swap_rows(a, 0, 2)
    np.testing.assert_allclose(np.asarray(sw)[0], np.asarray(a)[2])
    # LAPACK ipiv folding
    swaps = jnp.asarray([1, 1, 2], jnp.int32)
    perm = permod.swaps_to_perm(swaps)
    ref = np.arange(3)
    for i, j in enumerate([1, 1, 2]):
        ref[[i, j]] = ref[[j, i]]
    np.testing.assert_array_equal(np.asarray(perm), ref)


def test_zip_helpers():
    a = jnp.arange(16.0).reshape(4, 4)
    lower_doubled = fzip.cwise_triangular_lower(lambda x: 2 * x, a)
    an = np.asarray(a)
    want = np.where(np.tri(4, 4) != 0, 2 * an, an)
    np.testing.assert_allclose(np.asarray(lower_doubled), want)
    sym = fzip.make_self_adjoint(a)
    np.testing.assert_allclose(np.asarray(sym), np.tril(an) + np.tril(an, -1).T)
    k = fzip.kron(jnp.eye(2), a[:2, :2])
    assert k.shape == (4, 4)
    idxsum = fzip.cwise_with_index(lambda i, j, x: (i + j).astype(x.dtype), a)
    assert float(idxsum[3, 3]) == 6.0


def test_solver_object_extras():
    key = jax.random.key(92)
    a = ft.Mat(stats.spd_mat(key, 12, jnp.float64))
    llt = a.llt()
    logdet = llt.logdet()
    assert_approx_eq(logdet, np.linalg.slogdet(np.asarray(a.a))[1], scale=512)
    # rank update keeps factor valid
    w = stats.standard_normal_mat(jax.random.key(93), 12, 1, jnp.float64) * 0.2
    llt2 = llt.rank_update(w, 1.0)
    want = np.asarray(a.a) + np.asarray(w) @ np.asarray(w).T
    assert_approx_eq(np.asarray(llt2.reconstruct()), want, scale=size_scale(12) * 64)

    g = ft.Mat(stats.standard_normal_mat(jax.random.key(94), 10, 10, jnp.float64))
    flu = g.full_piv_lu()
    assert int(flu.rank()) == 10
    assert_approx_eq(flu.determinant(), np.linalg.det(np.asarray(g.a)),
                     scale=size_scale(10) * 64)

    qr_obj = g.qr()
    assert_approx_eq(np.asarray(qr_obj.inverse()) @ np.asarray(g.a), np.eye(10),
                     scale=size_scale(10) * 64)
    r = qr_obj.R
    assert np.allclose(np.tril(np.asarray(r), -1), 0)

    cpqr = g.col_piv_qr()
    assert int(cpqr.rank()) == 10

    piv = a.piv_llt()
    assert_approx_eq(piv.reconstruct(), np.asarray(a.a), scale=size_scale(12) * 64)


def test_triangular_matmul_dst_structure():
    from faer_tpu.core.flags import BlockStructure
    from faer_tpu.ops import triangular_matmul

    a = stats.standard_normal_mat(jax.random.key(95), 8, 8, jnp.float64)
    b = stats.standard_normal_mat(jax.random.key(96), 8, 8, jnp.float64)
    out = triangular_matmul(None, a, b, dst_structure=BlockStructure.TRIANGULAR_LOWER)
    full = np.asarray(a) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), np.tril(full), atol=1e-12)


def test_reductions_and_norms():
    from faer_tpu.ops import reductions as red

    x = jnp.asarray([[3.0, -4.0], [0.0, 12.0]])
    assert float(red.norm_l1(x)) == 19.0
    assert float(red.norm_max(x)) == 12.0
    assert float(red.norm_l2(x)) == pytest.approx(13.0)
    # overflow safety
    big = jnp.asarray([1e30, 1e30])
    assert np.isfinite(float(red.norm_l2(big)))
    sign, logdet = red.log_abs_det_diag(jnp.diag(jnp.asarray([2.0, -3.0])))
    assert float(sign) == -1.0
    assert float(logdet) == pytest.approx(np.log(6.0))
