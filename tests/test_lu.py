"""LU tests: partial + full pivoting, solve/inverse/reconstruct/determinant.

Mirrors faer's property tests (reconstruction + solve residuals, size/dtype
sweeps, seeded RNG).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu.core.params import PartialPivLuParams
from faer_tpu.linalg import lu
from faer_tpu.utils.approx import assert_approx_eq, size_scale

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("m,n", [(4, 4), (33, 33), (100, 100), (150, 90), (90, 150)])
def test_partial_piv_lu_reconstruct(dtype, m, n):
    key = jax.random.key(10)
    a = stats.standard_normal_mat(key, m, n, dtype)
    packed, perm, info = lu.lu_in_place(a)
    rec = lu.lu_reconstruct(packed, perm)
    assert_approx_eq(rec, a, scale=size_scale(max(m, n)) * 4, tol_dtype=dtype)
    assert bool(info.success)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("n", [10, 64, 130])
def test_partial_piv_lu_solve(dtype, n):
    key = jax.random.key(11)
    k1, k2 = jax.random.split(key)
    a = stats.standard_normal_mat(k1, n, n, dtype)
    b = stats.standard_normal_mat(k2, n, 3, dtype)
    packed, perm, _ = lu.lu_in_place(a)
    x = lu.lu_solve(packed, perm, b)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 16)

    xt = lu.lu_solve_transpose(packed, perm, b)
    assert_approx_eq(np.asarray(a).T @ np.asarray(xt), b, scale=size_scale(n) * 16)

    inv = lu.lu_inverse(packed, perm)
    assert_approx_eq(np.asarray(inv) @ np.asarray(a), np.eye(n), scale=size_scale(n) * 16)


@pytest.mark.parametrize("dtype", [jnp.float64])
def test_lu_determinant(dtype):
    key = jax.random.key(12)
    n = 24
    a = stats.standard_normal_mat(key, n, n, dtype)
    packed, perm, info = lu.lu_in_place(a)
    det = lu.lu_determinant(packed, perm, info.transposition_count)
    want = np.linalg.det(np.asarray(a))
    assert_approx_eq(det, want, scale=size_scale(n) * 8)


def test_lu_block_sizes_agree():
    key = jax.random.key(13)
    n = 70
    a = stats.standard_normal_mat(key, n, n, jnp.float64)
    p1, perm1, _ = lu.lu_in_place(a, PartialPivLuParams(block_size=8))
    p2, perm2, _ = lu.lu_in_place(a, PartialPivLuParams(block_size=70))
    assert_approx_eq(p1, p2, scale=size_scale(n) * 8)
    np.testing.assert_array_equal(np.asarray(perm1), np.asarray(perm2))


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("m,n", [(20, 20), (40, 25), (25, 40)])
def test_full_piv_lu(dtype, m, n):
    key = jax.random.key(14)
    a = stats.standard_normal_mat(key, m, n, dtype)
    packed, rp, cp, info = lu.full_piv_lu_in_place(a)
    rec = lu.full_piv_lu_reconstruct(packed, rp, cp)
    assert_approx_eq(rec, a, scale=size_scale(max(m, n)) * 8)
    # |L| entries ≤ 1 with full pivoting
    l = np.tril(np.asarray(packed)[:, :min(m, n)], -1)
    assert np.max(np.abs(l)) <= 1.0 + 1e-10

    if m == n:
        b = stats.standard_normal_mat(jax.random.key(15), n, 2, dtype)
        x = lu.full_piv_lu_solve(packed, rp, cp, b)
        assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 16)


def test_lu_singular_flags():
    a = jnp.zeros((5, 5), jnp.float64)
    _, _, info = lu.lu_in_place(a)
    assert not bool(info.success)


@pytest.mark.slow
def test_lu_wide_panel_block():
    # regression: 512-wide panels route the U12 solve through a 512-block
    # triangular inverse; the Neumann-doubling base overflowed f32 there
    # (intermediate M^k entries grow ~C(n,k)) and silently corrupted every
    # n >= 2048 factorization until the base was capped at 128
    n = 1024
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    packed, perm, info = lu.lu_in_place(a, PartialPivLuParams(block_size=512))
    pn = np.asarray(packed, np.float64)
    l = np.tril(pn, -1) + np.eye(n)
    u = np.triu(pn)
    an = np.asarray(a, np.float64)[np.asarray(perm)]
    err = np.linalg.norm(l @ u - an) / np.linalg.norm(an)
    assert err < 5e-4


def test_invert_triangular_large_block():
    # regression: the matmul-only Neumann base must not be used past 128
    from faer_tpu.ops.triangular import invert_lower_triangular

    n = 512
    rng = np.random.default_rng(1)
    l = jnp.asarray(np.tril(rng.standard_normal((n, n)), -1) * 0.5 + np.eye(n),
                    jnp.float32)
    inv = np.asarray(invert_lower_triangular(l, unit=True, base=n), np.float64)
    r = np.asarray(l, np.float64) @ inv - np.eye(n)
    assert np.isfinite(inv).all()
    assert np.abs(r).max() / max(1.0, np.abs(inv).max()) < 1e-5


@pytest.mark.parametrize("m,n", [(300, 300), (350, 280), (280, 350)])
def test_full_piv_lu_blocked_multiblock(m, n):
    # crosses the 256-wide block boundary of the shrinking-trail version
    rng = np.random.default_rng(m + n)
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float64)
    packed, rp, cp, info = lu.full_piv_lu_in_place(a)
    rec = np.asarray(lu.full_piv_lu_reconstruct(packed, rp, cp))
    assert np.linalg.norm(rec - np.asarray(a)) <= 1e-10 * max(
        1.0, np.linalg.norm(np.asarray(a)))
    # full pivoting: multipliers bounded by 1 and U diagonal non-increasing-ish
    pn = np.asarray(packed)
    k = min(m, n)
    assert np.abs(np.tril(pn, -1)[:, :k]).max() <= 1.0 + 1e-12


def test_perm_transposition_count_exact(rng):
    # pointer-doubling count == n - #cycles (direct cycle walk), and its
    # parity == sign of the permutation matrix
    import jax.numpy as jnp
    from faer_tpu.core.perm import perm_transposition_count

    def cycles(p):
        seen = np.zeros(len(p), bool)
        c = 0
        for i in range(len(p)):
            if not seen[i]:
                c += 1
                j = i
                while not seen[j]:
                    seen[j] = True
                    j = p[j]
        return c

    for _ in range(25):
        m = int(rng.integers(2, 60))
        p = rng.permutation(m)
        got = int(perm_transposition_count(jnp.asarray(p, jnp.int32)))
        assert got == m - cycles(p), (p,)
        assert (-1.0) ** got == np.linalg.det(np.eye(m)[p]).round()


def test_lu_transposition_count_det_sign(rng):
    # real counts from the kernel path; parity must match the det sign
    import jax.numpy as jnp
    from faer_tpu.linalg.lu import lu_in_place

    for n in (192, 512):  # single-panel and multi-panel (cross-panel sums)
        a = np.asarray(rng.standard_normal((n, n)), np.float32)
        lu, perm, info = lu_in_place(jnp.asarray(a))
        nt = int(info.transposition_count)
        assert nt >= 0
        # parity equals the applied permutation's parity ...
        pm = np.eye(n)[np.asarray(perm)]
        assert (-1.0) ** nt == np.linalg.det(pm).round()
        # ... so the det sign comes out right (slogdet: |det| overflows f64)
        sign_np, _ = np.linalg.slogdet(a.astype(np.float64))
        prod_sign = np.prod(np.sign(np.diag(np.asarray(lu, np.float64))))
        assert (-1.0) ** nt * prod_sign == sign_np
