"""Sparse factorization wall times vs scipy (BASELINE sparse config).

Reference harness analogue: faer/examples/bench_sparse.rs:12-22 (nd3k-class
SPD + unsymmetric problems).  SuiteSparse downloads are unavailable here
(zero egress), so the standard stand-in is the 2-D k×k grid Laplacian —
same structure class (planar, nested-dissection-friendly) as G3_circuit.

Usage: python tools/bench_sparse.py [k]   (grid side, default 100 → n=10k)
"""
import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def grid_laplacian(k: int):
    n = k * k
    main = np.full(n, 4.0)
    ex = np.ones(n - 1)
    ex[np.arange(1, n) % k == 0] = 0          # no wrap across rows
    ey = np.ones(n - k)
    a = sp.diags([main, -ex, -ex, -ey, -ey], [0, 1, -1, k, -k], format="csc")
    return a


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    a_sp = grid_laplacian(k)
    n = a_sp.shape[0]
    print(f"grid {k}x{k} Laplacian: n={n}, nnz={a_sp.nnz}", flush=True)
    b = np.random.default_rng(0).standard_normal(n)

    # scipy LU (SuperLU)
    t0 = time.perf_counter()
    slu = spla.splu(a_sp)
    t_scipy_lu = time.perf_counter() - t0
    t0 = time.perf_counter()
    x_ref = slu.solve(b)
    t_scipy_solve = time.perf_counter() - t0
    print(f"scipy splu factor {t_scipy_lu*1e3:9.1f} ms   solve {t_scipy_solve*1e3:7.1f} ms", flush=True)

    from faer_tpu.sparse.csc import SparseCscMat
    lower = sp.tril(a_sp, format="csc")
    a_ours = SparseCscMat(
        __import__("faer_tpu.sparse.csc", fromlist=["SymbolicSparseCsc"]).SymbolicSparseCsc(
            n, n, lower.indptr.astype(np.int64), lower.indices.astype(np.int64)),
        lower.data)

    from faer_tpu.sparse.cholesky import factorize_symbolic_cholesky
    from faer_tpu.sparse.supernodal import detect_supernodes, factorize_supernodal_numeric_llt
    t0 = time.perf_counter()
    symb = factorize_symbolic_cholesky(a_ours.symbolic)
    ssym = detect_supernodes(symb)
    t_symbolic = time.perf_counter() - t0
    t0 = time.perf_counter()
    l = factorize_supernodal_numeric_llt(ssym, a_ours)
    t_numeric = time.perf_counter() - t0
    nsn = len(ssym.sn_rows)
    print(f"faer_tpu supernodal LLT symbolic {t_symbolic*1e3:9.1f} ms   "
          f"numeric {t_numeric*1e3:9.1f} ms   ({nsn} fronts)", flush=True)
    from faer_tpu.sparse.cholesky import llt_solve
    t0 = time.perf_counter()
    x = llt_solve(symb, l, b)
    t_solve = time.perf_counter() - t0
    res = np.abs(a_sp @ x - b).max()
    print(f"faer_tpu solve {t_solve*1e3:7.1f} ms   residual {res:.2e}   "
          f"vs scipy x diff {np.abs(x - x_ref).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
