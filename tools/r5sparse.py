"""Round-5: batched frontal DEVICE path vs C++ host numeric at scale.

VERDICT r4 weak #5 / ask #3: the device route was verified only at n=576
against a round-3 done criterion of n=90k.  This measures, per grid size,

  * symbolic analysis + supernode detection + device plan build (host, once)
  * host numeric wall (the C++ auto-route) — warm repeat
  * device numeric wall — compile (first) and warm repeat
  * solve residual via the shared simplicial solve
  * the plan's dispatch count (#(level, class) groups) — the suspected
    bottleneck called out by the round-4 verdict

Run: python tools/r5sparse.py [n ...]   (defaults 10000 29929 90000)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from faer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def grid_laplacian(side: int):
    """2-D 5-point grid Laplacian (n = side², SPD), lower-triangular CSC."""
    from faer_tpu.sparse.csc import SparseCscMat

    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.full(n, 4.0)]
    # lower triangle only: (i+1, j) grid-south and (i, j+1)-transposed pairs
    south = (idx[:-1, :].ravel(), idx[1:, :].ravel())
    east = (idx[:, :-1].ravel(), idx[:, 1:].ravel())
    for a, b in (south, east):
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        rows.append(hi)
        cols.append(lo)
        vals.append(np.full(lo.size, -1.0))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = np.concatenate(vals)
    return SparseCscMat.from_triplets(n, n, r, c, v)


def main():
    sides = [int(x) for x in sys.argv[1:]] or [100, 173, 300]
    from faer_tpu.sparse import cholesky as sch
    from faer_tpu.sparse import supernodal as _sn
    from faer_tpu.sparse.batched_frontal import (
        factorize_frontal_llt,
        plan_frontal,
    )
    from faer_tpu.sparse.solvers import Llt, SymbolicLlt

    for side in sides:
        a = grid_laplacian(side)
        n = a.symbolic.nrows
        t0 = time.perf_counter()
        symb = sch.factorize_symbolic_cholesky(a.symbolic)
        t_sym = time.perf_counter() - t0
        t0 = time.perf_counter()
        ssym = _sn.detect_supernodes(symb)
        plan = plan_frontal(ssym, a.symbolic)
        t_plan = time.perf_counter() - t0
        ngroups = len(plan.groups)
        sizes = sorted({(g.wc, g.uc) for g in plan.groups})
        print(f"n={n}: nnz(A)={a.symbolic.nnz}, symbolic {t_sym*1e3:.0f} ms, "
              f"plan {t_plan*1e3:.0f} ms, {ngroups} dispatch groups over "
              f"{plan.n_levels} levels, {len(sizes)} distinct (wc,uc) shapes",
              flush=True)

        # host numeric (C++ auto-route), warm best-of-3
        best_h = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            lh = sch.factorize_numeric_llt(symb, a)
            best_h = min(best_h, time.perf_counter() - t0)
        print(f"  host numeric: {best_h*1e3:8.1f} ms", flush=True)

        # device numeric: compile + warm repeats
        t0 = time.perf_counter()
        ld = factorize_frontal_llt(plan, a)
        t_first = time.perf_counter() - t0
        best_d = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            ld = factorize_frontal_llt(plan, a)
            best_d = min(best_d, time.perf_counter() - t0)
        print(f"  device numeric: first {t_first*1e3:8.1f} ms, "
              f"warm {best_d*1e3:8.1f} ms  ({best_d/best_h:5.2f}x host)",
              flush=True)

        # numeric parity (VERDICT ask #10: values, not just solve residual)
        dv = np.abs(np.asarray(ld.values) - np.asarray(lh.values))
        scale = np.abs(np.asarray(lh.values)).max()
        print(f"  |L_device - L_host|max/|L|max = {dv.max()/scale:.2e}",
              flush=True)

        # end-to-end solve residual through the solver facade
        b = np.linspace(1.0, 2.0, n)
        f = Llt.try_new_with_symbolic(SymbolicLlt(symb), a, method="device")
        x = f.solve(b)
        # A is stored lower-triangular: symmetrize via scipy for the check
        import scipy.sparse as sp

        asp = sp.csc_matrix((np.asarray(a.values),
                             np.asarray(a.symbolic.row_idx),
                             np.asarray(a.symbolic.col_ptr)), shape=(n, n))
        afull = asp + sp.tril(asp, -1).T
        r = np.linalg.norm(afull @ x - b) / np.linalg.norm(b)
        print(f"  device solve rel resid: {r:.2e}", flush=True)


if __name__ == "__main__":
    main()
