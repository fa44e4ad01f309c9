"""Sparse LU with partial pivoting (simplicial, Gilbert-Peierls).

Reference parity: ``faer/src/sparse/linalg/lu.rs`` — symbolic via colamd
(``factorize_symbolic_lu`` ``:2190``), simplicial numeric (``:1331``),
``factorize_numeric_lu`` (``:2096``), ``LuRef`` solve (``:1848``). The
supernodal path (``:43``) lowering to dense Pallas panels is the planned
upgrade.

Algorithm: for each column j, the sparse lower solve ``L x = A[:, cq[j]]``
with the reach computed by DFS over L's pattern (Gilbert-Peierls), then
partial pivoting on the sub-diagonal part.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from faer_tpu.sparse import colamd as _colamd
from faer_tpu.sparse.csc import SparseCscMat, SymbolicSparseCsc


@dataclasses.dataclass
class SparseLu:
    """Numeric sparse LU: A[row_perm][:, col_perm] = L U (L unit lower)."""

    nrows: int
    ncols: int
    row_perm: np.ndarray
    col_perm: np.ndarray
    l: SparseCscMat
    u: SparseCscMat


def factorize_symbolic_lu(sym: SymbolicSparseCsc):
    """Column ordering via COLAMD (faer ``factorize_symbolic_lu``).

    With the native library present, large patterns order via C++ AMD on the
    (lower) AᵀA pattern — the fill model COLAMD approximates — since the
    Python COLAMD is the wall-time floor past a few thousand columns."""
    n = sym.ncols
    if n >= 512:
        from faer_tpu import native

        if native.available():
            import scipy.sparse as sp

            a = sp.csc_matrix((np.ones(sym.nnz), sym.row_idx, sym.col_ptr),
                              shape=(sym.nrows, sym.ncols))
            ata = sp.tril((a.T @ a).tocsc())
            ata = ata.tocsc()
            perm = native.amd_order(n, ata.indptr.astype(np.int64),
                                    ata.indices.astype(np.int64))
            if perm is not None:
                return perm
    col_perm, _ = _colamd.order(sym)
    return col_perm


def factorize_numeric_lu(a: SparseCscMat, *, col_perm: np.ndarray | None = None,
                         pivot_threshold: float = 1.0,
                         method: str = "auto") -> SparseLu:
    """Sparse LU with partial pivoting.

    ``method``: ``"simplicial"`` (Gilbert–Peierls below), ``"supernodal"``
    (multifrontal dense fronts on the MXU — faer ``lu.rs:43``), or ``"auto"``
    (supernodal for n ≥ 200, matching faer's supernodal-threshold policy).
    """
    m, n = a.nrows, a.ncols
    assert m == n, "sparse LU requires a square matrix"
    if method == "auto":
        # multifrontal front pivoting is plain partial pivoting — a custom
        # pivot_threshold (like a custom col_perm) only exists on the
        # Gilbert–Peierls path, so honor it by routing there.  With the
        # native C++ numeric available the simplicial path wins on wall time
        # (one dispatch-free sweep); the multifrontal/MXU path stays opt-in.
        from faer_tpu import native

        native_ok = (native.available()
                     and not np.iscomplexobj(a.values)
                     and a.values.dtype == np.float64)
        method = ("supernodal"
                  if n >= 200 and col_perm is None and pivot_threshold == 1.0
                  and not native_ok
                  else "simplicial")
    if method == "supernodal":
        if pivot_threshold != 1.0:
            raise ValueError(
                "pivot_threshold is only supported by the simplicial "
                "(Gilbert-Peierls) path; use method='simplicial'")
        from faer_tpu.sparse.multifrontal import lu_numeric_multifrontal

        return lu_numeric_multifrontal(a)
    if col_perm is None:
        col_perm = factorize_symbolic_lu(a.symbolic)
    s = a.symbolic
    dtype = a.values.dtype
    # native C++ Gilbert-Peierls fast path (real f64)
    if not np.iscomplexobj(a.values) and a.values.dtype == np.float64:
        from faer_tpu import native

        out = native.gp_lu(n, s.col_ptr, s.row_idx, a.values, col_perm,
                           pivot_threshold=pivot_threshold)
        if out is not None:
            lptr, lrow_o, lval, uptr, urow, uval, p_ = out
            pinv_ = np.empty(n, dtype=np.int64)
            pinv_[p_] = np.arange(n, dtype=np.int64)
            # L: remap rows to pivot order, insert unit diagonal, sort
            counts = np.diff(lptr)
            lcol_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            lr = pinv_[lrow_o]
            lr_all = np.concatenate([np.arange(n, dtype=np.int64), lr])
            lc_all = np.concatenate([np.arange(n, dtype=np.int64), lcol_of])
            lv_all = np.concatenate([np.ones(n), lval])
            order = np.lexsort((lr_all, lc_all))
            lptr2 = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.bincount(lc_all, minlength=n), out=lptr2[1:])
            l = SparseCscMat(SymbolicSparseCsc(n, n, lptr2, lr_all[order]),
                             lv_all[order])
            # U: rows already pivot positions; sort within columns
            ucol_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(uptr))
            uorder = np.lexsort((urow, ucol_of))
            u = SparseCscMat(SymbolicSparseCsc(n, n, uptr.copy(),
                                               urow[uorder]), uval[uorder])
            return SparseLu(nrows=m, ncols=n, row_perm=p_.copy(),
                            col_perm=col_perm, l=l, u=u)

    # working structures: L columns built incrementally; row permutation
    pinv = np.full(n, -1, dtype=np.int64)   # row → pivot position
    p = np.full(n, -1, dtype=np.int64)      # pivot position → row
    l_cols_idx: list[np.ndarray] = []
    l_cols_val: list[np.ndarray] = []
    u_cols_idx: list[np.ndarray] = []
    u_cols_val: list[np.ndarray] = []
    # L pattern addressed by original row id during construction
    lrows: list[list[int]] = [[] for _ in range(n)]   # column k → row ids (orig)
    lvals: list[list] = [[] for _ in range(n)]

    x = np.zeros(n, dtype=dtype)

    for j in range(n):
        cj = int(col_perm[j])
        # reach: DFS from A[:, cj]'s rows through finished columns of L
        r = s.col_range(cj)
        stack = [int(i) for i in s.row_idx[r]]
        visited = set()
        topo: list[int] = []
        # iterative DFS producing a topological order of reached pivots
        for start in stack:
            if start in visited:
                continue
            dfs = [(start, 0)]
            while dfs:
                node, it = dfs.pop()
                if it == 0:
                    if node in visited:
                        continue
                    visited.add(node)
                    k = pinv[node]
                    if k != -1:
                        children = [i for i in lrows[k] if i not in visited]
                        dfs.append((node, 1))
                        for c in children:
                            dfs.append((c, 0))
                    else:
                        topo.append(node)
                else:
                    topo.append(node)
        # numeric solve: x = A[:, cj]; for pivots in topo order (reverse DFS
        # completion is already topological for this construction)
        x[s.row_idx[r]] = a.values[r]
        order = [node for node in reversed(topo) if pinv[node] != -1]
        for node in order:
            k = pinv[node]
            xk = x[node]
            if xk != 0:
                for i, v in zip(lrows[k], lvals[k]):
                    x[i] -= v * xk
        # split into U part (finished pivots) and candidate part
        upper_rows = [node for node in visited if pinv[node] != -1]
        lower_rows = [node for node in visited if pinv[node] == -1]
        # threshold partial pivoting on the candidate part
        if not lower_rows:
            raise ValueError(f"structurally singular at column {j}")
        mags = np.abs(np.array([x[i] for i in lower_rows]))
        piv_pos = int(np.argmax(mags))
        if mags[piv_pos] == 0:
            raise ValueError(f"numerically singular at column {j}")
        piv_row = lower_rows[piv_pos]
        piv_val = x[piv_row]
        pinv[piv_row] = j
        p[j] = piv_row
        # U column: entries at finished pivot positions + diagonal
        ui = np.array(sorted(pinv[i] for i in upper_rows) + [j], dtype=np.int64)
        uv = np.empty(ui.size, dtype=dtype)
        for t, pos_ in enumerate(ui[:-1]):
            uv[t] = x[p[pos_]]
        uv[-1] = piv_val
        u_cols_idx.append(ui)
        u_cols_val.append(uv)
        # L column (unit diagonal implicit): remaining rows / pivot
        lr = [i for i in lower_rows if i != piv_row]
        lv = [x[i] / piv_val for i in lr]
        lrows[j] = lr
        lvals[j] = lv
        l_cols_idx.append(np.array(lr, dtype=np.int64))
        l_cols_val.append(np.array(lv, dtype=dtype))
        for i in visited:
            x[i] = 0

    # assemble CSC factors in pivot-row coordinates
    def build(cols_idx, cols_val, remap_rows: bool, unit_diag: bool):
        ptr = np.zeros(n + 1, dtype=np.int64)
        idx_all, val_all = [], []
        for j in range(n):
            ri = cols_idx[j]
            rv = cols_val[j]
            if remap_rows:
                ri = pinv[ri] if ri.size else ri
            if unit_diag:
                ri = np.concatenate([[j], ri])
                rv = np.concatenate([[1.0], rv]).astype(dtype)
            srt = np.argsort(ri)
            idx_all.append(ri[srt])
            val_all.append(rv[srt])
            ptr[j + 1] = ptr[j] + ri.size
        idx = np.concatenate(idx_all) if idx_all else np.zeros(0, np.int64)
        val = np.concatenate(val_all) if val_all else np.zeros(0, dtype)
        return SparseCscMat(SymbolicSparseCsc(n, n, ptr, idx.astype(np.int64)), val)

    l = build(l_cols_idx, l_cols_val, remap_rows=True, unit_diag=True)
    u = build(u_cols_idx, u_cols_val, remap_rows=False, unit_diag=False)
    return SparseLu(nrows=m, ncols=n, row_perm=p.copy(), col_perm=col_perm,
                    l=l, u=u)


def lu_solve(f: SparseLu, b):
    """Solve A x = b from the sparse LU."""
    from faer_tpu.sparse.triangular_solve import (
        solve_lower_triangular,
        solve_upper_triangular,
    )

    b = np.asarray(b)
    pb = b[f.row_perm]
    y = solve_lower_triangular(f.l, pb, unit=True)
    z = solve_upper_triangular(f.u, y)
    out = np.empty_like(z)
    out[f.col_perm] = z
    return out
