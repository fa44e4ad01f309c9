"""Column approximate minimum degree (for sparse LU/QR).

Reference parity: ``faer/src/sparse/linalg/colamd.rs`` — ``order`` (``:98``).
Orders the columns of A by minimum degree on the AᵀA pattern without forming
it explicitly (each row of A is a clique among the columns it touches — the
same quotient-graph machinery as AMD with rows as initial elements).
"""
from __future__ import annotations

import numpy as np

from faer_tpu.sparse.amd import Control, FlopCount
from faer_tpu.sparse.csc import SymbolicSparseCsc


def order(sym: SymbolicSparseCsc, control: Control | None = None):
    """Column ordering for LU/QR: returns ``(col_perm, FlopCount)``.

    Dispatches to the native C++ quotient-graph COLAMD (approximate degrees,
    supervariables, aggressive absorption — ``native/sparse_symbolic.cpp``)
    when available; the pure-Python exact-degree heap below is the fallback.
    """
    del control
    m, n = sym.nrows, sym.ncols
    from faer_tpu import native

    nat = native.colamd_order(m, n, sym.col_ptr, sym.row_idx)
    if nat is not None:
        return nat, FlopCount()
    # rows as cliques: row i connects all columns with a nonzero in row i
    row_cols = [[] for _ in range(m)]
    for j in range(n):
        for p in range(int(sym.col_ptr[j]), int(sym.col_ptr[j + 1])):
            row_cols[int(sym.row_idx[p])].append(j)

    import heapq

    col_elems = [set() for _ in range(n)]   # column → clique (element) ids
    elem_bound = {}
    for i, cols in enumerate(row_cols):
        if len(cols) > 1:
            elem_bound[i] = set(cols)
            for j in cols:
                col_elems[j].add(i)

    alive = np.ones(n, dtype=bool)

    def ext_degree(j):
        seen = set()
        for e in col_elems[j]:
            seen |= elem_bound[e]
        seen.discard(j)
        return len([u for u in seen if alive[u]])

    degree = np.array([ext_degree(j) for j in range(n)], dtype=np.int64)
    heap = [(int(degree[j]), j) for j in range(n)]
    heapq.heapify(heap)
    perm = np.empty(n, dtype=np.int64)
    flops = FlopCount()

    for k in range(n):
        while True:
            dcur, v = heapq.heappop(heap)
            if alive[v] and dcur == degree[v]:
                break
        alive[v] = False
        perm[k] = v
        bound = set()
        for e in col_elems[v]:
            bound |= set(u for u in elem_bound[e] if alive[u])
        bound.discard(v)
        d = len(bound)
        flops.n_div += d
        flops.n_mult_subtract_lu += d * d
        for e in list(col_elems[v]):
            elem_bound.pop(e, None)
        eid = m + n + k
        elem_bound[eid] = bound
        for u in bound:
            col_elems[u] = {e for e in col_elems[u] if e in elem_bound}
            col_elems[u].add(eid)
            seen = set()
            for e in col_elems[u]:
                seen |= elem_bound[e]
            seen.discard(u)
            newd = min(n - k - 1, len([w for w in seen if alive[w]]))
            if newd != degree[u]:
                degree[u] = newd
                heapq.heappush(heap, (int(newd), u))

    return perm, flops
