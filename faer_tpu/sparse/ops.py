"""Sparse-sparse coefficient-wise ops + symbolic union.

Reference parity: ``faer/src/sparse/ops.rs`` — ``binary_op`` (``:11``),
``union_symbolic`` (``:242``), ``add/sub`` (``:267-378``).
"""
from __future__ import annotations

import numpy as np

from faer_tpu.sparse.csc import SparseCscMat, SymbolicSparseCsc


def union_symbolic(a: SymbolicSparseCsc, b: SymbolicSparseCsc) -> SymbolicSparseCsc:
    """Pattern union of two same-shape CSC structures (``ops.rs:242``)."""
    assert (a.nrows, a.ncols) == (b.nrows, b.ncols)
    ptr = np.zeros(a.ncols + 1, dtype=np.int64)
    idx_cols = []
    for j in range(a.ncols):
        u = np.union1d(a.row_idx[a.col_range(j)], b.row_idx[b.col_range(j)])
        idx_cols.append(u)
        ptr[j + 1] = ptr[j] + u.size
    row_idx = np.concatenate(idx_cols) if idx_cols else np.zeros(0, np.int64)
    return SymbolicSparseCsc(a.nrows, a.ncols, ptr, row_idx.astype(np.int64))


def binary_op(a: SparseCscMat, b: SparseCscMat, f) -> SparseCscMat:
    """c_ij = f(a_ij, b_ij) over the union pattern (``ops.rs:11``)."""
    sym = union_symbolic(a.symbolic, b.symbolic)
    dtype = np.result_type(a.values.dtype, b.values.dtype)
    vals = np.zeros(sym.nnz, dtype=dtype)
    av = np.zeros(sym.nnz, dtype=dtype)
    bv = np.zeros(sym.nnz, dtype=dtype)
    for j in range(sym.ncols):
        r = sym.col_range(j)
        rows = sym.row_idx[r]
        ar = a.symbolic.col_range(j)
        br = b.symbolic.col_range(j)
        ai = np.searchsorted(rows, a.symbolic.row_idx[ar])
        bi = np.searchsorted(rows, b.symbolic.row_idx[br])
        av[r.start + ai] = a.values[ar]
        bv[r.start + bi] = b.values[br]
    vals = f(av, bv)
    return SparseCscMat(sym, vals)


def add(a: SparseCscMat, b: SparseCscMat) -> SparseCscMat:
    return binary_op(a, b, lambda x, y: x + y)


def sub(a: SparseCscMat, b: SparseCscMat) -> SparseCscMat:
    return binary_op(a, b, lambda x, y: x - y)
