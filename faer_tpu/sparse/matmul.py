"""Sparse matmul: sparse×sparse (symbolic + numeric), sparse×dense,
dense×sparse.

Reference parity: ``faer/src/sparse/linalg/matmul.rs`` —
``sparse_sparse_matmul[_symbolic/_numeric]`` (``:16,76,185``),
``sparse_dense_matmul`` (``:251``), ``dense_sparse_matmul`` (``:390``).

TPU-native split: symbolic products run on the host (Gustavson); the
sparse×dense product lowers to a device gather + segment-sum when the dense
operand is a jax array, else numpy on the host.
"""
from __future__ import annotations

import numpy as np

from faer_tpu.sparse.csc import SparseCscMat, SymbolicSparseCsc


def sparse_sparse_matmul_symbolic(a: SymbolicSparseCsc,
                                  b: SymbolicSparseCsc) -> SymbolicSparseCsc:
    """Pattern of A@B via Gustavson's algorithm (host)."""
    assert a.ncols == b.nrows
    ptr = np.zeros(b.ncols + 1, dtype=np.int64)
    cols = []
    marker = np.full(a.nrows, -1, dtype=np.int64)
    for j in range(b.ncols):
        out_rows = []
        for p in range(int(b.col_ptr[j]), int(b.col_ptr[j + 1])):
            k = b.row_idx[p]
            for q in range(int(a.col_ptr[k]), int(a.col_ptr[k + 1])):
                i = a.row_idx[q]
                if marker[i] != j:
                    marker[i] = j
                    out_rows.append(i)
        out_rows.sort()
        cols.append(np.asarray(out_rows, dtype=np.int64))
        ptr[j + 1] = ptr[j] + len(out_rows)
    row_idx = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    return SymbolicSparseCsc(a.nrows, b.ncols, ptr, row_idx)


def sparse_sparse_matmul_numeric(sym: SymbolicSparseCsc, a: SparseCscMat,
                                 b: SparseCscMat) -> SparseCscMat:
    dtype = np.result_type(a.values.dtype, b.values.dtype)
    vals = np.zeros(sym.nnz, dtype=dtype)
    acc = np.zeros(a.nrows, dtype=dtype)
    for j in range(b.ncols):
        bs = b.symbolic.col_range(j)
        for p in range(bs.start, bs.stop):
            k = b.symbolic.row_idx[p]
            bv = b.values[p]
            ar = a.symbolic.col_range(int(k))
            acc[a.symbolic.row_idx[ar]] += a.values[ar] * bv
        r = sym.col_range(j)
        rows = sym.row_idx[r]
        vals[r] = acc[rows]
        acc[rows] = 0
    return SparseCscMat(sym, vals)


def sparse_sparse_matmul(a: SparseCscMat, b: SparseCscMat) -> SparseCscMat:
    sym = sparse_sparse_matmul_symbolic(a.symbolic, b.symbolic)
    return sparse_sparse_matmul_numeric(sym, a, b)


def sparse_dense_matmul(a: SparseCscMat, x):
    """A @ X for dense X — device path when X is a jax array (gather +
    segment-sum, SURVEY §2.5), numpy otherwise."""
    try:
        import jax
        import jax.numpy as jnp

        is_jax = isinstance(x, jax.Array)
    except Exception:  # pragma: no cover
        is_jax = False
    s = a.symbolic
    if is_jax:
        vals = jnp.asarray(a.values)
        cols = np.repeat(np.arange(s.ncols), np.diff(s.col_ptr))
        xg = jnp.take(x, jnp.asarray(cols), axis=0)          # (nnz, k)
        prod = xg * vals[:, None].astype(xg.dtype)
        return jax.ops.segment_sum(prod, jnp.asarray(s.row_idx),
                                   num_segments=s.nrows)
    x = np.asarray(x)
    out = np.zeros((s.nrows, x.shape[1]), dtype=np.result_type(a.values.dtype, x.dtype))
    cols = np.repeat(np.arange(s.ncols), np.diff(s.col_ptr))
    np.add.at(out, s.row_idx, a.values[:, None] * x[cols])
    return out


def dense_sparse_matmul(x, a: SparseCscMat):
    """X @ A (``matmul.rs:390``): one gather-matvec per output column."""
    try:
        import jax
        import jax.numpy as jnp

        is_jax = isinstance(x, jax.Array)
    except Exception:  # pragma: no cover
        is_jax = False
    s = a.symbolic
    if is_jax:
        vals = jnp.asarray(a.values)
        rows = jnp.asarray(s.row_idx)
        cols = np.repeat(np.arange(s.ncols), np.diff(s.col_ptr))
        xg = jnp.take(x, rows, axis=1)                        # (k, nnz)
        prod = xg * vals[None, :].astype(xg.dtype)
        return jax.ops.segment_sum(prod.T, jnp.asarray(cols),
                                   num_segments=s.ncols).T
    x = np.asarray(x)
    out = np.zeros((x.shape[0], s.ncols), dtype=np.result_type(a.values.dtype, x.dtype))
    for j in range(s.ncols):
        r = s.col_range(j)
        out[:, j] = x[:, s.row_idx[r]] @ a.values[r]
    return out
