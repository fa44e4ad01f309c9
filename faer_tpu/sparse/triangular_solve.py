"""Sparse triangular solves (CSC), all variants.

Reference parity: ``faer/src/sparse/linalg/triangular_solve.rs:12-176`` —
lower/upper × unit × transpose over CSC storage.

TPU-native design (SURVEY §2.5): level scheduling — the host computes the
dependency levels of the triangular graph once; each level's updates are then
data-parallel. The host numpy path below is the reference implementation;
``levels_lower`` feeds the device-batched path.
"""
from __future__ import annotations

import numpy as np

from faer_tpu.sparse.csc import SparseCscMat


def levels_lower(l: SparseCscMat) -> np.ndarray:
    """Level (depth) of each unknown in the lower-triangular solve DAG."""
    s = l.symbolic
    n = s.ncols
    level = np.zeros(n, dtype=np.int64)
    for j in range(n):
        r = s.col_range(j)
        for i in s.row_idx[r]:
            if i > j:
                level[i] = max(level[i], level[j] + 1)
    return level


def _native_ok(l: SparseCscMat, b, unit: bool) -> bool:
    del unit
    return not (np.iscomplexobj(l.values) or np.iscomplexobj(np.asarray(b)))


def solve_lower_triangular(l: SparseCscMat, b, *, unit: bool = False,
                           conj: bool = False):
    """x = L⁻¹ b, L lower-triangular CSC (diag present unless unit)."""
    s = l.symbolic
    n = s.ncols
    if not conj and _native_ok(l, b, unit):
        from faer_tpu import native

        out = native.lower_solve(n, s.col_ptr, s.row_idx, l.values,
                                 np.asarray(b), unit=unit)
        if out is not None:
            return out.astype(np.result_type(l.values.dtype,
                                             np.asarray(b).dtype))
    x = np.array(b, dtype=np.result_type(l.values.dtype, np.asarray(b).dtype),
                 copy=True)
    vals = np.conj(l.values) if conj else l.values
    for j in range(n):
        r = s.col_range(j)
        rows = s.row_idx[r]
        col = vals[r]
        if not unit:
            dpos = np.searchsorted(rows, j)
            x[j] = x[j] / col[dpos]
        below = rows > j
        if below.any():
            if x.ndim > 1:
                x[rows[below]] -= col[below][:, None] * x[j][None]
            else:
                x[rows[below]] -= col[below] * x[j]
    return x


def solve_upper_triangular(u: SparseCscMat, b, *, unit: bool = False,
                           conj: bool = False):
    """x = U⁻¹ b, U upper-triangular CSC."""
    s = u.symbolic
    n = s.ncols
    x = np.array(b, dtype=np.result_type(u.values.dtype, np.asarray(b).dtype),
                 copy=True)
    vals = np.conj(u.values) if conj else u.values
    for j in range(n - 1, -1, -1):
        r = s.col_range(j)
        rows = s.row_idx[r]
        col = vals[r]
        if not unit:
            dpos = np.searchsorted(rows, j)
            x[j] = x[j] / col[dpos]
        above = rows < j
        if above.any():
            if x.ndim > 1:
                x[rows[above]] -= col[above][:, None] * x[j][None]
            else:
                x[rows[above]] -= col[above] * x[j]
    return x


def solve_lower_triangular_transpose(l: SparseCscMat, b, *, unit: bool = False,
                                     conj: bool = False):
    """x = L⁻ᵀ b (or L⁻ᴴ with conj): dot-product form over columns, reversed."""
    s = l.symbolic
    n = s.ncols
    if not conj and _native_ok(l, b, unit):
        from faer_tpu import native

        out = native.lower_solve(n, s.col_ptr, s.row_idx, l.values,
                                 np.asarray(b), unit=unit, transpose=True)
        if out is not None:
            return out.astype(np.result_type(l.values.dtype,
                                             np.asarray(b).dtype))
    x = np.array(b, dtype=np.result_type(l.values.dtype, np.asarray(b).dtype),
                 copy=True)
    vals = np.conj(l.values) if conj else l.values
    for j in range(n - 1, -1, -1):
        r = s.col_range(j)
        rows = s.row_idx[r]
        col = vals[r]
        below = rows > j
        if below.any():
            if x.ndim > 1:
                x[j] -= col[below] @ x[rows[below]]
            else:
                x[j] -= col[below] @ x[rows[below]]
        if not unit:
            dpos = np.searchsorted(rows, j)
            x[j] = x[j] / col[dpos]
    return x


def solve_upper_triangular_transpose(u: SparseCscMat, b, *, unit: bool = False,
                                     conj: bool = False):
    s = u.symbolic
    n = s.ncols
    x = np.array(b, dtype=np.result_type(u.values.dtype, np.asarray(b).dtype),
                 copy=True)
    vals = np.conj(u.values) if conj else u.values
    for j in range(n):
        r = s.col_range(j)
        rows = s.row_idx[r]
        col = vals[r]
        above = rows < j
        if above.any():
            x[j] -= col[above] @ x[rows[above]]
        if not unit:
            dpos = np.searchsorted(rows, j)
            x[j] = x[j] / col[dpos]
    return x
