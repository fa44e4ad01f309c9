"""Sparse Cholesky: symbolic analysis + simplicial numeric LLT/LDLT.

Reference parity: ``faer/src/sparse/linalg/cholesky.rs`` — elimination tree +
column counts (simplicial mod ``:501``), ``factorize_symbolic_cholesky``
(``:4608``), numeric LLT/LDLT (``:3945-4136``), solve (``LltRef`` ``:4247``);
``SymmetricOrdering`` Amd/Identity/Custom (``:487``).

TPU-native split (SURVEY §3.5): the symbolic phase (integer-only, once per
pattern) runs on the host; the numeric phase is re-runnable per value set.
This module ships the simplicial (up-looking) numeric path; the supernodal
path (ragged batches of dense Pallas panels) is the planned upgrade for large
fronts.
"""
from __future__ import annotations

import dataclasses
import enum

import numpy as np

from faer_tpu.sparse import amd as _amd
from faer_tpu.sparse.csc import (
    SparseCscMat,
    SymbolicSparseCsc,
    permute_self_adjoint,
)


class SymmetricOrdering(enum.Enum):
    """faer ``SymmetricOrdering`` (``cholesky.rs:487``)."""

    AMD = 0
    IDENTITY = 1


def elimination_tree(sym: SymbolicSparseCsc) -> np.ndarray:
    """Liu's elimination tree from the lower-triangular pattern (col-major).

    parent[j] = first off-diagonal row in column j of L (−1 for roots).
    Uses the native C++ kernel when available (faer_tpu.native).
    """
    from faer_tpu import native

    nat = native.etree(sym.ncols, sym.col_ptr, sym.row_idx)
    if nat is not None:
        return nat
    n = sym.ncols
    # Liu's algorithm processes ROW i's entries (k < i) at step i; the lower
    # CSC stores entry (i, j ≤ i) in column j, so build row lists first
    rows: list[list[int]] = [[] for _ in range(n)]
    for j in range(n):
        for p in range(int(sym.col_ptr[j]), int(sym.col_ptr[j + 1])):
            i = int(sym.row_idx[p])
            if i > j:
                rows[i].append(j)
    parent = np.full(n, -1, dtype=np.int64)
    ancestor = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        for k in rows[i]:
            # walk from k up with path compression until reaching i
            while True:
                a = ancestor[k]
                if a == i:
                    break
                ancestor[k] = i
                if a == -1:
                    parent[k] = i
                    break
                k = a
    return parent


def _column_patterns(sym: SymbolicSparseCsc, parent: np.ndarray) -> list:
    """Row pattern of each column of L (sorted), via the etree reach.

    The pattern of column j of L = nodes reachable: for each entry A[i, j]
    (i ≥ j, lower storage: entries of column j are rows ≥ j... we traverse
    from each row index up the etree, standard up-looking symbolic).
    """
    n = sym.ncols
    patterns = [set() for _ in range(n)]
    # use upper-triangular access: for row k, its column pattern contributions
    # (A stored lower: entry (i, j), i ≥ j ⇒ row i's "reach" includes j)
    for j in range(n):
        for p in range(int(sym.col_ptr[j]), int(sym.col_ptr[j + 1])):
            i = int(sym.row_idx[p])
            if i < j:
                continue
            # entry (i, j) with i ≥ j: column j of L reaches... walk from j? —
            # standard: nonzeros of row i of L are the path from each j up the
            # etree until i
            k = j
            while k != -1 and k < i:
                patterns[k].add(i)
                k = int(parent[k])
    for j in range(n):
        patterns[j].add(j)
    return [np.array(sorted(s), dtype=np.int64) for s in patterns]


@dataclasses.dataclass
class SymbolicCholesky:
    """Reusable symbolic factorization (faer ``SymbolicCholesky``,
    ``cholesky.rs:3788``): ordering + etree + L pattern."""

    n: int
    perm: np.ndarray
    parent: np.ndarray
    l_symbolic: SymbolicSparseCsc
    col_counts: np.ndarray


def factorize_symbolic_cholesky(
    sym: SymbolicSparseCsc,
    *,
    ordering: SymmetricOrdering = SymmetricOrdering.AMD,
    perm: np.ndarray | None = None,
) -> SymbolicCholesky:
    """Symbolic phase (faer ``cholesky.rs:4608``): fill-reducing order, etree,
    column counts, L pattern. Input pattern: lower triangle in CSC."""
    n = sym.ncols
    if perm is None:
        if ordering is SymmetricOrdering.AMD:
            perm, _ = _amd.order(sym)
        else:
            perm = np.arange(n, dtype=np.int64)
    # permuted pattern (values unused for symbolic: fake ones)
    a_perm = permute_self_adjoint(
        SparseCscMat(sym, np.ones(sym.nnz)), perm).symbolic
    parent = elimination_tree(a_perm)
    from faer_tpu import native

    nat = native.l_pattern(n, a_perm.col_ptr, a_perm.row_idx, parent)
    if nat is not None:
        ptr, row_idx = nat
        counts = np.diff(ptr)
    else:
        patterns = _column_patterns(a_perm, parent)
        counts = np.array([len(p) for p in patterns], dtype=np.int64)
        ptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=ptr[1:])
        row_idx = np.concatenate(patterns) if patterns else np.zeros(0, np.int64)
    lsym = SymbolicSparseCsc(n, n, ptr, row_idx)
    return SymbolicCholesky(n=n, perm=perm, parent=parent, l_symbolic=lsym,
                            col_counts=counts)


def factorize_numeric_llt(symb: SymbolicCholesky, a: SparseCscMat):
    """Up-looking simplicial LLT (faer numeric entry ``cholesky.rs:3945``).

    ``a``: lower triangle of the (unpermuted) SPD matrix. Returns the L factor
    as a SparseCscMat over ``symb.l_symbolic``. Raises ValueError on a
    non-positive pivot.
    """
    ap = permute_self_adjoint(a, symb.perm)
    n = symb.n
    ls = symb.l_symbolic
    # supernodal route for large, dense-ish factors: per-descendant GEMM
    # updates beat the per-column up-looking sweep once columns average
    # ~24+ entries (measured on grid Laplacians, BENCH_NOTES round 3)
    if (not np.iscomplexobj(ap.values) and ap.values.dtype == np.float64
            and n >= 20_000 and ls.nnz >= 24 * n):
        from faer_tpu import native
        from faer_tpu.sparse import supernodal as _sn

        if native.available():
            ssym = _sn.detect_supernodes(symb)
            return _sn.factorize_supernodal_numeric_llt(ssym, a)
    # native C++ numeric fast path (real f64): ~SuperLU-class wall time
    if not np.iscomplexobj(ap.values) and ap.values.dtype == np.float64:
        from faer_tpu import native

        lv = native.chol_numeric(n, ap.symbolic.col_ptr,
                                 ap.symbolic.row_idx, ap.values,
                                 ls.col_ptr, ls.row_idx)
        if lv is not None:
            return SparseCscMat(ls, lv)
    lvals = np.zeros(ls.nnz, dtype=ap.values.dtype)
    # dense work column + position lookup per column of L
    pos = {}
    for j in range(n):
        r = ls.col_range(j)
        pos[j] = {int(i): r.start + t for t, i in enumerate(ls.row_idx[r])}

    # precompute row lists of L (row j → columns k < j with L[j, k] ≠ 0)
    row_lists = [[] for _ in range(n)]
    for k in range(n):
        for p in range(int(ls.col_ptr[k]), int(ls.col_ptr[k + 1])):
            i = int(ls.row_idx[p])
            if i > k:
                row_lists[i].append(k)

    # left-looking by column
    work = np.zeros(n, dtype=ap.values.dtype)
    asym = ap.symbolic
    for j in range(n):
        # scatter A[:, j] (lower) into work
        r = asym.col_range(j)
        rows_a = asym.row_idx[r]
        work[rows_a] = ap.values[r]
        # subtract contributions of earlier columns k with L[j, k] != 0
        reach = row_lists[j]
        for k in reach:
            ljk = lvals[pos[k][j]]
            if ljk == 0:
                continue
            rk = ls.col_range(k)
            rows_k = ls.row_idx[rk]
            below = rows_k >= j
            work[rows_k[below]] -= np.conj(ljk) * lvals[rk.start:rk.stop][below]
        # pivot
        dj = work[j].real if np.iscomplexobj(work) else work[j]
        if dj <= 0:
            raise ValueError(f"non-positive pivot at column {j}: {dj}")
        piv = np.sqrt(dj)
        rj = ls.col_range(j)
        rows_j = ls.row_idx[rj]
        colv = work[rows_j]
        colv = colv / piv
        colv[0] = piv  # rows_j[0] == j
        lvals[rj] = colv
        work[rows_j] = 0
    return SparseCscMat(ls, lvals)


def llt_solve(symb: SymbolicCholesky, l: SparseCscMat, b):
    """Solve A x = b from the sparse LLT (faer ``LltRef::solve``)."""
    from faer_tpu.sparse.triangular_solve import (
        solve_lower_triangular,
        solve_lower_triangular_transpose,
    )

    b = np.asarray(b)
    pb = b[symb.perm]
    y = solve_lower_triangular(l, pb)
    z = solve_lower_triangular_transpose(l, y, conj=np.iscomplexobj(l.values))
    out = np.empty_like(z)
    out[symb.perm] = z
    return out


def factorize_numeric_ldlt(symb: SymbolicCholesky, a: SparseCscMat, *,
                           regularization_epsilon: float = 0.0,
                           regularization_delta: float = 0.0,
                           regularization_signs=None):
    """Simplicial LDLT: returns (L_unit, d) sharing ``l_symbolic``.

    TRUE indefinite LDLT (left-looking, no square roots) with faer's
    dynamic-regularization semantics (``cholesky.rs:760-870``): when
    ``delta > 0``, a pivot with ``|d| ≤ epsilon`` is replaced by ``±delta``
    (sign from ``regularization_signs[k]`` when given, else the pivot's own
    sign, non-negative pivots going positive).  Raises on an exactly-zero
    pivot when regularization is off.
    """
    ap = permute_self_adjoint(a, symb.perm)
    n = symb.n
    ls = symb.l_symbolic
    dtype = ap.values.dtype
    # native C++ fast path when no regularization semantics are requested
    if (regularization_delta == 0.0 and not np.iscomplexobj(ap.values)
            and ap.values.dtype == np.float64):
        from faer_tpu import native

        lv = native.chol_numeric(n, ap.symbolic.col_ptr, ap.symbolic.row_idx,
                                 ap.values, ls.col_ptr, ls.row_idx, ldlt=True)
        if lv is not None:
            dn = lv[ls.col_ptr[:-1]]
            if np.any(dn == 0) or np.any(np.abs(dn) <= 1e-290):
                raise ValueError("zero pivot in LDLT (regularization off)")
            lvu = lv.copy()
            lvu[ls.col_ptr[:-1]] = 1.0
            return SparseCscMat(ls, lvu), dn
    lvals = np.zeros(ls.nnz, dtype=dtype)
    d = np.zeros(n, dtype=ap.values.real.dtype)
    pos = {}
    for j in range(n):
        r = ls.col_range(j)
        pos[j] = {int(i): r.start + t for t, i in enumerate(ls.row_idx[r])}
    row_lists = [[] for _ in range(n)]
    for k in range(n):
        for p in range(int(ls.col_ptr[k]), int(ls.col_ptr[k + 1])):
            i = int(ls.row_idx[p])
            if i > k:
                row_lists[i].append(k)

    eps_r = abs(regularization_epsilon)
    delta = abs(regularization_delta)
    has_delta = delta > 0
    signs = regularization_signs
    n_regularized = 0
    work = np.zeros(n, dtype=dtype)
    asym = ap.symbolic
    for j in range(n):
        r = asym.col_range(j)
        work[asym.row_idx[r]] = ap.values[r]
        for k in row_lists[j]:
            ljk = lvals[pos[k][j]]
            if ljk == 0:
                continue
            rk = ls.col_range(k)
            rows_k = ls.row_idx[rk]
            below = rows_k >= j
            work[rows_k[below]] -= (np.conj(ljk) * d[k]) * \
                lvals[rk.start:rk.stop][below]
        dj = work[j].real if np.iscomplexobj(work) else work[j]
        if has_delta:
            if signs is not None:
                sg = signs[j]
                if sg > 0 and dj <= eps_r:
                    dj = delta
                    n_regularized += 1
                elif sg < 0 and dj >= -eps_r:
                    dj = -delta
                    n_regularized += 1
            elif abs(dj) <= eps_r:
                dj = -delta if dj < 0 else delta
                n_regularized += 1
        if dj == 0:
            raise ValueError(f"zero pivot at column {j} (enable dynamic "
                             "regularization for quasi-definite systems)")
        d[j] = dj
        rj = ls.col_range(j)
        rows_j = ls.row_idx[rj]
        colv = work[rows_j] / dj
        colv[0] = 1.0
        lvals[rj] = colv
        work[rows_j] = 0
    return SparseCscMat(ls, lvals), d
