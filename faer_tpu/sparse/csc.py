"""CSC sparse containers: symbolic structure + numeric matrix.

Reference parity: ``faer/src/sparse/csc/mod.rs`` — ``SymbolicSparseColMat`` /
``SparseColMat`` (``sparse/mod.rs:39-43``), ``try_new_from_indices``
(``csc/mod.rs:1302``), ``try_new_from_triplets`` (``:2373``, argsort + dedup),
``to_dense`` (``:1570``), transpose views.

TPU-native design (SURVEY §2.5): symbolic structures are host-side numpy
(integer-only analysis is latency-bound pointer chasing — wrong shape for the
MXU); numeric values live as device or host arrays. The device only ever sees
dense blocks gathered from these structures (supernodal path).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SymbolicSparseCsc:
    """Pattern of an nrows×ncols sparse matrix in compressed-column form."""

    nrows: int
    ncols: int
    col_ptr: np.ndarray  # (ncols+1,) int64
    row_idx: np.ndarray  # (nnz,) int64, sorted within each column

    @property
    def nnz(self) -> int:
        return int(self.col_ptr[-1])

    def col_range(self, j: int) -> slice:
        return slice(int(self.col_ptr[j]), int(self.col_ptr[j + 1]))

    def transpose(self) -> "SymbolicSparseCsc":
        """Symbolic transpose (faer ``sparse/utils.rs:395``) — a CSR view of
        the same pattern, rebuilt as CSC of the transpose."""
        ptr, idx, _ = _transpose_structure(self.nrows, self.ncols,
                                           self.col_ptr, self.row_idx, None)
        return SymbolicSparseCsc(self.ncols, self.nrows, ptr, idx)

    def to_dense_mask(self) -> np.ndarray:
        m = np.zeros((self.nrows, self.ncols), dtype=bool)
        for j in range(self.ncols):
            m[self.row_idx[self.col_range(j)], j] = True
        return m


def _transpose_structure(nrows, ncols, col_ptr, row_idx, values):
    """Counting-sort based transpose; O(nnz)."""
    nnz = int(col_ptr[-1])
    counts = np.bincount(row_idx[:nnz], minlength=nrows)
    new_ptr = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=new_ptr[1:])
    new_idx = np.empty(nnz, dtype=np.int64)
    new_val = np.empty(nnz, dtype=values.dtype) if values is not None else None
    fill = new_ptr[:-1].copy()
    for j in range(ncols):
        for p in range(int(col_ptr[j]), int(col_ptr[j + 1])):
            i = row_idx[p]
            q = fill[i]
            new_idx[q] = j
            if new_val is not None:
                new_val[q] = values[p]
            fill[i] += 1
    return new_ptr, new_idx, new_val


def symbolic_from_indices(nrows: int, ncols: int, rows, cols) -> tuple:
    """Build (SymbolicSparseCsc, order) from coordinate indices, sorting and
    deduplicating (faer ``try_new_from_indices``). ``order`` maps the kept
    entries back to positions in the (sorted) input for value scatter."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if rows.size and (rows.min() < 0 or rows.max() >= nrows):
        raise IndexError("row index out of bounds")
    if cols.size and (cols.min() < 0 or cols.max() >= ncols):
        raise IndexError("col index out of bounds")
    order = np.lexsort((rows, cols))
    rs, cs = rows[order], cols[order]
    keep = np.ones(rs.size, dtype=bool)
    if rs.size > 1:
        dup = (rs[1:] == rs[:-1]) & (cs[1:] == cs[:-1])
        keep[1:] = ~dup
    ur, uc = rs[keep], cs[keep]
    col_ptr = np.zeros(ncols + 1, dtype=np.int64)
    np.add.at(col_ptr, uc + 1, 1)
    np.cumsum(col_ptr, out=col_ptr)
    sym = SymbolicSparseCsc(nrows, ncols, col_ptr, ur)
    # segment ids of kept entries for duplicate accumulation
    seg = np.cumsum(keep) - 1
    return sym, order, seg


class SparseCscMat:
    """Numeric CSC matrix (faer ``SparseColMat``)."""

    def __init__(self, symbolic: SymbolicSparseCsc, values):
        values = np.asarray(values)
        assert values.shape == (symbolic.nnz,), (values.shape, symbolic.nnz)
        self.symbolic = symbolic
        self.values = values

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_triplets(nrows: int, ncols: int, rows, cols, vals) -> "SparseCscMat":
        """faer ``try_new_from_triplets`` (``csc/mod.rs:2373``): sort, dedup,
        accumulate duplicate entries."""
        vals = np.asarray(vals)
        sym, order, seg = symbolic_from_indices(nrows, ncols, rows, cols)
        acc = np.zeros(sym.nnz, dtype=vals.dtype)
        np.add.at(acc, seg, vals[order])
        return SparseCscMat(sym, acc)

    @staticmethod
    def from_dense(a, *, tol: float = 0.0) -> "SparseCscMat":
        a = np.asarray(a)
        rows, cols = np.nonzero(np.abs(a) > tol)
        return SparseCscMat.from_triplets(a.shape[0], a.shape[1], rows, cols,
                                          a[rows, cols])

    @staticmethod
    def identity(n: int, dtype=np.float64) -> "SparseCscMat":
        sym = SymbolicSparseCsc(n, n, np.arange(n + 1, dtype=np.int64),
                                np.arange(n, dtype=np.int64))
        return SparseCscMat(sym, np.ones(n, dtype=dtype))

    # -- basic properties ----------------------------------------------------
    @property
    def nrows(self):
        return self.symbolic.nrows

    @property
    def ncols(self):
        return self.symbolic.ncols

    @property
    def nnz(self):
        return self.symbolic.nnz

    @property
    def dtype(self):
        return self.values.dtype

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.nrows, self.ncols), dtype=self.values.dtype)
        s = self.symbolic
        for j in range(self.ncols):
            r = s.col_range(j)
            out[s.row_idx[r], j] += self.values[r]
        return out

    def transpose(self) -> "SparseCscMat":
        s = self.symbolic
        ptr, idx, val = _transpose_structure(s.nrows, s.ncols, s.col_ptr,
                                             s.row_idx, self.values)
        return SparseCscMat(SymbolicSparseCsc(s.ncols, s.nrows, ptr, idx), val)

    def adjoint(self) -> "SparseCscMat":
        t = self.transpose()
        return SparseCscMat(t.symbolic, np.conj(t.values))

    def __mul__(self, scalar):
        return SparseCscMat(self.symbolic, self.values * scalar)

    __rmul__ = __mul__

    def __neg__(self):
        return SparseCscMat(self.symbolic, -self.values)

    def __add__(self, other):
        from faer_tpu.sparse.ops import add

        return add(self, other)

    def __sub__(self, other):
        from faer_tpu.sparse.ops import sub

        return sub(self, other)

    def __matmul__(self, other):
        from faer_tpu.sparse import matmul as smm

        if isinstance(other, SparseCscMat):
            return smm.sparse_sparse_matmul(self, other)
        return smm.sparse_dense_matmul(self, other)

    def __rmatmul__(self, other):
        from faer_tpu.sparse import matmul as smm

        return smm.dense_sparse_matmul(other, self)

    # -- solvers sugar (sparse/solvers.rs:483-501) ---------------------------
    def sp_cholesky(self, side=None):
        from faer_tpu.sparse.solvers import Llt

        return Llt.new(self)

    def sp_lu(self):
        from faer_tpu.sparse.solvers import Lu

        return Lu.new(self)

    def sp_qr(self):
        from faer_tpu.sparse.solvers import Qr

        return Qr.new(self)


def permute_self_adjoint(a: SparseCscMat, perm: np.ndarray) -> SparseCscMat:
    """P A Pᵀ for a symmetric matrix stored as lower triangle, output lower.

    faer ``permute_self_adjoint`` (``sparse/utils.rs:80``).
    """
    s = a.symbolic
    n = s.ncols
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n, dtype=np.int64)
    col_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(s.col_ptr))
    ni = iperm[s.row_idx]
    nj = iperm[col_of]
    flip = ni < nj                      # keep lower triangle (conj on flip)
    rows = np.where(flip, nj, ni)
    cols = np.where(flip, ni, nj)
    vals = np.where(flip, np.conj(a.values), a.values)
    return SparseCscMat.from_triplets(n, n, rows, cols, vals)
