"""CSR container — a thin transpose view over the CSC machinery.

Reference parity: ``faer/src/sparse/csr/mod.rs`` (``SparseRowMat``,
``try_new_from_triplets`` ``csr/mod.rs:2064``). Row-major storage is the
transpose of column-major: all algorithms run on the CSC of Aᵀ.
"""
from __future__ import annotations

import numpy as np

from faer_tpu.sparse.csc import SparseCscMat


class SparseCsrMat:
    """Row-major sparse matrix backed by the CSC of its transpose."""

    def __init__(self, csc_of_transpose: SparseCscMat, shape: tuple[int, int]):
        self._t = csc_of_transpose
        self.nrows, self.ncols = shape

    @staticmethod
    def from_triplets(nrows: int, ncols: int, rows, cols, vals) -> "SparseCsrMat":
        t = SparseCscMat.from_triplets(ncols, nrows, cols, rows, vals)
        return SparseCsrMat(t, (nrows, ncols))

    @staticmethod
    def from_dense(a, *, tol: float = 0.0) -> "SparseCsrMat":
        a = np.asarray(a)
        return SparseCsrMat(SparseCscMat.from_dense(a.T, tol=tol), a.shape)

    @property
    def nnz(self):
        return self._t.nnz

    @property
    def row_ptr(self):
        return self._t.symbolic.col_ptr

    @property
    def col_idx(self):
        return self._t.symbolic.row_idx

    @property
    def values(self):
        return self._t.values

    def to_dense(self) -> np.ndarray:
        return self._t.to_dense().T

    def to_csc(self) -> SparseCscMat:
        return self._t.transpose()

    def transpose(self) -> "SparseCsrMat":
        return SparseCsrMat(self.to_csc(), (self.ncols, self.nrows))

    def __matmul__(self, other):
        return self.to_csc() @ other
