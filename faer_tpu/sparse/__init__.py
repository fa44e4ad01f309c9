"""Sparse module (L4, SURVEY §2.5).

CSC/CSR containers, triplet construction, cwise ops, sparse matmul,
triangular solves, AMD/COLAMD orderings, symbolic + numeric Cholesky/LU/QR,
and high-level solver objects with symbolic reuse.
"""
from faer_tpu.sparse.csc import (
    SparseCscMat,
    SymbolicSparseCsc,
    permute_self_adjoint,
)
from faer_tpu.sparse.csr import SparseCsrMat
from faer_tpu.sparse import (amd, colamd, cholesky, lu, matmul, multifrontal,
                             ops, qr, solvers, supernodal, triangular_solve)

__all__ = [
    "SparseCscMat", "SymbolicSparseCsc", "SparseCsrMat", "permute_self_adjoint",
    "amd", "colamd", "cholesky", "lu", "matmul", "multifrontal", "ops", "qr",
    "solvers", "supernodal", "triangular_solve",
]
