"""Kernel layer (L2): BLAS-3 + fused memory-bound kernels.

SURVEY §2.3 — matmul, triangular matmul, TRSM/TRTRI, block Householder,
Givens/Jacobi, reductions, cwise (zip) helpers.
"""
from faer_tpu.ops.matmul import matmul, matvec, rank_update
from faer_tpu.ops.triangular import (
    apply_structure,
    invert_lower_triangular,
    invert_unit_lower_triangular,
    invert_unit_upper_triangular,
    invert_upper_triangular,
    triangular_matmul,
)
from faer_tpu.ops import householder, jacobi, reductions, triangular_solve, zip

__all__ = [
    "matmul", "matvec", "rank_update", "triangular_matmul", "apply_structure",
    "invert_lower_triangular", "invert_upper_triangular",
    "invert_unit_lower_triangular", "invert_unit_upper_triangular",
    "householder", "jacobi", "reductions", "triangular_solve", "zip",
]
