"""Matrix-free / iterative layer (SURVEY §2.6).

Reference parity: ``faer/src/operator`` (exported as ``faer::matrix_free``,
``lib.rs:613``) — ``LinOp/BiLinOp/Precond`` traits (``operator/mod.rs:30-243``),
CG (``conjugate_gradient.rs:108``), BiCGSTAB (``bicgstab.rs:111``), LSMR
(``lsmr.rs:142``), Krylov-Schur ``partial_eigen/partial_self_adjoint_eigen/
partial_svd`` (``operator/eigen/mod.rs:1271-1396``).

TPU-native design: a ``LinearOperator`` is any jit-able callable ``x ↦ A x``;
adapters wrap dense arrays, diagonals and sparse matrices. Solvers are
``lax.while_loop`` iterations with residual predicates + iteration bounds,
returning ``IterSolveInfo`` pytrees (no data-dependent exceptions — SURVEY
§5.3).
"""
from faer_tpu.matrix_free.operator import (
    DenseLinOp,
    DiagLinOp,
    FnLinOp,
    IdentityPrecond,
    LinOp,
    PairDenseLinOp,
    aslinop,
    aslinop_pair,
)
from faer_tpu.matrix_free.cg import conjugate_gradient
from faer_tpu.matrix_free.bicgstab import bicgstab
from faer_tpu.matrix_free.lsmr import lsmr
from faer_tpu.matrix_free.eigen import (
    partial_eigen,
    partial_eigen_cpair,
    partial_self_adjoint_eigen,
    partial_svd,
)

__all__ = [
    "LinOp", "DenseLinOp", "DiagLinOp", "FnLinOp", "IdentityPrecond", "aslinop",
    "PairDenseLinOp", "aslinop_pair",
    "conjugate_gradient", "bicgstab", "lsmr",
    "partial_eigen", "partial_eigen_cpair", "partial_self_adjoint_eigen",
    "partial_svd",
]
