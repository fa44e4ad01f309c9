"""High-level sparse solver objects with symbolic reuse.

Reference parity: ``faer/src/sparse/solvers.rs`` — ``Llt/Lu/Qr`` objects
(``:7-35``), ``try_new_with_symbolic`` symbolic reuse (``:95-154``), and the
``sp_cholesky/sp_lu/sp_qr`` sugar (``:483-501``), surfaced on ``SparseCscMat``.
"""
from __future__ import annotations

import numpy as np

from faer_tpu.sparse import cholesky as sch
from faer_tpu.sparse import lu as slu
from faer_tpu.sparse import qr as sqr
from faer_tpu.sparse.csc import SparseCscMat


class SymbolicLlt:
    """Reusable symbolic Cholesky (faer ``SymbolicLlt::try_new``)."""

    def __init__(self, symb: sch.SymbolicCholesky):
        self.symb = symb

    @staticmethod
    def try_new(pattern, side=None) -> "SymbolicLlt":
        return SymbolicLlt(sch.factorize_symbolic_cholesky(pattern))


class Llt:
    """Sparse LLT solver (faer sparse ``Llt``)."""

    def __init__(self, symb: sch.SymbolicCholesky, l: SparseCscMat):
        self.symb = symb
        self.l = l

    @staticmethod
    def new(a: SparseCscMat, side=None) -> "Llt":
        symb = sch.factorize_symbolic_cholesky(a.symbolic)
        return Llt(symb, sch.factorize_numeric_llt(symb, a))

    @staticmethod
    def try_new_with_symbolic(symbolic: SymbolicLlt, a: SparseCscMat) -> "Llt":
        """faer ``try_new_with_symbolic`` (``sparse/solvers.rs:95``): reuse one
        analysis across many numeric factorizations."""
        return Llt(symbolic.symb, sch.factorize_numeric_llt(symbolic.symb, a))

    def solve(self, b):
        return sch.llt_solve(self.symb, self.l, b)


class Ldlt:
    """Sparse simplicial LDLT (faer sparse ``Ldlt``)."""

    def __init__(self, symb: sch.SymbolicCholesky, l: SparseCscMat, d):
        self.symb = symb
        self.l = l
        self.d = d

    @staticmethod
    def new(a: SparseCscMat, side=None, **regularization) -> "Ldlt":
        symb = sch.factorize_symbolic_cholesky(a.symbolic)
        l, d = sch.factorize_numeric_ldlt(symb, a, **regularization)
        return Ldlt(symb, l, d)

    @staticmethod
    def try_new_with_symbolic(symbolic: SymbolicLlt, a: SparseCscMat) -> "Ldlt":
        l, d = sch.factorize_numeric_ldlt(symbolic.symb, a)
        return Ldlt(symbolic.symb, l, d)

    def solve(self, b):
        from faer_tpu.sparse.triangular_solve import (
            solve_lower_triangular,
            solve_lower_triangular_transpose,
        )

        b = np.asarray(b)
        pb = b[self.symb.perm]
        y = solve_lower_triangular(self.l, pb, unit=True)
        y = (y.T / self.d).T if y.ndim > 1 else y / self.d
        z = solve_lower_triangular_transpose(self.l, y, unit=True,
                                             conj=np.iscomplexobj(self.l.values))
        out = np.empty_like(z)
        out[self.symb.perm] = z
        return out


class Lu:
    def __init__(self, f: slu.SparseLu):
        self.f = f

    @staticmethod
    def new(a: SparseCscMat) -> "Lu":
        return Lu(slu.factorize_numeric_lu(a))

    @staticmethod
    def try_new_with_symbolic(col_perm: np.ndarray, a: SparseCscMat) -> "Lu":
        return Lu(slu.factorize_numeric_lu(a, col_perm=col_perm))

    def solve(self, b):
        return slu.lu_solve(self.f, b)


class Qr:
    def __init__(self, f: sqr.SparseQr):
        self.f = f

    @staticmethod
    def new(a: SparseCscMat) -> "Qr":
        return Qr(sqr.factorize_numeric_qr(a))

    def solve_lstsq(self, b):
        return sqr.qr_solve_lstsq(self.f, b)

    solve = solve_lstsq
