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


def _frontal_plan(symb: sch.SymbolicCholesky, pattern):
    """Supernodes + batched device schedule for one pattern (cached on symb)."""
    plan = getattr(symb, "_frontal_plan", None)
    key = (id(pattern.col_ptr), id(pattern.row_idx))
    if plan is not None:
        # the cached plan's scatter indices are pattern-specific: verify the
        # pattern is the one the plan was built for before reusing
        cached_key, cached_cp, cached_ri, plan_obj = plan
        if key == cached_key or (
                np.array_equal(cached_cp, pattern.col_ptr)
                and np.array_equal(cached_ri, pattern.row_idx)):
            return plan_obj
    from faer_tpu.sparse import supernodal as _sn
    from faer_tpu.sparse.batched_frontal import plan_frontal

    ssym = _sn.detect_supernodes(symb)
    plan_obj = plan_frontal(ssym, pattern)
    symb._frontal_plan = (key, np.asarray(pattern.col_ptr),
                          np.asarray(pattern.row_idx), plan_obj)
    return plan_obj


class Llt:
    """Sparse LLT solver (faer sparse ``Llt``).

    ``method``: ``None`` (host auto-route: native C++ / simplicial /
    supernodal by size) or ``"device"`` (level-scheduled batched fronts on
    the accelerator — one dispatch per (level, size-class)).
    """

    def __init__(self, symb: sch.SymbolicCholesky, l: SparseCscMat):
        self.symb = symb
        self.l = l

    @staticmethod
    def new(a: SparseCscMat, side=None, method: str | None = None) -> "Llt":
        symb = sch.factorize_symbolic_cholesky(a.symbolic)
        return Llt._numeric(symb, a, method)

    @staticmethod
    def _numeric(symb, a, method):
        if method == "device":
            from faer_tpu.sparse.batched_frontal import factorize_frontal_llt

            return Llt(symb, factorize_frontal_llt(
                _frontal_plan(symb, a.symbolic), a))
        return Llt(symb, sch.factorize_numeric_llt(symb, a))

    @staticmethod
    def try_new_with_symbolic(symbolic: SymbolicLlt, a: SparseCscMat,
                              method: str | None = None) -> "Llt":
        """faer ``try_new_with_symbolic`` (``sparse/solvers.rs:95``): reuse one
        analysis across many numeric factorizations."""
        return Llt._numeric(symbolic.symb, a, method)

    def solve(self, b):
        return sch.llt_solve(self.symb, self.l, b)


class Ldlt:
    """Sparse simplicial LDLT (faer sparse ``Ldlt``)."""

    def __init__(self, symb: sch.SymbolicCholesky, l: SparseCscMat, d):
        self.symb = symb
        self.l = l
        self.d = d

    @staticmethod
    def new(a: SparseCscMat, side=None, method: str | None = None,
            **regularization) -> "Ldlt":
        symb = sch.factorize_symbolic_cholesky(a.symbolic)
        return Ldlt._numeric(symb, a, method, regularization)

    @staticmethod
    def _numeric(symb, a, method, regularization):
        if method == "device":
            if regularization:
                raise ValueError(
                    "method='device' does not support dynamic regularization "
                    "yet; use the host path (method=None) for regularized "
                    "LDLT, or drop the regularization kwargs: "
                    f"{sorted(regularization)}")
            # supernodal LDLT on the batched device route
            # (faer factorize_supernodal_numeric_ldlt, cholesky.rs:3287)
            from faer_tpu.sparse.batched_frontal import factorize_frontal_ldlt

            packed = factorize_frontal_ldlt(_frontal_plan(symb, a.symbolic), a)
            ls = symb.l_symbolic
            # packed column j starts at its diagonal entry
            d = packed.values[np.asarray(ls.col_ptr[:-1])].copy()
            return Ldlt(symb, packed, d.real if np.iscomplexobj(d) else d)
        l, d = sch.factorize_numeric_ldlt(symb, a, **regularization)
        return Ldlt(symb, l, d)

    @staticmethod
    def try_new_with_symbolic(symbolic: SymbolicLlt, a: SparseCscMat,
                              method: str | None = None) -> "Ldlt":
        return Ldlt._numeric(symbolic.symb, a, method, {})

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


class Lblt:
    """Sparse supernodal intranode Bunch-Kaufman LBLT (faer
    ``factorize_supernodal_numeric_intranode_lblt``, ``cholesky.rs:3457``):
    the indefinite-safe sparse factorization with 1×1/2×2 pivots restricted
    within supernodes."""

    def __init__(self, f):
        self.f = f

    @staticmethod
    def new(a: SparseCscMat, side=None) -> "Lblt":
        from faer_tpu.sparse.lblt import sp_lblt

        return Lblt(sp_lblt(a))

    @staticmethod
    def try_new_with_symbolic(symbolic: SymbolicLlt, a: SparseCscMat) -> "Lblt":
        from faer_tpu.sparse import supernodal as _sn
        from faer_tpu.sparse.lblt import factorize_supernodal_intranode_lblt

        ssym = getattr(symbolic.symb, "_ssym", None)
        if ssym is None:
            ssym = _sn.detect_supernodes(symbolic.symb)
            symbolic.symb._ssym = ssym
        return Lblt(factorize_supernodal_intranode_lblt(ssym, a))

    def solve(self, b):
        from faer_tpu.sparse.lblt import lblt_solve_supernodal

        return lblt_solve_supernodal(self.f, b)


class Qr:
    def __init__(self, f: sqr.SparseQr):
        self.f = f

    @staticmethod
    def new(a: SparseCscMat) -> "Qr":
        return Qr(sqr.factorize_numeric_qr(a))

    def solve_lstsq(self, b):
        return sqr.qr_solve_lstsq(self.f, b)

    solve = solve_lstsq
