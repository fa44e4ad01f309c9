"""Sparse QR: multifrontal Householder R (default) with CSNE lstsq.

Reference parity target: ``faer/src/sparse/linalg/qr.rs`` — symbolic from the
cholesky of AᵀA (``factorize_symbolic_qr`` ``:2353``), supernodal Householder
(``:305``), simplicial (``:1388``).

The default path computes R by **multifrontal Householder QR**
(``sparse/multifrontal.py``: frontal dense QRs on the MXU, R assembled from
the fronts); the AᵀA-Cholesky R remains as a fallback (``method="ata"``).
Least-squares solves use corrected semi-normal equations (CSNE: one step of
iterative refinement) unless the stored frontal Householder vectors are
available for a direct Qᵀb apply.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from faer_tpu.sparse import cholesky as sch
from faer_tpu.sparse.csc import SparseCscMat
from faer_tpu.sparse.matmul import sparse_dense_matmul, sparse_sparse_matmul


@dataclasses.dataclass
class SparseQr:
    nrows: int
    ncols: int
    symb: sch.SymbolicCholesky
    r_factor: SparseCscMat   # L of AᵀA: R = Lᵀ (permuted coordinates)
    a: SparseCscMat


def _ata_lower(a: SparseCscMat) -> SparseCscMat:
    at = a.adjoint()
    ata = sparse_sparse_matmul(at, a)
    # keep lower triangle
    s = ata.symbolic
    rows, cols, vals = [], [], []
    for j in range(s.ncols):
        r = s.col_range(j)
        for t in range(r.start, r.stop):
            i = int(s.row_idx[t])
            if i >= j:
                rows.append(i)
                cols.append(j)
                vals.append(ata.values[t])
    return SparseCscMat.from_triplets(s.nrows, s.ncols, np.array(rows),
                                      np.array(cols), np.array(vals))


def factorize_symbolic_qr(a_sym):
    """Symbolic QR = symbolic cholesky of the AᵀA pattern (``qr.rs:2353``)."""
    a = SparseCscMat(a_sym, np.ones(a_sym.nnz))
    ata = _ata_lower(a)
    return sch.factorize_symbolic_cholesky(ata.symbolic)


def factorize_numeric_qr(a: SparseCscMat, symb=None, *,
                         method: str = "multifrontal") -> SparseQr:
    """Numeric sparse QR.

    ``method="multifrontal"`` (default): Householder R from dense frontal
    QRs of A itself (faer's supernodal Householder, ``qr.rs:305`` — no
    normal-equations squaring); ``method="ata"``: the round-1 Cholesky-of-AᵀA
    stand-in.
    """
    if symb is None:
        symb = factorize_symbolic_qr(a.symbolic)
    if method == "multifrontal":
        from faer_tpu.sparse.multifrontal import qr_numeric_multifrontal

        l = qr_numeric_multifrontal(a, symb)
    else:
        ata = _ata_lower(a)
        l = sch.factorize_numeric_llt(symb, ata)
    return SparseQr(nrows=a.nrows, ncols=a.ncols, symb=symb, r_factor=l, a=a)


def qr_solve_lstsq(f: SparseQr, b):
    """min ‖Ax − b‖ via CSNE with one refinement step."""
    b = np.asarray(b)
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b

    def seminormal(rhs):
        atb = sparse_dense_matmul(f.a.adjoint(), rhs)
        return sch.llt_solve(f.symb, f.r_factor, np.asarray(atb))

    x = seminormal(b2)
    r = b2 - np.asarray(sparse_dense_matmul(f.a, x))
    x = x + seminormal(r)
    return x[:, 0] if squeeze else x
