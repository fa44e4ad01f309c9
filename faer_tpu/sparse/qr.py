"""Sparse QR: multifrontal Householder QR with a direct Qᵀb solve.

Reference parity target: ``faer/src/sparse/linalg/qr.rs`` — symbolic from the
cholesky of AᵀA (``factorize_symbolic_qr`` ``:2353``), supernodal Householder
(``:305``, ``SymbolicSupernodalHouseholder`` ``:317``), simplicial (``:1388``).

The default path computes R AND stores the per-front Householder blocks
(``sparse/multifrontal.py``: frontal dense QRs on the MXU); least squares is
the direct backward-stable ``R⁻¹ (Qᵀ b)`` — the same solve faer's supernodal
Householder performs.  ``method="ata"`` falls back to the Cholesky-of-AᵀA R
with CSNE (corrected semi-normal equations) — cheaper, but limited to
κ(A) ≲ eps^(−1/2) because the normal equations square the condition number.
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
    householder: object = None   # MultifrontalQrHouseholder when stored


def _ata_lower(a: SparseCscMat) -> SparseCscMat:
    at = a.adjoint()
    ata = sparse_sparse_matmul(at, a)
    s = ata.symbolic
    col_of = np.repeat(np.arange(s.ncols, dtype=np.int64),
                       np.diff(s.col_ptr))
    keep = s.row_idx >= col_of
    return SparseCscMat.from_triplets(s.nrows, s.ncols, s.row_idx[keep],
                                      col_of[keep], ata.values[keep])


def factorize_symbolic_qr(a_sym):
    """Symbolic QR = symbolic cholesky of the AᵀA pattern (``qr.rs:2353``)."""
    a = SparseCscMat(a_sym, np.ones(a_sym.nnz))
    ata = _ata_lower(a)
    return sch.factorize_symbolic_cholesky(ata.symbolic)


def factorize_numeric_qr(a: SparseCscMat, symb=None, *,
                         method: str = "multifrontal",
                         keep_householder: bool = True) -> SparseQr:
    """Numeric sparse QR.

    ``method="multifrontal"`` (default): Householder R from dense frontal
    QRs of A itself (faer's supernodal Householder, ``qr.rs:305``), storing
    the frontal reflectors for the direct Qᵀb solve unless
    ``keep_householder=False``; ``method="ata"``: the Cholesky-of-AᵀA
    stand-in (CSNE solves only).
    """
    if symb is None:
        symb = factorize_symbolic_qr(a.symbolic)
    hh = None
    if method == "multifrontal":
        from faer_tpu.sparse.multifrontal import qr_numeric_multifrontal

        l, hh = qr_numeric_multifrontal(a, symb,
                                        keep_householder=keep_householder)
    else:
        ata = _ata_lower(a)
        l = sch.factorize_numeric_llt(symb, ata)
    return SparseQr(nrows=a.nrows, ncols=a.ncols, symb=symb, r_factor=l, a=a,
                    householder=hh)


def qr_solve_lstsq(f: SparseQr, b):
    """min ‖Ax − b‖: direct ``R⁻¹ (Qᵀ b)`` through the stored frontal
    Householders when available, else CSNE with one refinement step."""
    if f.householder is not None:
        return _lstsq_householder(f, b)
    return _lstsq_csne(f, b)


def _lstsq_householder(f: SparseQr, b):
    from faer_tpu.sparse.multifrontal import qr_multifrontal_apply_qt
    from faer_tpu.sparse.triangular_solve import solve_lower_triangular_transpose

    b = np.asarray(b)
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    y = qr_multifrontal_apply_qt(f.householder, b2)     # (n, k), permuted cols
    # R x_p = y with R = Lᵀ (upper): one transpose-lower solve
    xp = solve_lower_triangular_transpose(
        f.r_factor, y, conj=np.iscomplexobj(f.r_factor.values))
    x = np.empty_like(xp)
    x[f.symb.perm] = xp
    return x[:, 0] if squeeze else x


def _lstsq_csne(f: SparseQr, b):
    """CSNE with one refinement step (κ² path — the ``method="ata"`` solve)."""
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
