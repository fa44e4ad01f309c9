"""Supernodal intranode Bunch-Kaufman LBLT for indefinite sparse matrices.

Reference parity: ``faer/src/sparse/linalg/cholesky.rs``
``factorize_supernodal_numeric_intranode_lblt`` (``:3457``) — the supernodal
factorization P A Pᵀ = L B Lᴴ where B is block-diagonal (1×1 / 2×2 pivots)
and the Bunch-Kaufman pivot search is restricted WITHIN each supernode's
pivot block (hence "intranode": the L pattern is preserved at supernode
granularity, at the cost of skipping candidates outside the node — faer's
documented trade for keeping the symbolic structure valid).

TPU-native split: like faer, the numeric factor is stored as dense per-node
blocks (node-permuted), because intranode pivoting mixes the node's columns —
a permuted column's off-pivot pattern is the node's *union* pattern, which a
per-column CSC over the simplicial symbolic cannot hold.  The multifrontal
sweep runs on the host (fronts are assembled/consumed once); the pivot-block
Bunch-Kaufman mirrors the dense ``linalg.cholesky.lblt_factor`` contract.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from faer_tpu.sparse.csc import SparseCscMat, permute_self_adjoint
from faer_tpu.sparse.supernodal import SupernodalSymbolic, detect_supernodes


def _np_lblt(a: np.ndarray):
    """Unblocked Bunch-Kaufman of a small Hermitian block (host numpy).

    Returns ``(lb, subdiag, perm, n_zero_pivots)`` with the same packing as
    ``linalg.cholesky.lblt_factor``: unit-L strictly below the diagonal, 1×1
    pivots on the diagonal, ``subdiag[k] != 0`` marking a 2×2 block at k.
    """
    n = a.shape[0]
    a = np.tril(a) + np.conj(np.tril(a, -1)).T
    alpha = (1.0 + np.sqrt(17.0)) / 8.0
    perm = np.arange(n, dtype=np.int64)
    subdiag = np.zeros(n, dtype=a.dtype)
    nzero = 0
    k = 0
    while k < n:
        absakk = abs(a[k, k].real)
        col = np.abs(a[k + 1:, k])
        if col.size:
            r = k + 1 + int(np.argmax(col))
            colmax = float(np.max(col))
        else:
            r, colmax = k, 0.0
        one_by_one = True
        do_swap = False
        if max(absakk, colmax) == 0:
            nzero += 1
        elif absakk >= alpha * colmax:
            pass
        else:
            rowm = np.concatenate([np.abs(a[r, k:r]), np.abs(a[r + 1:, r])])
            rowmax = float(np.max(rowm)) if rowm.size else 0.0
            if absakk * rowmax >= alpha * colmax * colmax:
                pass
            elif abs(a[r, r].real) >= alpha * rowmax:
                one_by_one = True
                do_swap = True
            else:
                one_by_one = False
                do_swap = True
        kp = r if do_swap else k
        swap_row = k if one_by_one else k + 1
        if kp != swap_row:
            a[[swap_row, kp], :] = a[[kp, swap_row], :]
            a[:, [swap_row, kp]] = a[:, [kp, swap_row]]
            perm[[swap_row, kp]] = perm[[kp, swap_row]]
        if one_by_one:
            d = a[k, k].real
            safe = 1.0 if d == 0 else d
            col = a[k + 1:, k] / safe
            a[k + 1:, k + 1:] -= np.outer(col * safe, np.conj(col))
            a[k + 1:, k] = col
            a[k, k + 1:] = np.conj(col)
            k += 1
        else:
            d11, d21, d22 = a[k, k], a[k + 1, k], a[k + 1, k + 1]
            det = (d11 * d22 - d21 * np.conj(d21)).real
            safe = 1.0 if det == 0 else det
            w1 = a[k + 2:, k]
            w2 = a[k + 2:, k + 1]
            i11 = d22.real / safe
            i22 = d11.real / safe
            i21 = -d21 / safe
            l1 = w1 * i11 + w2 * i21
            l2 = w1 * np.conj(i21) + w2 * i22
            a[k + 2:, k + 2:] -= (np.outer(l1, np.conj(w1))
                                  + np.outer(l2, np.conj(w2)))
            a[k + 2:, k] = l1
            a[k + 2:, k + 1] = l2
            a[k, k + 2:] = np.conj(l1)
            a[k + 1, k + 2:] = np.conj(l2)
            subdiag[k] = d21
            k += 2
    return a, subdiag, perm, nzero


def _binv_apply_right(x: np.ndarray, diag: np.ndarray, subdiag: np.ndarray):
    """X · B⁻¹ for block-diagonal Hermitian B = [[d11, d̄21], [d21, d22]]."""
    out = x.copy()
    k = 0
    w = diag.shape[0]
    while k < w:
        if subdiag[k] != 0:
            d11, d21, d22 = diag[k], subdiag[k], diag[k + 1]
            det = (d11 * d22 - d21 * np.conj(d21)).real
            safe = 1.0 if det == 0 else det
            c1 = x[:, k] * (d22.real / safe) + x[:, k + 1] * (-d21 / safe)
            c2 = (x[:, k] * (-np.conj(d21) / safe)
                  + x[:, k + 1] * (d11.real / safe))
            out[:, k], out[:, k + 1] = c1, c2
            k += 2
        else:
            d = diag[k].real
            out[:, k] = x[:, k] / (1.0 if d == 0 else d)
            k += 1
    return out


def _b_apply_right(x: np.ndarray, diag: np.ndarray, subdiag: np.ndarray):
    """X · B."""
    out = x.copy()
    k = 0
    w = diag.shape[0]
    while k < w:
        if subdiag[k] != 0:
            c1 = x[:, k] * diag[k] + x[:, k + 1] * subdiag[k]
            c2 = x[:, k] * np.conj(subdiag[k]) + x[:, k + 1] * diag[k + 1]
            out[:, k], out[:, k + 1] = c1, c2
            k += 2
        else:
            out[:, k] = x[:, k] * diag[k]
            k += 1
    return out


def _binv_apply_left(y: np.ndarray, diag: np.ndarray, subdiag: np.ndarray):
    """B⁻¹ · Y (Y is (n, k)) for the block-diagonal Hermitian B."""
    out = y.copy()
    k = 0
    w = diag.shape[0]
    while k < w:
        if subdiag[k] != 0:
            d11, d21, d22 = diag[k], subdiag[k], diag[k + 1]
            det = (d11 * d22 - d21 * np.conj(d21)).real
            safe = 1.0 if det == 0 else det
            r1 = (y[k] * (d22.real / safe) + y[k + 1] * (-np.conj(d21) / safe))
            r2 = (y[k] * (-d21 / safe) + y[k + 1] * (d11.real / safe))
            out[k], out[k + 1] = r1, r2
            k += 2
        else:
            d = diag[k].real
            out[k] = y[k] / (1.0 if d == 0 else d)
            k += 1
    return out


@dataclasses.dataclass
class SupernodalLblt:
    """Numeric supernodal LBLT: dense node-permuted L blocks + B + perms."""

    ssym: SupernodalSymbolic
    lblocks: list               # per node: (|pattern|, w) [unit-L11; L21]
    diag: np.ndarray            # (n,) diagonal of B (node-permuted order)
    subdiag: np.ndarray         # (n,) 2×2 markers (node-permuted order)
    iperm: np.ndarray           # (n,) intranode permutation (after symb.perm)
    n_zero_pivots: int


def factorize_supernodal_intranode_lblt(
        ssym: SupernodalSymbolic, a: SparseCscMat) -> SupernodalLblt:
    """Multifrontal supernodal LBLT with intranode 2×2 pivoting.

    ``a``: lower triangle of the (unpermuted) Hermitian matrix.  faer
    ``factorize_supernodal_numeric_intranode_lblt`` (``cholesky.rs:3457``).
    """
    symb = ssym.base
    ap = permute_self_adjoint(a, symb.perm)
    asym = ap.symbolic
    n = symb.n
    nsn = len(ssym.sn_rows)
    sn_start = ssym.sn_start
    dt = ap.values.dtype

    diag = np.zeros(n, dtype=dt)
    subdiag = np.zeros(n, dtype=dt)
    iperm = np.arange(n, dtype=np.int64)
    lblocks: list = [None] * nsn
    contribs: list[list] = [[] for _ in range(nsn)]
    nzero = 0

    for s in range(nsn):
        j0, j1 = int(sn_start[s]), int(sn_start[s + 1])
        w = j1 - j0
        pat = np.asarray(ssym.sn_rows[s], dtype=np.int64)
        c = pat.size
        # assemble the symmetric front (lower triangle, then mirror)
        f = np.zeros((c, c), dtype=dt)
        for j in range(j0, j1):
            r = asym.col_range(j)
            ri = asym.row_idx[r]
            keep = ri >= j
            f[np.searchsorted(pat, ri[keep]), j - j0] = ap.values[r][keep]
        for crows, cupd in contribs[s]:
            pp = np.searchsorted(pat, crows)
            if pp.size and (pp[-1] >= pat.size
                            or not np.array_equal(pat[pp], crows)):
                raise ValueError(
                    "supernodal symbolic inconsistency: child update rows "
                    "missing from parent front pattern")
            f[np.ix_(pp, pp)] += cupd
        contribs[s] = []
        f = np.tril(f) + np.conj(np.tril(f, -1)).T

        lb, sd, lperm, nz = _np_lblt(f[:w, :w].copy())
        nzero += nz
        l11 = np.tril(lb, -1) + np.eye(w, dtype=dt)
        # a 2×2 pivot's subdiagonal slot holds d21 (packed), but L itself has
        # an implicit zero there (LAPACK sytrf convention)
        for k in range(w - 1):
            if sd[k] != 0:
                l11[k + 1, k] = 0.0
        d = np.diagonal(lb).copy()
        # L21 B L11ᴴ = A21[:, lperm]  →  L21 = A21ₚ L11⁻ᴴ B⁻¹
        a21p = f[w:, :w][:, lperm]
        if w:
            from scipy.linalg import solve_triangular

            x = (solve_triangular(l11, a21p.conj().T, lower=True,
                                  unit_diagonal=True)).conj().T \
                if a21p.size else a21p
        else:
            x = a21p
        l21 = _binv_apply_right(x, d, sd)
        upd = f[w:, w:] - _b_apply_right(l21, d, sd) @ np.conj(l21).T
        lblocks[s] = np.concatenate([l11, l21], axis=0)
        diag[j0:j1] = d
        subdiag[j0:j1] = sd
        iperm[j0:j1] = j0 + lperm
        if c > w:
            parent = int(ssym.col_of_sn[pat[w]])
            contribs[parent].append((pat[w:], upd))

    return SupernodalLblt(ssym=ssym, lblocks=lblocks, diag=diag,
                          subdiag=subdiag, iperm=iperm, n_zero_pivots=nzero)


def lblt_solve_supernodal(f: SupernodalLblt, b):
    """Solve A x = b from the supernodal LBLT (host sweep).

    Descendant L21 rows are stored by POST-FILL row id (the ancestor's
    intranode permutation is unknown when the descendant factors), so
    cross-node accesses go through the inverse intranode permutation.
    """
    from scipy.linalg import solve_triangular

    ssym = f.ssym
    symb = ssym.base
    b = np.asarray(b)
    squeeze = b.ndim == 1
    x = (b[:, None] if squeeze else b).astype(
        np.result_type(b.dtype, f.diag.dtype), copy=True)
    inv_iperm = np.argsort(f.iperm)
    # overall row order: fill permutation, then intranode
    x = x[symb.perm][f.iperm]
    nsn = len(ssym.sn_rows)
    sn_start = ssym.sn_start
    pats = [np.asarray(r, dtype=np.int64) for r in ssym.sn_rows]

    # forward: L y = x (unit lower, node blocks)
    for s in range(nsn):
        j0, j1 = int(sn_start[s]), int(sn_start[s + 1])
        w = j1 - j0
        blk = f.lblocks[s]
        x[j0:j1] = solve_triangular(blk[:w], x[j0:j1], lower=True,
                                    unit_diagonal=True)
        if blk.shape[0] > w:
            pos = inv_iperm[pats[s][w:]]
            x[pos] -= blk[w:] @ x[j0:j1]
    # block-diagonal solve
    x = _binv_apply_left(x, f.diag, f.subdiag)
    # backward: Lᴴ z = y
    for s in range(nsn - 1, -1, -1):
        j0, j1 = int(sn_start[s]), int(sn_start[s + 1])
        w = j1 - j0
        blk = f.lblocks[s]
        if blk.shape[0] > w:
            pos = inv_iperm[pats[s][w:]]
            x[j0:j1] -= np.conj(blk[w:]).T @ x[pos]
        x[j0:j1] = solve_triangular(np.conj(blk[:w]).T, x[j0:j1], lower=False,
                                    unit_diagonal=True)
    # undo intranode then fill permutation
    y = np.empty_like(x)
    y[f.iperm] = x
    out = np.empty_like(y)
    out[symb.perm] = y
    return out[:, 0] if squeeze else out


def sp_lblt(a: SparseCscMat):
    """Convenience: symbolic + supernodes + intranode LBLT numeric."""
    from faer_tpu.sparse.cholesky import factorize_symbolic_cholesky

    symb = factorize_symbolic_cholesky(a.symbolic)
    ssym = detect_supernodes(symb)
    return factorize_supernodal_intranode_lblt(ssym, a)
