"""Multifrontal (supernodal) sparse QR and LU: dense fronts on the MXU.

Reference parity:
* sparse QR — ``faer/src/sparse/linalg/qr.rs`` supernodal Householder
  (``SymbolicSupernodalHouseholder`` ``:317``, numeric ``:305``): the R
  factor is computed by Householder QR of dense frontal matrices (no AᵀA
  squaring), one front per supernode of the AᵀA elimination tree;
* sparse LU — ``faer/src/sparse/linalg/lu.rs`` supernodal numeric (``:43``):
  dense frontal partial-pivot LU with within-front row pivoting
  (UMFPACK-style restricted pivoting), the U pattern bounded by the AᵀA
  Cholesky pattern (George–Ng).

TPU-native design (SURVEY §2.5): the symbolic phase reuses the supernode
detection of the sparse Cholesky stack; the numeric phase is a host-ordered
postorder sweep where each front is assembled with vectorized numpy
scatter/gather and factorized by the DENSE device kernel stack
(``linalg.qr`` / ``linalg.lu`` panels) padded to MXU-aligned size classes —
EXCEPT tiny fronts (area ≤ 128²), which run in host LAPACK because a device
dispatch costs orders more than their arithmetic (the round-3 wall-time fix;
see BENCH_NOTES).  Contribution blocks flow parent-ward exactly as in the
classical multifrontal method.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from faer_tpu.sparse.cholesky import SymbolicCholesky
from faer_tpu.sparse.csc import SparseCscMat, SymbolicSparseCsc
from faer_tpu.sparse.lu import SparseLu
from faer_tpu.sparse.supernodal import SupernodalSymbolic, _pad_class, detect_supernodes


def _permute_cols(a: SparseCscMat, perm: np.ndarray) -> SparseCscMat:
    """A[:, perm] as CSC (column gather)."""
    s = a.symbolic
    n = s.ncols
    ptr = np.zeros(n + 1, dtype=np.int64)
    idx_parts, val_parts = [], []
    for j in range(n):
        r = s.col_range(int(perm[j]))
        idx_parts.append(s.row_idx[r])
        val_parts.append(a.values[r.start:r.stop])
        ptr[j + 1] = ptr[j] + (r.stop - r.start)
    idx = np.concatenate(idx_parts) if idx_parts else np.zeros(0, np.int64)
    val = np.concatenate(val_parts) if val_parts else np.zeros(0, a.values.dtype)
    return SparseCscMat(SymbolicSparseCsc(s.nrows, n, ptr, idx), val)


def _rows_by_leftmost(ap: SparseCscMat):
    """CSR-style view of A plus each row's leftmost column."""
    s = ap.symbolic
    m, n = s.nrows, s.ncols
    counts = np.zeros(m, dtype=np.int64)
    np.add.at(counts, s.row_idx, 1)
    rptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=rptr[1:])
    rcols = np.empty(s.nnz, dtype=np.int64)
    rvals = np.empty(s.nnz, dtype=ap.values.dtype)
    fill = rptr[:-1].copy()
    for j in range(n):
        r = s.col_range(j)
        rows = s.row_idx[r]
        pos = fill[rows]
        rcols[pos] = j
        rvals[pos] = ap.values[r.start:r.stop]
        fill[rows] += 1
    leftmost = np.full(m, n, dtype=np.int64)
    nz = rptr[1:] > rptr[:-1]
    leftmost[nz] = rcols[rptr[:-1][nz]]
    return rptr, rcols, rvals, leftmost


@dataclasses.dataclass
class FrontHouseholder:
    """One front's stored Householder data (faer
    ``SymbolicSupernodalHouseholder``, ``qr.rs:317``): enough to replay the
    front's orthogonal transform on a right-hand side.

    Small fronts are factorized in host LAPACK (``t_stack is None``, taus
    kept instead — a device dispatch costs more than the arithmetic);
    large fronts carry the device compact-WY blocks."""

    packed: np.ndarray        # (rpad, c) packed V (strict lower) + R (upper)
    t_stack: np.ndarray | None  # compact-WY T blocks from qr_in_place
    block: int                # qr_in_place panel width (host path: = c)
    rows: np.ndarray          # original A-row ids of the leading rows
    children: np.ndarray      # child supernode ids, assembly order
    nr: int                   # assembled rows incl. zero-fill to c (pre-pad)
    c: int                    # front width (pattern size)
    w: int                    # pivot columns
    taus: np.ndarray | None = None   # host-path reflector taus


@dataclasses.dataclass
class MultifrontalQrHouseholder:
    """Per-front Householder storage for the whole factorization, postorder."""

    ssym: SupernodalSymbolic
    fronts: list
    m: int                    # nrows of A


def _assemble_rows(rs, rptr, rcols, rvals, pattern, dtype):
    """Gather A rows ``rs`` into a dense (len(rs), c) block over ``pattern``
    (vectorized: one scatter for all rows of the front)."""
    c = pattern.size
    out = np.zeros((rs.size, c), dtype=dtype)
    if rs.size == 0:
        return out
    lens = rptr[rs + 1] - rptr[rs]
    total = int(lens.sum())
    if total == 0:
        return out
    row_of = np.repeat(np.arange(rs.size, dtype=np.int64), lens)
    first = np.cumsum(lens) - lens
    within = np.arange(total, dtype=np.int64) - first[row_of]
    flat = rptr[rs][row_of] + within
    out[row_of, np.searchsorted(pattern, rcols[flat])] = rvals[flat]
    return out


def _rows_grouped_by_sn(leftmost, col_of_sn, ncols, nsn):
    """rows_of_sn as arrays, original row order preserved within a group."""
    m = leftmost.shape[0]
    live = leftmost < ncols
    rows = np.nonzero(live)[0]
    sn = col_of_sn[leftmost[rows]]
    order = np.argsort(sn, kind="stable")
    rows, sn = rows[order], sn[order]
    starts = np.searchsorted(sn, np.arange(nsn + 1))
    return [rows[starts[s]:starts[s + 1]] for s in range(nsn)]


def qr_numeric_multifrontal(a: SparseCscMat, symb: SymbolicCholesky,
                            ssym: SupernodalSymbolic | None = None, *,
                            keep_householder: bool = False):
    """Householder R of ``A[:, symb.perm]`` via multifrontal QR.

    Returns ``(Rᵀ as a SparseCscMat over symb.l_symbolic, fronts)`` where
    ``fronts`` is a :class:`MultifrontalQrHouseholder` when
    ``keep_householder`` (faer stores the supernodal Householders the same
    way, ``qr.rs:305``/``:317``) and ``None`` otherwise.  R comes from
    orthogonal reductions of A itself — no normal-equations κ² squaring.
    """
    import jax.numpy as jnp

    from faer_tpu.linalg.qr import qr_in_place

    if ssym is None:
        ssym = detect_supernodes(symb)
    ap = _permute_cols(a, symb.perm)
    rptr, rcols, rvals, leftmost = _rows_by_leftmost(ap)
    m = ap.nrows
    ls = symb.l_symbolic
    lvals = np.zeros(ls.nnz, dtype=ap.values.dtype)
    nsn = len(ssym.sn_rows)
    rows_of_sn = _rows_grouped_by_sn(leftmost, ssym.col_of_sn, ap.ncols, nsn)
    contribs: list[list] = [[] for _ in range(nsn)]
    fronts: list = [None] * nsn if keep_householder else []

    for s in range(nsn):
        j0, j1 = int(ssym.sn_start[s]), int(ssym.sn_start[s + 1])
        w = j1 - j0
        pattern = np.asarray(ssym.sn_rows[s], dtype=np.int64)  # front col ids
        c = pattern.size
        rs = rows_of_sn[s]
        blocks = [_assemble_rows(rs, rptr, rcols, rvals, pattern,
                                 ap.values.dtype)]
        children = []
        for child, ccols, cblock in contribs[s]:
            sub = np.zeros((cblock.shape[0], c), dtype=ap.values.dtype)
            sub[:, np.searchsorted(pattern, ccols)] = cblock
            blocks.append(sub)
            children.append(child)
        nr = sum(b.shape[0] for b in blocks)
        f = np.concatenate(blocks, axis=0)
        if nr < c:                      # QR needs >= c rows for a full R
            f = np.concatenate([f, np.zeros((c - nr, c), dtype=f.dtype)])
            nr = c
        rpad = _pad_class(nr)
        fr = np.zeros((rpad, c), dtype=f.dtype)
        fr[:nr] = f
        taus = None
        if rpad * c <= 128 * 128 and not np.iscomplexobj(fr):
            # host LAPACK for tiny fronts: same packed layout + tau
            # convention as qr_in_place (geqrf)
            from scipy.linalg import qr as _scipy_qr

            (packed, taus), _ = _scipy_qr(fr, mode="raw")
            packed = np.ascontiguousarray(packed)
            ts = None
            block = c
        else:
            packed, ts, block = qr_in_place(jnp.asarray(fr))
            packed = np.asarray(packed)
        r_up = np.triu(packed[:c, :c])
        # R rows j0..j1-1: L column j's pattern ⊆ pattern[j-j0:] (equality
        # for fundamental supernodes; strict subset under amalgamation)
        for j in range(j0, j1):
            rj = ls.col_range(j)
            t = j - j0
            lvals[rj.start:rj.stop] = r_up[t][np.searchsorted(
                pattern, ls.row_idx[rj])]
        if c > w:
            parent = int(ssym.col_of_sn[pattern[w]])
            contribs[parent].append((s, pattern[w:], r_up[w:, w:]))
        contribs[s] = []                # free
        if keep_householder:
            fronts[s] = FrontHouseholder(
                packed=packed,
                t_stack=None if ts is None else np.asarray(ts), block=block,
                rows=rs, children=np.asarray(children, dtype=np.int64),
                nr=nr, c=c, w=w, taus=taus)
    r_csc = SparseCscMat(ls, lvals)
    if keep_householder:
        return r_csc, MultifrontalQrHouseholder(ssym=ssym, fronts=fronts, m=m)
    return r_csc, None


def qr_multifrontal_apply_qt(hh: MultifrontalQrHouseholder, b):
    """``Qᵀ b`` restricted to the R rows: returns the (n, k) top block of
    ``Qᵀ b`` in permuted column coordinates (rows j of R ↔ pivot j).

    Replays each front's block-Householder transform on the gathered RHS
    rows — the supernodal Q-apply faer performs in the sparse QR solve
    (``qr.rs:305``); the carry rows w..c flow parent-ward exactly like the
    numeric contribution blocks.
    """
    import jax.numpy as jnp

    from faer_tpu.linalg.qr import qr_apply_q

    ssym = hh.ssym
    b = np.asarray(b)
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    k = b2.shape[1]
    n = ssym.base.n
    y = np.zeros((n, k), dtype=b2.dtype)
    carry: list = [None] * len(hh.fronts)
    for s, fr in enumerate(hh.fronts):
        j0 = int(ssym.sn_start[s])
        blocks = [b2[fr.rows]]
        blocks += [carry[int(ch)] for ch in fr.children]
        rhs = np.concatenate(blocks, axis=0)
        rpad = fr.packed.shape[0]
        rp = np.zeros((rpad, k), dtype=rhs.dtype)
        rp[:rhs.shape[0]] = rhs           # zero-fill rows match the numeric pad
        if fr.t_stack is None:
            # host apply: Qᵀ = H_k…H_1 with LAPACK reflectors
            qtb = rp.copy()
            kref = min(fr.packed.shape)
            for jr in range(kref):
                v = np.zeros(rpad, dtype=rp.dtype)
                v[jr] = 1.0
                v[jr + 1:] = fr.packed[jr + 1:, jr]
                qtb -= fr.taus[jr] * np.outer(v, v @ qtb)
        else:
            qtb = np.asarray(qr_apply_q(jnp.asarray(fr.packed),
                                        jnp.asarray(fr.t_stack), fr.block,
                                        jnp.asarray(rp), adjoint=True))
        y[j0:j0 + fr.w] = qtb[:fr.w]
        carry[s] = qtb[fr.w:fr.c]
        for ch in fr.children:
            carry[int(ch)] = None         # free
    return y[:, 0] if squeeze else y


def lu_numeric_multifrontal(a: SparseCscMat, symb: SymbolicCholesky | None = None,
                            ssym: SupernodalSymbolic | None = None) -> SparseLu:
    """Multifrontal LU with within-front partial pivoting.

    The column order is ``symb.perm`` (fill-reducing on AᵀA); the U pattern
    is bounded by the AᵀA Cholesky pattern (valid for ANY row pivoting —
    George–Ng), and pivot rows are chosen per front among the assembled rows
    (UMFPACK-style restricted pivoting).  Returns a ``SparseLu`` sharing the
    simplicial solve path.
    """
    import jax.numpy as jnp

    from faer_tpu.linalg.lu import _panel_lu_blocked
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.triangular_solve import solve_unit_lower_triangular

    n = a.ncols
    assert a.nrows == n, "sparse LU requires a square matrix"
    if symb is None:
        from faer_tpu.sparse.qr import factorize_symbolic_qr

        symb = factorize_symbolic_qr(a.symbolic)
    if ssym is None:
        ssym = detect_supernodes(symb)
    ap = _permute_cols(a, symb.perm)
    rptr, rcols, rvals, leftmost = _rows_by_leftmost(ap)
    nsn = len(ssym.sn_rows)
    rows_of_sn = _rows_grouped_by_sn(leftmost, ssym.col_of_sn, n, nsn)
    contribs: list[list] = [[] for _ in range(nsn)]

    dtype = ap.values.dtype
    p = np.full(n, -1, dtype=np.int64)          # pivot position -> row id
    u_cols: list[tuple[np.ndarray, np.ndarray]] = [None] * n   # (rows, vals)
    l_cols: list[tuple[np.ndarray, np.ndarray]] = [None] * n   # (orig rows, vals)

    for s in range(nsn):
        j0, j1 = int(ssym.sn_start[s]), int(ssym.sn_start[s + 1])
        w = j1 - j0
        pattern = np.asarray(ssym.sn_rows[s], dtype=np.int64)
        c = pattern.size
        rs = rows_of_sn[s]
        blocks = [_assemble_rows(rs, rptr, rcols, rvals, pattern, dtype)]
        row_ids = list(rs)
        for ccols, cblock, crows in contribs[s]:
            sub = np.zeros((cblock.shape[0], c), dtype=dtype)
            pos = np.searchsorted(pattern, ccols)
            sub[:, pos] = cblock
            blocks.append(sub)
            row_ids.extend(crows)
        nr = len(row_ids)
        if nr < w:
            raise ValueError(
                f"structurally deficient front at supernode {s} ({nr} rows, "
                f"{w} pivots)")
        f = np.concatenate(blocks, axis=0)
        row_ids = np.asarray(row_ids, dtype=np.int64)
        # merge duplicate rows (a row may receive several contributions)
        if np.unique(row_ids).size != row_ids.size:
            uniq, inv = np.unique(row_ids, return_inverse=True)
            fm = np.zeros((uniq.size, c), dtype=dtype)
            np.add.at(fm, inv, f)
            f, row_ids = fm, uniq
            nr = row_ids.size
        # dense partial-pivot LU of the first w columns on device
        rpad = _pad_class(nr)
        fp = np.zeros((rpad, w), dtype=dtype)
        fp[:nr] = f[:, :w]
        if rpad * w <= 128 * 128 and not np.iscomplexobj(fp):
            # host LAPACK for tiny fronts (dispatch overhead dominates)
            from scipy.linalg import lu_factor as _scipy_lu

            pk, piv = _scipy_lu(fp, check_finite=False)
            pl = np.arange(rpad, dtype=np.int64)
            for i, pi in enumerate(piv):
                pl[i], pl[pi] = pl[pi], pl[i]
            packed = np.zeros_like(fp)
            packed[:] = pk
            lperm = pl
            du = np.abs(np.diagonal(pk)[:w])
            ok = bool(np.all(du > 0))
        else:
            packed, lperm, _, ok = _panel_lu_blocked(jnp.asarray(fp), 32)
            lperm = np.asarray(lperm)
            packed = np.asarray(packed)
            ok = bool(ok)
        # keep only the real rows (padding rows sort to the back for pivots
        # chosen among real rows; verify)
        if not ok and nr >= w:
            # padding rows can make ok=False spuriously only if a pivot hit
            # an exact zero among real candidates — treat as singular
            raise ValueError(f"numerically singular front at supernode {s}")
        piv_local = lperm[:w]
        if np.any(piv_local >= nr):
            raise ValueError(f"zero pivot column in supernode {s}")
        l11 = np.tril(packed[:w, :w], -1) + np.eye(w, dtype=dtype)
        u11 = np.triu(packed[:w, :w])
        rest_order = lperm[w:]
        rest_mask = rest_order < nr
        rest_rows = rest_order[rest_mask]
        l21 = packed[w:, :][rest_mask]
        # U12 / Schur on device
        a12 = f[piv_local, w:]
        a22 = f[rest_rows, w:]
        if c > w:
            u12 = np.asarray(solve_unit_lower_triangular(
                jnp.asarray(l11), jnp.asarray(a12)))
            schur = a22 - np.asarray(matmul(
                None, jnp.asarray(l21), jnp.asarray(u12)))
        else:
            u12 = np.zeros((w, 0), dtype=dtype)
            schur = np.zeros((rest_rows.size, 0), dtype=dtype)
        # record pivots / factors
        for t in range(w):
            j = j0 + t
            p[j] = row_ids[piv_local[t]]
            urow = np.concatenate([u11[t, t:], u12[t]])
            u_cols[j] = (pattern[t:], urow)
            lcol_rows = np.concatenate([
                row_ids[piv_local[t + 1:]],
                row_ids[rest_rows]])
            lcol_vals = np.concatenate([l11[t + 1:, t], l21[:, t]])
            l_cols[j] = (lcol_rows, lcol_vals)
        if c > w and rest_rows.size:
            parent = int(ssym.col_of_sn[pattern[w]])
            contribs[parent].append((pattern[w:], schur, row_ids[rest_rows]))
        contribs[s] = []

    # assemble CSC factors; L rows remapped to pivot order
    pinv = np.empty(n, dtype=np.int64)
    pinv[p] = np.arange(n, dtype=np.int64)

    def build(cols, remap: bool, unit: bool):
        ptr = np.zeros(n + 1, dtype=np.int64)
        idx_all, val_all = [], []
        for j in range(n):
            ri, rv = cols[j]
            ri = np.asarray(ri, dtype=np.int64)
            rv = np.asarray(rv, dtype=dtype)
            keep = rv != 0 if ri.size else np.zeros(0, bool)
            ri, rv = ri[keep], rv[keep]
            if remap:
                ri = pinv[ri] if ri.size else ri
            if unit:
                ri = np.concatenate([[j], ri])
                rv = np.concatenate([[1.0], rv]).astype(dtype)
            srt = np.argsort(ri)
            idx_all.append(ri[srt])
            val_all.append(rv[srt])
            ptr[j + 1] = ptr[j] + ri.size
        idx = np.concatenate(idx_all) if idx_all else np.zeros(0, np.int64)
        val = np.concatenate(val_all) if val_all else np.zeros(0, dtype)
        return SparseCscMat(SymbolicSparseCsc(n, n, ptr, idx), val)

    # U columns: u_cols stores ROWS of U per pivot row j; transpose to CSC
    # columns with one vectorized concatenate + stable sort over all nnz
    u_rows = np.concatenate([np.full(u_cols[j][0].size, j, dtype=np.int64)
                             for j in range(n)]) if n else np.zeros(0, np.int64)
    u_colids = np.concatenate([np.asarray(u_cols[j][0], dtype=np.int64)
                               for j in range(n)]) if n else np.zeros(0, np.int64)
    u_vals = np.concatenate([np.asarray(u_cols[j][1], dtype=dtype)
                             for j in range(n)]) if n else np.zeros(0, dtype)
    keepnz = u_vals != 0
    u_rows, u_colids, u_vals = u_rows[keepnz], u_colids[keepnz], u_vals[keepnz]
    order = np.argsort(u_colids, kind="stable")   # rows stay ascending per col
    u_rows, u_colids, u_vals = u_rows[order], u_colids[order], u_vals[order]
    starts = np.searchsorted(u_colids, np.arange(n + 1))
    u_cols_csc = [(u_rows[starts[j]:starts[j + 1]],
                   u_vals[starts[j]:starts[j + 1]]) for j in range(n)]
    l = build(l_cols, remap=True, unit=True)
    u = build(u_cols_csc, remap=False, unit=False)
    return SparseLu(nrows=n, ncols=n, row_perm=p.copy(), col_perm=symb.perm,
                    l=l, u=u)
