"""IO: .npy (de)serialization + MatrixMarket reader.

Reference parity: ``faer/src/io.rs`` (``Npy`` ``:7``, ``to_mat`` ``:158``) and
the ``matrix-market-rs`` usage in faer's sparse tests
(``sparse/linalg/cholesky.rs:4761``).
"""
from __future__ import annotations

import numpy as np


def load_npy(path):
    """faer ``Npy::to_mat`` analogue — numpy provides the codec natively."""
    return np.load(path)


def save_npy(path, a):
    np.save(path, np.asarray(a))


def load_matrix_market(path):
    """Minimal MatrixMarket reader (coordinate + array, real/complex/integer/
    pattern, general/symmetric/hermitian/skew). Returns a ``SparseCscMat`` for
    coordinate files and a dense ndarray for array files."""
    from faer_tpu.sparse.csc import SparseCscMat

    with open(path) as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise ValueError("not a MatrixMarket file")
        parts = header.split()
        fmt = parts[2].lower()          # coordinate | array
        field = parts[3].lower()        # real | complex | integer | pattern
        symm = parts[4].lower() if len(parts) > 4 else "general"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = line.split()
        nrows, ncols = int(dims[0]), int(dims[1])
        if fmt == "array":
            vals = []
            for line in f:
                line = line.strip()
                if not line or line.startswith("%"):
                    continue
                if field == "complex":
                    re, im = map(float, line.split()[:2])
                    vals.append(re + 1j * im)
                else:
                    vals.append(float(line))
            vals = np.array(vals)
            if symm == "general":
                return vals.reshape((ncols, nrows)).T  # column-major
            # non-general array files store only the lower triangle,
            # column-major: n(n+1)/2 values (strict triangle, n(n-1)/2,
            # for skew-symmetric)
            a = np.zeros((nrows, ncols), dtype=vals.dtype)
            k = 0
            for j in range(ncols):
                start = j + 1 if symm == "skew-symmetric" else j
                cnt = nrows - start
                a[start:, j] = vals[k:k + cnt]
                k += cnt
            if symm == "hermitian":
                a = a + np.conj(np.tril(a, -1)).T
            elif symm == "skew-symmetric":
                a = a - a.T
            else:
                a = a + np.tril(a, -1).T
            return a
        nnz = int(dims[2])
        rows = np.empty(nnz, dtype=np.int64)
        cols = np.empty(nnz, dtype=np.int64)
        dtype = np.complex128 if field == "complex" else np.float64
        vals = np.empty(nnz, dtype=dtype)
        k = 0
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            toks = line.split()
            rows[k] = int(toks[0]) - 1
            cols[k] = int(toks[1]) - 1
            if field == "pattern":
                vals[k] = 1.0
            elif field == "complex":
                vals[k] = float(toks[2]) + 1j * float(toks[3])
            else:
                vals[k] = float(toks[2])
            k += 1
        rows, cols, vals = rows[:k], cols[:k], vals[:k]
        if symm in ("symmetric", "hermitian", "skew-symmetric"):
            off = rows != cols
            r0, c0 = rows[off], cols[off]
            extra_v = vals[off]
            if symm == "hermitian":
                extra_v = np.conj(extra_v)
            elif symm == "skew-symmetric":
                extra_v = -extra_v
            rows = np.concatenate([rows, c0])
            cols = np.concatenate([cols, r0])
            vals = np.concatenate([vals, extra_v])
        return SparseCscMat.from_triplets(nrows, ncols, rows, cols, vals)


def save_matrix_market(path, a):
    """Write a SparseCscMat or dense array in coordinate format."""
    from faer_tpu.sparse.csc import SparseCscMat

    if not isinstance(a, SparseCscMat):
        a = SparseCscMat.from_dense(np.asarray(a))
    s = a.symbolic
    cplx = np.iscomplexobj(a.values)
    field = "complex" if cplx else "real"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        f.write(f"{s.nrows} {s.ncols} {s.nnz}\n")
        for j in range(s.ncols):
            for p in range(int(s.col_ptr[j]), int(s.col_ptr[j + 1])):
                v = a.values[p]
                if cplx:
                    f.write(f"{s.row_idx[p] + 1} {j + 1} {v.real:.17g} {v.imag:.17g}\n")
                else:
                    f.write(f"{s.row_idx[p] + 1} {j + 1} {v:.17g}\n")
