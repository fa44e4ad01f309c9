"""Native host library loader (C++ sparse symbolic kernels).

Builds ``libfaer_sparse_symbolic.so`` on first use (g++ via the Makefile) and
exposes it through ctypes. All callers fall back to the pure-Python reference
implementations when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfaer_sparse_symbolic.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("FAER_TPU_NO_NATIVE"):
            return None
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_HERE, "sparse_symbolic.cpp"))
            ):
                subprocess.run(["make", "-C", _HERE], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.faer_etree.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
        lib.faer_col_counts.argtypes = [ctypes.c_int64, i64p, i64p, i64p, i64p]
        lib.faer_l_pattern.argtypes = [ctypes.c_int64, i64p, i64p, i64p, i64p, i64p]
        lib.faer_amd_order.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
        lib.faer_colamd_order.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                          i64p, i64p, i64p]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.faer_chol_numeric.argtypes = [ctypes.c_int64, i64p, i64p, f64p,
                                          i64p, i64p, f64p, ctypes.c_int64]
        lib.faer_chol_numeric.restype = ctypes.c_int64
        lib.faer_lower_solve.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                         i64p, i64p, f64p, f64p,
                                         ctypes.c_int64]
        lib.faer_lower_transpose_solve.argtypes = lib.faer_lower_solve.argtypes
        lib.faer_gp_lu.argtypes = [ctypes.c_int64, i64p, i64p, f64p, i64p,
                                   ctypes.c_double, ctypes.c_int64,
                                   i64p, i64p, f64p, i64p, i64p, f64p, i64p]
        lib.faer_gp_lu.restype = ctypes.c_int64
        lib.faer_supernodal_llt.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
            i64p, i64p, f64p, i64p, i64p, f64p]
        lib.faer_supernodal_llt.restype = ctypes.c_int64
        lib.faer_detect_supernodes.argtypes = [
            ctypes.c_int64, i64p, i64p, i64p, i64p,
            ctypes.c_int64, ctypes.c_double, i64p, i64p, i64p]
        lib.faer_detect_supernodes.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def etree(n: int, col_ptr: np.ndarray, row_idx: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int64)
    lib.faer_etree(n, np.ascontiguousarray(col_ptr, np.int64),
                   np.ascontiguousarray(row_idx, np.int64), out)
    return out


def l_pattern(n: int, col_ptr: np.ndarray, row_idx: np.ndarray,
              parent: np.ndarray):
    """Returns (lptr, lrows) — the full symbolic L structure."""
    lib = _load()
    if lib is None:
        return None
    cp = np.ascontiguousarray(col_ptr, np.int64)
    ri = np.ascontiguousarray(row_idx, np.int64)
    pa = np.ascontiguousarray(parent, np.int64)
    counts = np.empty(n, dtype=np.int64)
    lib.faer_col_counts(n, cp, ri, pa, counts)
    lptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=lptr[1:])
    lrows = np.empty(int(lptr[-1]), dtype=np.int64)
    lib.faer_l_pattern(n, cp, ri, pa, lptr, lrows)
    # rows within a column arrive in increasing i already (diagonal first)
    return lptr, lrows


def chol_numeric(n: int, aptr, arow, aval, lptr, lrow, *, ldlt: bool = False):
    """Left-looking simplicial LLT/LDLT numeric in C++ (f64 real values).
    Returns lval, or None when the native lib is unavailable; raises
    ValueError on a non-positive LLT pivot."""
    lib = _load()
    if lib is None or np.iscomplexobj(aval):
        return None
    lval = np.zeros(int(lptr[-1]), dtype=np.float64)
    rc = lib.faer_chol_numeric(
        n, np.ascontiguousarray(aptr, np.int64),
        np.ascontiguousarray(arow, np.int64),
        np.ascontiguousarray(aval, np.float64),
        np.ascontiguousarray(lptr, np.int64),
        np.ascontiguousarray(lrow, np.int64), lval, 1 if ldlt else 0)
    if rc != 0:
        raise ValueError(f"non-positive pivot at column {int(rc) - 1}")
    return lval


def gp_lu(n: int, aptr, arow, aval, col_perm, *, pivot_threshold: float = 1.0):
    """Gilbert-Peierls LU numeric in C++ (f64 real).  Returns
    ``(lptr, lrow_orig, lval, uptr, urow, uval, rowperm)`` — L rows are
    ORIGINAL row ids (caller remaps), U rows are pivot positions — or None
    when the native lib is unavailable; raises on singularity."""
    lib = _load()
    if lib is None or np.iscomplexobj(aval):
        return None
    aptr = np.ascontiguousarray(aptr, np.int64)
    arow = np.ascontiguousarray(arow, np.int64)
    aval = np.ascontiguousarray(aval, np.float64)
    cp = np.ascontiguousarray(col_perm, np.int64)
    cap = max(8 * aval.size, 16 * n)
    for _ in range(8):
        lptr = np.zeros(n + 1, dtype=np.int64)
        uptr = np.zeros(n + 1, dtype=np.int64)
        lrow = np.empty(cap, dtype=np.int64)
        lval = np.empty(cap, dtype=np.float64)
        urow = np.empty(cap, dtype=np.int64)
        uval = np.empty(cap, dtype=np.float64)
        rowperm = np.empty(n, dtype=np.int64)
        rc = lib.faer_gp_lu(n, aptr, arow, aval, cp,
                            float(pivot_threshold), cap,
                            lptr, lrow, lval, uptr, urow, uval, rowperm)
        if rc == 0:
            nl, nu = int(lptr[-1]), int(uptr[-1])
            return (lptr, lrow[:nl], lval[:nl], uptr, urow[:nu], uval[:nu],
                    rowperm)
        if rc > 0:
            raise ValueError(f"singular at column {int(rc) - 1}")
        cap = max(int(-rc), cap * 2)
    return None  # pragma: no cover - capacity runaway


def detect_supernodes(n: int, parent, counts, lptr, lrow, *, relax: int,
                      relax_ratio: float):
    """Fundamental supernodes + relaxed amalgamation in C++. Returns
    ``(sn_start, sn_rptr, sn_rows)`` or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    lptr = np.ascontiguousarray(lptr, np.int64)
    cap = int(lptr[-1]) + n + 1
    sn_start = np.empty(n + 2, dtype=np.int64)
    sn_rptr = np.empty(n + 2, dtype=np.int64)
    sn_rows = np.empty(cap, dtype=np.int64)
    nsn = lib.faer_detect_supernodes(
        n, np.ascontiguousarray(parent, np.int64),
        np.ascontiguousarray(counts, np.int64), lptr,
        np.ascontiguousarray(lrow, np.int64), int(relax),
        float(relax_ratio), sn_start, sn_rptr, sn_rows)
    nsn = int(nsn)
    return (sn_start[:nsn + 1].copy(), sn_rptr[:nsn + 1].copy(),
            sn_rows[:int(sn_rptr[nsn])].copy())


def supernodal_llt(n: int, sn_start, sn_rptr, sn_rows, aptr, arow, aval,
                   lptr, lrow):
    """Left-looking supernodal LLT numeric in C++ (f64 real). Returns lval
    over the L pattern, or None when unavailable; raises ValueError on a
    non-positive pivot."""
    lib = _load()
    if lib is None or np.iscomplexobj(aval):
        return None
    sn_start = np.ascontiguousarray(sn_start, np.int64)
    nsn = sn_start.size - 1
    lptr = np.ascontiguousarray(lptr, np.int64)
    lval = np.zeros(int(lptr[-1]), dtype=np.float64)
    rc = lib.faer_supernodal_llt(
        n, nsn, sn_start,
        np.ascontiguousarray(sn_rptr, np.int64),
        np.ascontiguousarray(sn_rows, np.int64),
        np.ascontiguousarray(aptr, np.int64),
        np.ascontiguousarray(arow, np.int64),
        np.ascontiguousarray(aval, np.float64),
        lptr, np.ascontiguousarray(lrow, np.int64), lval)
    if rc != 0:
        raise ValueError(f"non-positive pivot in supernode {int(rc) - 1}")
    return lval


def lower_solve(n, lptr, lrow, lval, b, *, unit: bool = False,
                transpose: bool = False):
    """CSC (unit-)lower triangular solve in C++; returns x or None."""
    lib = _load()
    if lib is None or np.iscomplexobj(lval) or np.iscomplexobj(b):
        return None
    squeeze = b.ndim == 1
    x = np.asfortranarray(np.asarray(b, np.float64).reshape(n, -1))
    # fortran layout = column-major contiguous per RHS
    xc = np.ascontiguousarray(x.T).reshape(-1)
    fn = lib.faer_lower_transpose_solve if transpose else lib.faer_lower_solve
    fn(n, x.shape[1], np.ascontiguousarray(lptr, np.int64),
       np.ascontiguousarray(lrow, np.int64),
       np.ascontiguousarray(lval, np.float64), xc, 1 if unit else 0)
    out = xc.reshape(x.shape[1], n).T
    return out[:, 0] if squeeze else out


def amd_order(n: int, col_ptr: np.ndarray, row_idx: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int64)
    lib.faer_amd_order(n, np.ascontiguousarray(col_ptr, np.int64),
                       np.ascontiguousarray(row_idx, np.int64), out)
    return out


def colamd_order(m: int, n: int, col_ptr: np.ndarray, row_idx: np.ndarray):
    """Column approximate minimum degree (rows as quotient-graph cliques,
    faer ``colamd.rs:98``). Returns the column permutation or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int64)
    lib.faer_colamd_order(m, n, np.ascontiguousarray(col_ptr, np.int64),
                          np.ascontiguousarray(row_idx, np.int64), out)
    return out
