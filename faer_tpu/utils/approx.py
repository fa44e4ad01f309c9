"""Tolerance comparators for tests.

Reference parity: ``faer/src/utils/approx.rs:6-57`` — the ``~`` comparator with
rule: pass iff ``diff ≤ abs_tol  OR  diff ≤ rel_tol · max(|a|, |b|)``, with
default tolerances ``eps * 8 * n`` scaled by problem size (as used throughout
faer's property tests, e.g. ``cholesky/llt/solve.rs`` test module).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from faer_tpu.core import dtypes


def _eps_of_pair(a, b) -> float:
    """Coarser machine epsilon of the two operands (ignores int/bool)."""
    es = [dtypes.eps(jnp.dtype(x.dtype)) for x in (a, b) if x.dtype.kind in "fc"]
    return max(es) if es else dtypes.eps(jnp.float32)


def approx_eq(a, b, *, abs_tol=None, rel_tol=None, scale: float = 1.0,
              tol_dtype=None) -> bool:
    """faer ``ApproxEq`` / ``CwiseMat`` comparator. ``scale`` ≈ 8·n.

    ``tol_dtype`` pins the eps used for default tolerances to a source dtype
    (useful when the comparison values were promoted, e.g. f32 data checked
    against an f64 oracle)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        return False
    e = (dtypes.eps(jnp.dtype(tol_dtype)) if tol_dtype is not None
         else _eps_of_pair(a, b)) * scale
    abs_tol = e if abs_tol is None else abs_tol
    rel_tol = e if rel_tol is None else rel_tol
    diff = np.abs(a - b)
    bound = np.maximum(np.abs(a), np.abs(b))
    ok = (diff <= abs_tol) | (diff <= rel_tol * bound)
    return bool(np.all(ok))


def assert_approx_eq(a, b, *, abs_tol=None, rel_tol=None, scale: float = 1.0,
                     tol_dtype=None, msg: str = ""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape} {msg}"
    if not approx_eq(a, b, abs_tol=abs_tol, rel_tol=rel_tol, scale=scale,
                     tol_dtype=tol_dtype):
        diff = np.abs(a - b)
        bound = np.maximum(np.abs(a), np.abs(b))
        e = (dtypes.eps(jnp.dtype(tol_dtype)) if tol_dtype is not None
             else _eps_of_pair(a, b)) * scale
        at = e if abs_tol is None else abs_tol
        rt = e if rel_tol is None else rel_tol
        bad = (diff > at) & (diff > rt * bound)
        idx = np.unravel_index(np.argmax(diff * bad), diff.shape)
        raise AssertionError(
            f"approx_eq failed {msg}: {bad.sum()}/{bad.size} entries out of tolerance "
            f"(abs_tol={at:.3e}, rel_tol={rt:.3e}); worst at {idx}: "
            f"{a[idx]!r} vs {b[idx]!r} (diff {diff[idx]:.3e})"
        )


def size_scale(n: int) -> float:
    """Default test tolerance scale: faer uses ``eps * 8 * n``."""
    return 8.0 * max(n, 1)
