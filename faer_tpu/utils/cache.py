"""Compilation/analysis caching (SURVEY §5.4).

The reference's nearest concepts are symbolic-factorization reuse
(``try_new_with_symbolic``) and rank-r factor updates. The TPU analogues:

* jitted kernels are cached by (shape, dtype, params) automatically by JAX;
* ``enable_persistent_cache`` turns on JAX's on-disk compilation cache so the
  multi-minute 4096² factor compiles survive process restarts;
* sparse symbolic objects are plain picklable Python (cache them yourself or
  via ``cached_symbolic``).
"""
from __future__ import annotations

import hashlib
import os

import numpy as np


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache", "faer_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def pattern_key(col_ptr: np.ndarray, row_idx: np.ndarray) -> str:
    """Stable hash of a sparsity pattern (for symbolic-analysis caches)."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(col_ptr, np.int64).tobytes())
    h.update(np.ascontiguousarray(row_idx, np.int64).tobytes())
    return h.hexdigest()


_symbolic_cache: dict = {}


def cached_symbolic(sym):
    """Memoize ``factorize_symbolic_cholesky`` by pattern hash (faer's
    symbolic-reuse discipline, ``sparse/solvers.rs:95-154``)."""
    from faer_tpu.sparse.cholesky import factorize_symbolic_cholesky

    key = pattern_key(sym.col_ptr, sym.row_idx)
    got = _symbolic_cache.get(key)
    if got is None:
        got = factorize_symbolic_cholesky(sym)
        _symbolic_cache[key] = got
    return got
