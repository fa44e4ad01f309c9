"""Debug guards (SURVEY §5.2).

The reference's safety net is Rust's type system + ``equator`` debug asserts
(``faer/src/lib.rs:1045``). JAX is functional (race freedom by construction);
what remains worth guarding is *numerical* state: shapes (checked eagerly at
the API boundary) and finiteness (checkable under jit via ``checkify``-style
masks). Guards are no-ops unless ``config.debug_guards`` is enabled.
"""
from __future__ import annotations

import os

import jax.numpy as jnp

from faer_tpu.core.errors import ShapeError

_DEBUG = os.environ.get("FAER_TPU_DEBUG", "0") not in ("0", "", "false")


def debug_enabled() -> bool:
    return _DEBUG


def require_square(a, name: str = "matrix"):
    if a.shape[-2] != a.shape[-1]:
        raise ShapeError(f"{name} must be square, got {a.shape}")
    return a


def require_matching(a, b, dim_a: int, dim_b: int, what: str = "operands"):
    if a.shape[dim_a] != b.shape[dim_b]:
        raise ShapeError(
            f"{what}: dimension mismatch {a.shape}[{dim_a}] vs {b.shape}[{dim_b}]")


def assert_all_finite(x, name: str = "array"):
    """Eager finiteness check (host); under jit returns a boolean flag array
    instead (jit cannot raise data-dependent errors — SURVEY §5.3)."""
    finite = jnp.all(jnp.isfinite(x)) if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.all(jnp.isfinite(jnp.real(x)) & jnp.isfinite(jnp.imag(x)))
    if not _DEBUG:
        return finite
    try:
        ok = bool(finite)
    except Exception:
        return finite  # traced: caller consumes the flag
    if not ok:
        raise FloatingPointError(f"{name} contains non-finite values")
    return finite
