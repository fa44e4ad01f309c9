"""Coefficient-wise kernel helpers (faer's ``zip!`` framework analogue).

Reference parity: ``faer/src/linalg/zip.rs`` — ``for_each`` (``:2255``) and the
triangular variants (``:2274-2311``). In JAX, lock-step elementwise iteration
is native broadcasting (XLA fuses everything), so this module only supplies the
triangular-restricted variants and an index-aware map.
"""
from __future__ import annotations

import jax.numpy as jnp

from faer_tpu.core import dtypes


def cwise(f, *mats):
    """Elementwise map over matrices in lock step (faer ``zip!().for_each``)."""
    return f(*mats)


def _tri_mask(shape, dtype, lower: bool, strict: bool):
    k = -1 if (strict and lower) else (1 if (strict and not lower) else 0)
    ones = jnp.ones(shape, dtype=dtypes.real_dtype_of(dtype))
    return (jnp.tril(ones, k=k) if lower else jnp.triu(ones, k=k)).astype(dtype)


def cwise_triangular_lower(f, dst, *mats, strict: bool = False):
    """Apply ``f`` only on the (strict) lower triangle; keep dst elsewhere."""
    mask = _tri_mask(dst.shape, dst.dtype, lower=True, strict=strict)
    val = f(dst, *mats)
    return jnp.where(mask != 0, val, dst)


def cwise_triangular_upper(f, dst, *mats, strict: bool = False):
    mask = _tri_mask(dst.shape, dst.dtype, lower=False, strict=strict)
    val = f(dst, *mats)
    return jnp.where(mask != 0, val, dst)


def cwise_with_index(f, mat):
    """f(i, j, a_ij) elementwise (faer ``for_each_with_index``)."""
    m, n = mat.shape[-2:]
    ii = jnp.arange(m)[:, None]
    jj = jnp.arange(n)[None, :]
    return f(ii, jj, mat)


def copy_triangle(dst, src, *, lower: bool, strict: bool = False):
    """Copy one triangle of src into dst, leaving the rest of dst."""
    mask = _tri_mask(dst.shape, dst.dtype, lower=lower, strict=strict)
    return jnp.where(mask != 0, src, dst)


def make_self_adjoint(a, *, from_lower: bool = True):
    """Mirror the given triangle to produce an exactly self-adjoint matrix."""
    if from_lower:
        l = jnp.tril(a)
        return l + jnp.conj(jnp.tril(a, k=-1)).T
    u = jnp.triu(a)
    return u + jnp.conj(jnp.triu(a, k=1)).T


def kron(a, b):
    """Kronecker product (faer ``kron.rs:37``)."""
    return jnp.kron(a, b)
