"""Structured (triangular) matmul, triangular inverse, and masks.

Reference parity:
* triangular matmul with ``BlockStructure`` operands —
  ``faer/src/linalg/matmul/triangular.rs:1079-1193``;
* blocked triangular inversion — ``faer/src/linalg/triangular_inverse.rs:124-194``.

TPU-native design: faer recurses over sub-blocks to skip the zero triangle.
On the MXU the profitable strategy is different — structure is enforced with
multiplicative masks (VPU work that XLA fuses into the GEMM's operands), and
the full GEMM runs on the MXU. At 50% useful occupancy a dense MXU GEMM still
beats a fine-grained structure-aware schedule; block-level grid skipping is a
later optimization for very large triangles.

The triangular **inverse** is the classic recursive 2×2 block TRTRI:
``inv([[A,0],[B,C]]) = [[inv(A),0],[-inv(C) B inv(A), inv(C)]]`` — log-depth,
all heavy work in GEMMs (MXU), static shapes at every level.
"""
from __future__ import annotations

import jax.numpy as jnp

import jax

from faer_tpu.core import dtypes
from faer_tpu.core.flags import Accum, BlockStructure, Conj
from faer_tpu.ops.matmul import matmul


def _mm_hi(acc, a, b):
    """Inverse-forming GEMMs are sensitivity-critical: error in a triangular
    inverse is amplified by its own (possibly large) norm downstream, so these
    always run at full f32 accumulation regardless of the global policy."""
    return matmul(acc, a, b, precision=jax.lax.Precision.HIGHEST)


def structure_mask(n_rows: int, n_cols: int, structure: BlockStructure, dtype):
    """Multiplicative mask (with unit diagonal substitution handled separately)."""
    if structure is BlockStructure.RECTANGULAR:
        return None
    k = -1 if structure.is_strict else 0
    if structure.is_unit:
        k = -1
    if structure.is_lower:
        m = jnp.tril(jnp.ones((n_rows, n_cols), dtype=dtypes.real_dtype_of(dtype)), k=k)
    else:
        m = jnp.triu(jnp.ones((n_rows, n_cols), dtype=dtypes.real_dtype_of(dtype)), k=-k)
    return m.astype(dtype)


def apply_structure(x, structure: BlockStructure):
    """Zero out the structurally-absent triangle; set unit diagonals to 1."""
    if structure is BlockStructure.RECTANGULAR:
        return x
    mask = structure_mask(x.shape[-2], x.shape[-1], structure, x.dtype)
    y = x * mask
    if structure.is_unit:
        n = min(x.shape[-2], x.shape[-1])
        eye = jnp.eye(x.shape[-2], x.shape[-1], dtype=x.dtype)
        y = y + eye
        del n
    return y


def triangular_matmul(
    acc,
    lhs,
    rhs,
    *,
    dst_structure: BlockStructure = BlockStructure.RECTANGULAR,
    lhs_structure: BlockStructure = BlockStructure.RECTANGULAR,
    rhs_structure: BlockStructure = BlockStructure.RECTANGULAR,
    alpha=1.0,
    accum: Accum = Accum.REPLACE,
    conj_lhs: Conj = Conj.NO,
    conj_rhs: Conj = Conj.NO,
):
    """faer ``triangular::matmul`` (``triangular.rs:1193``), mask-based."""
    a = apply_structure(lhs, lhs_structure)
    b = apply_structure(rhs, rhs_structure)
    prod = matmul(None, a, b, alpha=alpha, conj_lhs=conj_lhs, conj_rhs=conj_rhs)
    if dst_structure is not BlockStructure.RECTANGULAR:
        mask = structure_mask(
            prod.shape[-2], prod.shape[-1],
            # the dst mask keeps the stored triangle incl. diagonal unless strict
            BlockStructure.TRIANGULAR_LOWER if dst_structure.is_lower
            else BlockStructure.TRIANGULAR_UPPER,
            prod.dtype,
        )
        if dst_structure.is_strict or dst_structure.is_unit:
            mask = structure_mask(prod.shape[-2], prod.shape[-1], dst_structure, prod.dtype)
        prod = prod * mask
    if accum is Accum.ADD:
        prod = acc + prod
    return prod


# ---------------------------------------------------------------------------
# triangular inverse (TRTRI)
# ---------------------------------------------------------------------------

_BASE = 32


def _inv_lower_base(t, unit: bool):
    """Matmul-only inverse of a small lower-triangular block.

    Write ``T = diag(d)(I + M)`` with ``M`` strictly lower (nilpotent:
    ``M^n = 0``). Then ``inv(I + M) = Σ (-M)^i`` is a *finite* sum, computed in
    ``⌈log2 n⌉`` doubling steps of two GEMMs each — pure MXU work, no scalar
    substitution loop.
    """
    n = t.shape[0]
    if unit:
        m = jnp.tril(t, k=-1)
        dinv = None
    else:
        d = jnp.diagonal(t)
        m = jnp.tril(t / d[:, None], k=-1)
        dinv = 1.0 / d
    nn = -m
    s = jnp.eye(n, dtype=t.dtype) + nn
    p = nn
    span = 2
    while span < n:
        p = _mm_hi(None, p, p)
        s = s + _mm_hi(None, p, s)
        span *= 2
    if dinv is not None:
        s = s * dinv[None, :].astype(s.dtype)
    # one Newton–Schulz refinement squares the residual of the Neumann sum
    # (X ← X(2I − T X)); keeps the base case at full dtype accuracy.
    tt = jnp.tril(t, k=-1) + jnp.eye(n, dtype=t.dtype) if unit else jnp.tril(t)
    s = s + _mm_hi(None, s, jnp.eye(n, dtype=t.dtype) - _mm_hi(None, tt, s))
    return jnp.tril(s)


def invert_lower_triangular(t, *, unit: bool = False, base: int | None = None):
    """inv(L) for lower-triangular L — recursive blocked TRTRI.

    faer ``invert_lower_triangular`` (``triangular_inverse.rs:124``).
    ``base`` sets the matmul-only doubling base size: larger bases trade a few
    extra MXU FLOPs for far fewer kernel launches (latency-bound on TPU) —
    panel-sized inverses inside the factorizations use ``base = n``.
    """
    n = t.shape[0]
    # Neumann-doubling (both the fused kernel and _inv_lower_base) forms the
    # powers M^k whose entries can grow combinatorially (up to ~C(n−1, k))
    # before nilpotency truncates them — past ~128 this overflows f32 and
    # silently corrupts the inverse (observed: 512-block panel inverses took
    # the 2048+ LU reconstruction error to 1e5).  Cap both at 128; larger
    # blocks use the backward-stable recursive combine below.
    base = min(base or _BASE, 128)
    from faer_tpu.core.config import panel_kernels_enabled

    if n <= 128 and panel_kernels_enabled(t.dtype):
        # single fused Mosaic kernel: ~15 µs vs ~0.3 ms for the dispatched
        # tiny-GEMM chain (each doubling step pays XLA launch latency)
        from faer_tpu.ops.pallas.panel_kernels import trtri_pallas

        return trtri_pallas(t, unit=unit)
    if n <= base:
        return _inv_lower_base(t, unit)
    h = (n + 1) // 2
    a, c = t[:h, :h], t[h:, h:]
    b = t[h:, :h]
    ai = invert_lower_triangular(a, unit=unit, base=base)
    ci = invert_lower_triangular(c, unit=unit, base=base)
    off = -_mm_hi(None, _mm_hi(None, ci, b), ai)
    top = jnp.concatenate([ai, jnp.zeros((h, n - h), dtype=t.dtype)], axis=1)
    bot = jnp.concatenate([off, ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def invert_upper_triangular(t, *, unit: bool = False, base: int | None = None):
    """inv(U) for upper-triangular U (``triangular_inverse.rs:160``)."""
    return invert_lower_triangular(t.T, unit=unit, base=base).T


def invert_unit_lower_triangular(t):
    return invert_lower_triangular(t, unit=True)


def invert_unit_upper_triangular(t):
    return invert_upper_triangular(t, unit=True)
