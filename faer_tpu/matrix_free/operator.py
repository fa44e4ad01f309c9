"""LinearOperator protocol + adapters.

Reference parity: ``faer/src/operator/mod.rs`` — ``LinOp`` (``:30``, apply /
conj_apply), ``BiLinOp`` (``:177``, + transpose/adjoint apply), ``Precond``
(``:201``) and the dense/sparse/diag impls (``operator/operator_impl/*``).
"""
from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import jax.numpy as jnp

from faer_tpu.ops.matmul import matmul


@runtime_checkable
class LinOp(Protocol):
    """Anything that can apply ``x ↦ A x`` (and optionally the adjoint)."""

    shape: tuple[int, int]

    def apply(self, x):  # (n, k) → (m, k)
        ...

    def adjoint_apply(self, x):  # (m, k) → (n, k)
        ...


class DenseLinOp:
    """faer ``operator_impl`` for MatRef."""

    def __init__(self, a):
        self.a = a
        self.shape = tuple(a.shape)

    def apply(self, x):
        return matmul(None, self.a, x)

    def adjoint_apply(self, x):
        return matmul(None, jnp.conj(self.a).T, x)

    def transpose_apply(self, x):
        return matmul(None, self.a.T, x)

    def conj_apply(self, x):
        return jnp.conj(matmul(None, self.a, jnp.conj(x)))


class DiagLinOp:
    def __init__(self, d):
        self.d = d
        self.shape = (d.shape[0], d.shape[0])

    def apply(self, x):
        return self.d[:, None] * x

    def adjoint_apply(self, x):
        return jnp.conj(self.d)[:, None] * x

    def solve_in_place(self, x):  # Precond interface
        return x / self.d[:, None]


class FnLinOp:
    """Wrap a callable (and optional adjoint callable) as a LinOp."""

    def __init__(self, f: Callable, shape: tuple[int, int],
                 adjoint: Callable | None = None):
        self.f = f
        self.fh = adjoint
        self.shape = shape

    def apply(self, x):
        return self.f(x)

    def adjoint_apply(self, x):
        if self.fh is None:
            raise NotImplementedError("adjoint not provided for FnLinOp")
        return self.fh(x)


class IdentityPrecond:
    """faer ``Precond`` default: M⁻¹ = I."""

    def solve_in_place(self, x):
        return x


class PairDenseLinOp:
    """Complex dense operator over (re, im) pairs — the TPU-native twin of
    ``DenseLinOp`` for complex matrices (no complex dtype touches the chip;
    apply is the 3-GEMM Karatsuba pair product)."""

    def __init__(self, ar, ai):
        self.ar = jnp.asarray(ar)
        self.ai = jnp.asarray(ai)
        self.shape = tuple(self.ar.shape)

    def apply(self, x_pair):
        from faer_tpu.core.cpair import pmatmul

        return pmatmul((self.ar, self.ai), x_pair)

    def adjoint_apply(self, x_pair):
        from faer_tpu.core.cpair import padjoint, pmatmul

        return pmatmul(padjoint((self.ar, self.ai)), x_pair)


class _PairFromComplexOp:
    """Run an arbitrary complex LinOp under the pair runtime: the operator
    application itself uses the native complex dtype (host fallback), but all
    Krylov machinery around it stays in (re, im) pairs."""

    def __init__(self, op):
        self.op = op
        self.shape = op.shape

    def apply(self, x_pair):
        xr, xi = x_pair
        y = self.op.apply((xr + 1j * xi).astype(jnp.complex64)
                          if xr.dtype == jnp.float32
                          else xr + 1j * xi)
        return jnp.real(y).astype(xr.dtype), jnp.imag(y).astype(xr.dtype)


def aslinop_pair(a):
    """Coerce to a pair LinOp: a ``(re, im)`` tuple of dense arrays, a complex
    dense array, an object already applying pairs, or any complex LinOp
    (wrapped so only the raw apply uses the complex dtype)."""
    if isinstance(a, (PairDenseLinOp, _PairFromComplexOp)):
        return a
    if isinstance(a, tuple) and len(a) == 2:
        return PairDenseLinOp(a[0], a[1])
    arr = None
    if hasattr(a, "a"):
        arr = jnp.asarray(a.a)
    elif not (hasattr(a, "apply") and hasattr(a, "shape")):
        arr = jnp.asarray(a)
    if arr is not None:
        if jnp.iscomplexobj(arr):
            return PairDenseLinOp(jnp.real(arr), jnp.imag(arr))
        return PairDenseLinOp(arr, jnp.zeros_like(arr))
    if getattr(a, "is_pair_op", False):
        return a
    return _PairFromComplexOp(aslinop(a))


def aslinop(a) -> LinOp:
    if isinstance(a, (DenseLinOp, DiagLinOp, FnLinOp)):
        return a
    if hasattr(a, "apply") and hasattr(a, "shape"):
        return a
    if hasattr(a, "a"):  # Mat facade
        return DenseLinOp(a.a)
    arr = jnp.asarray(a)
    if arr.ndim == 1:
        return DiagLinOp(arr)
    return DenseLinOp(arr)
