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
