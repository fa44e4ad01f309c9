"""Col / Row / Diag facades.

Reference parity: faer's ``Col/Row/Diag`` trios (``faer/src/col``, ``row``,
``diag/mod.rs:28``). One immutable facade each over a 1-D ``jax.Array``;
the Own/Ref/Mut distinction collapses under JAX value semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core.mat import Mat


class _Vec:
    __slots__ = ("a",)
    __array_priority__ = 100

    def __init__(self, a):
        a = a.a if isinstance(a, _Vec) else jnp.asarray(a)
        if a.ndim != 1:
            raise ValueError(f"{type(self).__name__} expects a 1-D array, got {a.shape}")
        self.a = a

    def __len__(self):
        return self.a.shape[0]

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def __array__(self, dtype=None):
        import numpy as np

        return np.asarray(self.a, dtype=dtype)

    def __jax_array__(self):
        return self.a

    def __getitem__(self, i):
        return self.a[i]

    def __repr__(self):
        return f"{type(self).__name__}({self.a!r})"

    @staticmethod
    def _coerce(x):
        return x.a if isinstance(x, (_Vec, Mat)) else x

    def norm_l1(self):
        from faer_tpu.ops import reductions

        return reductions.norm_l1(self.a)

    def norm_l2(self):
        from faer_tpu.ops import reductions

        return reductions.norm_l2(self.a)

    def norm_max(self):
        from faer_tpu.ops import reductions

        return reductions.norm_max(self.a)

    def sum(self):
        return jnp.sum(self.a)


class Col(_Vec):
    """Column vector (faer ``Col``)."""

    @staticmethod
    def zeros(n, dtype=jnp.float32):
        return Col(jnp.zeros((n,), dtype))

    @staticmethod
    def ones(n, dtype=jnp.float32):
        return Col(jnp.ones((n,), dtype))

    @staticmethod
    def from_fn(n, f, dtype=jnp.float32):
        return Col(jnp.asarray(f(jnp.arange(n)), dtype=dtype))

    @property
    def T(self) -> "Row":
        return Row(self.a)

    transpose = T

    @property
    def H(self) -> "Row":
        return Row(jnp.conj(self.a))

    adjoint = H

    def as_mat(self) -> Mat:
        return Mat(self.a[:, None])

    def __add__(self, o):
        return Col(self.a + self._coerce(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Col(self.a - self._coerce(o))

    def __rsub__(self, o):
        return Col(self._coerce(o) - self.a)

    def __mul__(self, o):
        return Col(self.a * self._coerce(o))

    __rmul__ = __mul__

    def __neg__(self):
        return Col(-self.a)

    def __matmul__(self, o):  # inner with Row gives Mat, with Col invalid
        other = self._coerce(o)
        if other.ndim == 1:
            raise ValueError("Col @ Col is not defined; use col.T @ col")
        return Mat(self.a[:, None] @ other)


class Row(_Vec):
    """Row vector (faer ``Row``)."""

    @staticmethod
    def zeros(n, dtype=jnp.float32):
        return Row(jnp.zeros((n,), dtype))

    @property
    def T(self) -> Col:
        return Col(self.a)

    transpose = T

    @property
    def H(self) -> Col:
        return Col(jnp.conj(self.a))

    adjoint = H

    def as_mat(self) -> Mat:
        return Mat(self.a[None, :])

    def __add__(self, o):
        return Row(self.a + self._coerce(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Row(self.a - self._coerce(o))

    def __mul__(self, o):
        return Row(self.a * self._coerce(o))

    __rmul__ = __mul__

    def __neg__(self):
        return Row(-self.a)

    def __matmul__(self, o):
        other = self._coerce(o)
        if other.ndim == 1:  # Row @ Col = scalar
            return jnp.sum(self.a * other)
        return Row((self.a[None, :] @ other)[0])


class Diag(_Vec):
    """Diagonal matrix wrapper over a vector (faer ``Diag``)."""

    def column_vector(self) -> Col:
        return Col(self.a)

    def as_mat(self) -> Mat:
        return Mat(jnp.diag(self.a))

    def inverse(self) -> "Diag":
        return Diag(1.0 / self.a)

    def __matmul__(self, o):
        other = self._coerce(o)
        if other.ndim == 1:
            return Col(self.a * other)
        return Mat(self.a[:, None] * other)

    def __rmatmul__(self, o):
        other = self._coerce(o)
        if other.ndim == 1:
            return Row(other * self.a)
        return Mat(other * self.a[None, :])

    def __mul__(self, o):
        return Diag(self.a * self._coerce(o))

    __rmul__ = __mul__


for _cls in (Col, Row, Diag):
    jax.tree_util.register_pytree_node(
        _cls,
        lambda v: ((v.a,), None),
        lambda _, c, cls=_cls: cls(c[0]),
    )
