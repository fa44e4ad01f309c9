"""``Mat`` — the user-facing array facade.

Reference parity: faer's ``Mat/MatRef/MatMut`` (``faer/src/mat/mod.rs:83-167``)
and the 208 operator impls of ``faer/src/linalg/mat_ops.rs``. On TPU the three
Rust ownership flavors collapse into one immutable facade over ``jax.Array``
(JAX arrays are persistent values; "views" are lazy slices; mutation is
functional update). Branded compile-time dims (``utils/bound.rs``) are replaced
by XLA static shapes.

``Mat`` is a registered pytree, so it passes transparently through ``jit``,
``vmap``, ``grad`` and ``shard_map``. All linalg methods mirror
``faer/src/linalg/solvers.rs:346-634``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.flags import Side


class Mat:
    """Dense matrix facade. ``Mat(a)`` accepts array-likes of rank ≥ 2."""

    __slots__ = ("a",)
    __array_priority__ = 100  # win against raw ndarray in mixed dunders

    def __init__(self, a):
        self.a = a if isinstance(a, jax.Array) else dtypes.asarray_checked(a, "Mat")

    # -- constructors (faer Mat::zeros/identity/from_fn) --------------------
    @staticmethod
    def zeros(nrows: int, ncols: int, dtype=jnp.float32) -> "Mat":
        return Mat(jnp.zeros((nrows, ncols), dtype=dtype))

    @staticmethod
    def ones(nrows: int, ncols: int, dtype=jnp.float32) -> "Mat":
        return Mat(jnp.ones((nrows, ncols), dtype=dtype))

    @staticmethod
    def identity(nrows: int, ncols: int, dtype=jnp.float32) -> "Mat":
        return Mat(jnp.eye(nrows, ncols, dtype=dtype))

    @staticmethod
    def full(nrows: int, ncols: int, value, dtype=jnp.float32) -> "Mat":
        return Mat(jnp.full((nrows, ncols), value, dtype=dtype))

    @staticmethod
    def from_fn(nrows: int, ncols: int, f, dtype=jnp.float32) -> "Mat":
        ii = jnp.arange(nrows)[:, None]
        jj = jnp.arange(ncols)[None, :]
        return Mat(jnp.asarray(f(ii, jj), dtype=dtype))

    # -- basic properties ----------------------------------------------------
    @property
    def shape(self):
        return self.a.shape

    @property
    def nrows(self) -> int:
        return self.a.shape[-2]

    @property
    def ncols(self) -> int:
        return self.a.shape[-1]

    @property
    def dtype(self):
        return self.a.dtype

    @property
    def T(self) -> "Mat":
        return Mat(self.a.mT)

    transpose = T

    @property
    def H(self) -> "Mat":
        return Mat(jnp.conj(self.a.mT))

    adjoint = H

    def conjugate(self) -> "Mat":
        return Mat(jnp.conj(self.a))

    def __array__(self, dtype=None):
        import numpy as np

        return np.asarray(self.a, dtype=dtype)

    def __jax_array__(self):
        return self.a

    def __repr__(self):
        return f"Mat({self.a!r})"

    def __getitem__(self, idx) -> "Mat | jax.Array":
        out = self.a[idx]
        return Mat(out) if getattr(out, "ndim", 0) >= 2 else out

    def at_set(self, idx, value) -> "Mat":
        """Functional update (the TPU analogue of MatMut writes)."""
        return Mat(self.a.at[idx].set(value.a if isinstance(value, Mat) else value))

    def astype(self, dtype) -> "Mat":
        return Mat(self.a.astype(dtype))

    # -- operators (mat_ops.rs parity) ---------------------------------------
    @staticmethod
    def _coerce(x):
        return x.a if isinstance(x, Mat) else x

    def __add__(self, o):
        return Mat(self.a + self._coerce(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Mat(self.a - self._coerce(o))

    def __rsub__(self, o):
        return Mat(self._coerce(o) - self.a)

    def __neg__(self):
        return Mat(-self.a)

    def __mul__(self, o):
        # faer: scalar * mat via Scale; elementwise needs explicit opt-in
        return Mat(self.a * self._coerce(o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return Mat(self.a / self._coerce(o))

    def __matmul__(self, o):
        from faer_tpu.ops.matmul import matmul

        other = self._coerce(o)
        if other.ndim == 1:
            from faer_tpu.ops.matmul import matvec

            return matvec(self.a, other)
        return Mat(matmul(None, self.a, other))

    def __rmatmul__(self, o):
        from faer_tpu.ops.matmul import matmul

        return Mat(matmul(None, self._coerce(o), self.a))

    def __eq__(self, o):  # structural equality on values
        return isinstance(o, Mat) and self.a.shape == o.a.shape and bool(jnp.all(self.a == o.a))

    def __hash__(self):
        return id(self)

    # -- reductions / norms ---------------------------------------------------
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

    def trace(self):
        return jnp.trace(self.a)

    # -- decomposition methods (solvers.rs:346-634) ---------------------------
    def llt(self, side: Side = Side.LOWER):
        from faer_tpu.linalg import solvers

        return solvers.Llt.new(self.a, side)

    def ldlt(self, side: Side = Side.LOWER):
        from faer_tpu.linalg import solvers

        return solvers.Ldlt.new(self.a, side)

    def piv_llt(self, side: Side = Side.LOWER):
        from faer_tpu.linalg import solvers

        return solvers.PivLlt.new(self.a, side)

    def lblt(self, side: Side = Side.LOWER):
        from faer_tpu.linalg import solvers

        return solvers.Lblt.new(self.a, side)

    def partial_piv_lu(self):
        from faer_tpu.linalg import solvers

        return solvers.PartialPivLu.new(self.a)

    def full_piv_lu(self):
        from faer_tpu.linalg import solvers

        return solvers.FullPivLu.new(self.a)

    def qr(self):
        from faer_tpu.linalg import solvers

        return solvers.Qr.new(self.a)

    def col_piv_qr(self):
        from faer_tpu.linalg import solvers

        return solvers.ColPivQr.new(self.a)

    def svd(self):
        from faer_tpu.linalg import solvers

        return solvers.Svd.new(self.a)

    def thin_svd(self):
        from faer_tpu.linalg import solvers

        return solvers.Svd.new(self.a, thin=True)

    def self_adjoint_eigen(self, side: Side = Side.LOWER):
        from faer_tpu.linalg import solvers

        return solvers.SelfAdjointEigen.new(self.a, side)

    def eigen(self):
        from faer_tpu.linalg import solvers

        return solvers.Eigen.new(self.a)

    def generalized_eigen(self, b):
        from faer_tpu.linalg import solvers

        return solvers.GeneralizedEigen.new(self.a, self._coerce(b))

    def singular_values(self):
        from faer_tpu.linalg import svd as _svd

        return _svd.singular_values(self.a)

    def eigenvalues(self):
        from faer_tpu.linalg import evd as _evd

        return _evd.eigenvalues(self.a)

    def self_adjoint_eigenvalues(self, side: Side = Side.LOWER):
        from faer_tpu.linalg import evd as _evd

        return _evd.self_adjoint_eigenvalues(self.a, side)

    def determinant(self):
        from faer_tpu.linalg import solvers

        return solvers.PartialPivLu.new(self.a).determinant()

    def inverse(self):
        from faer_tpu.linalg import solvers

        return Mat(solvers.PartialPivLu.new(self.a).inverse())

    def solve(self, rhs):
        """Square solve via partial-pivot LU (faer ``DenseSolve``)."""
        from faer_tpu.linalg import solvers

        return solvers.PartialPivLu.new(self.a).solve(self._coerce(rhs))

    def solve_lstsq(self, rhs):
        from faer_tpu.linalg import solvers

        return solvers.Qr.new(self.a).solve_lstsq(self._coerce(rhs))

    def rank(self, tol=None):
        from faer_tpu.linalg import svd as _svd

        s = _svd.singular_values(self.a)
        if tol is None:
            tol = jnp.max(s) * max(self.shape) * dtypes.eps(self.dtype)
        return jnp.sum(s > tol)


def _mat_flatten(m: Mat):
    return (m.a,), None


def _mat_unflatten(_, children):
    out = object.__new__(Mat)
    out.a = children[0]
    return out


jax.tree_util.register_pytree_node(Mat, _mat_flatten, _mat_unflatten)


class Scale:
    """faer ``Scale`` wrapper (``lib.rs:1092``) — explicit scalar for ``*``."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __mul__(self, other):
        if isinstance(other, Mat):
            return Mat(other.a * self.value)
        if isinstance(other, Scale):
            return Scale(self.value * other.value)
        return other * self.value

    __rmul__ = __mul__
