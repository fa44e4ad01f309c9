"""Typed errors + info structs (reference parity: SURVEY §5.3/§5.5).

faer returns ``Result<Info, Error>`` per algorithm (``LltError::NonPositivePivot``
``cholesky/llt/factor.rs:22``, ``SvdError::NoConvergence`` ``svd/mod.rs:31`` …).
Under ``jit`` JAX cannot raise data-dependent exceptions, so the TPU design is:

* every factorization returns an **info struct** (a pytree of arrays) carrying
  the data-dependent outcome (``dynamic_regularization_count``, ``success``
  flags, iteration counts);
* the *eager* high-level API (``faer_tpu.linalg.solvers``) inspects the info
  and raises the typed exception for ergonomic host-side use;
* jit-ted users consume the flags as arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


class FaerError(Exception):
    """Base class for all faer_tpu errors."""


class NonPositivePivotError(FaerError):
    """LLT hit a non-positive pivot (matrix not positive definite)."""


class NoConvergenceError(FaerError):
    """An iterative spectral algorithm failed to converge within its budget."""


class SingularMatrixError(FaerError):
    """An exactly-singular pivot was encountered where a solve was requested."""


class ShapeError(FaerError, ValueError):
    """Operand shapes are incompatible."""


def _register_info(cls):
    """Register a dataclass info struct as a JAX pytree."""
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(x):
        return tuple(getattr(x, n) for n in fields), None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register_info
@dataclasses.dataclass
class LltInfo:
    """faer ``LltInfo`` (``cholesky/llt/factor.rs:16``)."""

    dynamic_regularization_count: Any
    success: Any  # bool array: all pivots positive


@_register_info
@dataclasses.dataclass
class LdltInfo:
    dynamic_regularization_count: Any
    success: Any


@_register_info
@dataclasses.dataclass
class LbltInfo:
    """Bunch-Kaufman: transposition count parity with faer's ``BunchKaufmanInfo``."""

    dynamic_regularization_count: Any
    transposition_count: Any


@_register_info
@dataclasses.dataclass
class LuInfo:
    """Partial/full-pivot LU transposition bookkeeping.

    ``transposition_count`` is a REAL transposition count (faer
    ``lu/partial_pivoting/factor.rs:224``): the minimal number of
    transpositions composing the row permutation each panel actually applies
    (``core.perm.perm_transposition_count``, n − #cycles), summed across
    panels.  Its parity equals the sign of the overall applied permutation,
    so determinant-sign consumers behave exactly as with faer's swap count.
    """

    transposition_count: Any
    success: Any


@_register_info
@dataclasses.dataclass
class SpectralInfo:
    """SVD/EVD: convergence flag + sweep/iteration count."""

    converged: Any
    iterations: Any


@_register_info
@dataclasses.dataclass
class IterSolveInfo:
    """CG/BiCGSTAB/LSMR info (faer ``CgInfo``/``BicgInfo``/``LsmrInfo``)."""

    converged: Any
    iterations: Any
    residual_norm: Any


@_register_info
@dataclasses.dataclass
class PartialEigenInfo:
    """Krylov-Schur info (faer ``operator/eigen/mod.rs:23``)."""

    n_converged: Any
    iterations: Any
