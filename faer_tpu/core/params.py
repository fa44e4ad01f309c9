"""Per-algorithm parameter structs with dtype-aware ``auto`` defaults.

Reference parity: faer's ``Spec<Config, T>`` + ``Auto<T>`` system
(``faer/src/lib.rs:1164-1230``) — every decomposition takes a params struct
whose defaults may depend on the scalar type. Here each params class is a
frozen dataclass (hashable → usable as a static jit argument) with an
``auto(dtype, shape)`` constructor.

All fields are *static*: they select block sizes / iteration budgets at trace
time and never depend on array values.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from faer_tpu.core import dtypes


def _blocking(n: int, requested: int | None, default: int = 256) -> int:
    b = default if requested is None else requested
    return max(8, min(b, max(n, 1)))


@dataclasses.dataclass(frozen=True)
class MatmulParams:
    """Tile sizes for the Pallas GEMM (faer tunables ``matmul/mod.rs:25-26``)."""

    bm: int = 512
    bn: int = 512
    bk: int = 512

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "MatmulParams":
        return MatmulParams()


@dataclasses.dataclass(frozen=True)
class LltParams:
    """faer ``LltParams`` (``cholesky/llt/factor.rs:40``).

    ``kernel_leaf``: leaf width handed to the Pallas LLT block kernel.
    ``None`` (the default, also what ``auto()`` produces) means 128 — the
    fastest leaf measured on v5e with the v4 kernel (29 µs/leaf vs 72 µs at
    256; full 4096 factor 2.24 ms vs 2.94 ms — tools/r4lab2.py). Explicit
    values are clamped to [128, 512] and rounded up to a multiple of 128 at
    the use site.
    """

    block_size: int | None = None
    recursion_threshold: int = 64
    kernel_leaf: int | None = None

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "LltParams":
        return LltParams()


@dataclasses.dataclass(frozen=True)
class LdltParams:
    block_size: int | None = None
    recursion_threshold: int = 64

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "LdltParams":
        return LdltParams()


@dataclasses.dataclass(frozen=True)
class LbltParams:
    """Bunch-Kaufman params (faer ``bunch_kaufman/factor.rs:8``)."""

    block_size: int | None = None
    pivoting: str = "partial"  # partial (rook upgradeable later)

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "LbltParams":
        return LbltParams()


@dataclasses.dataclass(frozen=True)
class PartialPivLuParams:
    """faer ``PartialPivLuParams`` (``lu/partial_pivoting/factor.rs:190``).

    ``kernel_leaf``: width handed to the Pallas LU panel kernel (``None`` =
    the measured v5e default, see ``lu_in_place``); clamped to [128, 512].
    """

    block_size: int | None = None
    recursion_threshold: int = 64
    kernel_leaf: int | None = None

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "PartialPivLuParams":
        return PartialPivLuParams()


@dataclasses.dataclass(frozen=True)
class FullPivLuParams:
    block_size: int | None = None

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "FullPivLuParams":
        return FullPivLuParams()


@dataclasses.dataclass(frozen=True)
class QrParams:
    """faer ``QrParams`` (``qr/no_pivoting/factor.rs:119``).

    ``kernel_leaf``: width handed to the Pallas QR panel kernel (``None`` =
    the measured v5e default, see ``qr_in_place``); clamped to [128, 512].
    """

    block_size: int | None = None
    kernel_leaf: int | None = None
    # faer: recommended_block_size heuristic (factor.rs:91)

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "QrParams":
        return QrParams()


@dataclasses.dataclass(frozen=True)
class ColPivQrParams:
    block_size: int | None = None

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "ColPivQrParams":
        return ColPivQrParams()


@dataclasses.dataclass(frozen=True)
class SvdParams:
    """faer ``SvdParams`` (``svd/mod.rs:37-57``)."""

    # QR-preprocess when m/n exceeds this (faer qr_ratio_threshold = 11/6)
    qr_ratio_threshold: float = 11.0 / 6.0
    # one-sided block-Jacobi sweep budget (data-independent bound)
    max_sweeps: int = 24
    # bidiag QR-iteration budget multiplier for the bidiag path
    max_iters_per_value: int = 30
    recursion_threshold: int = 128

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "SvdParams":
        return SvdParams()


@dataclasses.dataclass(frozen=True)
class EvdParams:
    """Self-adjoint + general EVD budgets (faer ``evd/mod.rs``)."""

    max_iters_per_value: int = 30
    recursion_threshold: int = 32

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "EvdParams":
        return EvdParams()


@dataclasses.dataclass(frozen=True)
class GevdParams:
    max_iters_per_value: int = 30

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "GevdParams":
        return GevdParams()


@dataclasses.dataclass(frozen=True)
class LltRegularization:
    """Dynamic regularization (faer ``cholesky/llt/factor.rs:8``).

    If ``epsilon > 0``: any pivot ``< delta`` is replaced by ``epsilon`` and
    counted in ``LltInfo.dynamic_regularization_count``.
    """

    epsilon: float = 0.0
    delta: float = 0.0

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "LltRegularization":
        e = dtypes.eps(dtype)
        return LltRegularization(epsilon=e, delta=e)


@dataclasses.dataclass(frozen=True)
class LdltRegularization:
    """Signed dynamic regularization for indefinite LDLT."""

    epsilon: float = 0.0
    delta: float = 0.0

    @staticmethod
    def auto(dtype=jnp.float32, shape=None) -> "LdltRegularization":
        e = dtypes.eps(dtype)
        return LdltRegularization(epsilon=e, delta=e)


def auto(cls, dtype=jnp.float32, shape=None):
    """faer's ``auto!`` macro analogue: dtype-aware default params."""
    return cls.auto(dtype, shape)
