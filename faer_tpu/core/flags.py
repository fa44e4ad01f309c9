"""Execution / semantics flags shared by every kernel and decomposition.

Reference parity: faer's ``Accum`` (``faer/src/lib.rs:869``), ``Conj``
(``faer/src/lib.rs``), ``Side``, ``Par`` (``faer/src/lib.rs:929``) and the
``BlockStructure`` enum of the triangular matmul
(``faer/src/linalg/matmul/triangular.rs:906``).

TPU-native design notes: these are *static* Python enums — they are resolved at
trace time so XLA sees straight-line code with no data-dependent branching.
``Par`` exists for API parity; on TPU the intra-chip parallelism is implicit
(Pallas grids / XLA fusion) and cross-chip parallelism lives in
``faer_tpu.parallel``.
"""
from __future__ import annotations

import enum


class Accum(enum.Enum):
    """What to do with the existing destination value: ``dst = acc ⊕ a·b``."""

    REPLACE = 0
    ADD = 1


class Conj(enum.Enum):
    """Whether an operand is implicitly conjugated."""

    NO = 0
    YES = 1

    @property
    def flip(self) -> "Conj":
        return Conj.YES if self is Conj.NO else Conj.NO


class Side(enum.Enum):
    """Which triangle of a self-adjoint matrix the input data lives in."""

    LOWER = 0
    UPPER = 1


class Par(enum.Enum):
    """Parallelism policy (API parity with faer's ``Par::Seq | Par::Rayon``).

    On TPU both values compile to the same program: a single chip executes
    Pallas grids / fused XLA ops with full internal parallelism either way.
    Kept so code written against faer's call shape ports 1:1.
    """

    SEQ = 0
    AUTO = 1


class BlockStructure(enum.Enum):
    """Structure of a matmul operand/destination block.

    Mirrors ``faer/src/linalg/matmul/triangular.rs:906``. On TPU, structure is
    enforced by multiplicative masks generated per tile (cheap VPU work fused
    into the GEMM epilogue) rather than by recursion over sub-blocks.
    """

    RECTANGULAR = 0
    TRIANGULAR_LOWER = 1
    TRIANGULAR_UPPER = 2
    STRICT_TRIANGULAR_LOWER = 3
    STRICT_TRIANGULAR_UPPER = 4
    UNIT_TRIANGULAR_LOWER = 5
    UNIT_TRIANGULAR_UPPER = 6

    @property
    def is_lower(self) -> bool:
        return self in (
            BlockStructure.TRIANGULAR_LOWER,
            BlockStructure.STRICT_TRIANGULAR_LOWER,
            BlockStructure.UNIT_TRIANGULAR_LOWER,
        )

    @property
    def is_upper(self) -> bool:
        return self in (
            BlockStructure.TRIANGULAR_UPPER,
            BlockStructure.STRICT_TRIANGULAR_UPPER,
            BlockStructure.UNIT_TRIANGULAR_UPPER,
        )

    @property
    def is_strict(self) -> bool:
        return self in (
            BlockStructure.STRICT_TRIANGULAR_LOWER,
            BlockStructure.STRICT_TRIANGULAR_UPPER,
        )

    @property
    def is_unit(self) -> bool:
        return self in (
            BlockStructure.UNIT_TRIANGULAR_LOWER,
            BlockStructure.UNIT_TRIANGULAR_UPPER,
        )

    @property
    def transpose(self) -> "BlockStructure":
        _T = {
            BlockStructure.RECTANGULAR: BlockStructure.RECTANGULAR,
            BlockStructure.TRIANGULAR_LOWER: BlockStructure.TRIANGULAR_UPPER,
            BlockStructure.TRIANGULAR_UPPER: BlockStructure.TRIANGULAR_LOWER,
            BlockStructure.STRICT_TRIANGULAR_LOWER: BlockStructure.STRICT_TRIANGULAR_UPPER,
            BlockStructure.STRICT_TRIANGULAR_UPPER: BlockStructure.STRICT_TRIANGULAR_LOWER,
            BlockStructure.UNIT_TRIANGULAR_LOWER: BlockStructure.UNIT_TRIANGULAR_UPPER,
            BlockStructure.UNIT_TRIANGULAR_UPPER: BlockStructure.UNIT_TRIANGULAR_LOWER,
        }
        return _T[self]


class Norm(enum.Enum):
    """Norm selector for ``faer_tpu.ops.reductions.norm``."""

    L1 = 0
    L2 = 1
    L2_SQR = 2
    MAX = 3


class NanHandling(enum.Enum):
    """NaN policy for stats mean/var (faer ``stats/mod.rs:3``)."""

    PROPAGATE = 0
    IGNORE = 1
