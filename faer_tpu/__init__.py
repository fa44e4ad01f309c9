"""faer_tpu — a TPU-native dense + sparse linear algebra framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of faer-rs
(https://codeberg.org/sarah-quinones/faer): dense containers, BLAS-3 Pallas
kernels, the full dense decomposition stack, a sparse module, matrix-free
Krylov solvers, stats/RNG, IO, and mesh-sharded execution. See SURVEY.md in
the repo root for the structural map to the reference.
"""
from faer_tpu.core.flags import Accum, BlockStructure, Conj, NanHandling, Norm, Par, Side
from faer_tpu.core.mat import Mat, Scale
from faer_tpu.core.vec import Col, Diag, Row
from faer_tpu.core import dtypes, params, perm
from faer_tpu.core.config import (
    config,
    get_global_parallelism,
    set_global_parallelism,
)
from faer_tpu.core.errors import (
    FaerError,
    NoConvergenceError,
    NonPositivePivotError,
    ShapeError,
    SingularMatrixError,
)

__version__ = "0.1.0"

__all__ = [
    "Accum", "BlockStructure", "Conj", "NanHandling", "Norm", "Par", "Side",
    "Mat", "Scale", "Col", "Row", "Diag", "dtypes", "params", "perm", "config",
    "set_global_parallelism", "get_global_parallelism",
    "FaerError", "NonPositivePivotError", "NoConvergenceError",
    "SingularMatrixError", "ShapeError",
]
