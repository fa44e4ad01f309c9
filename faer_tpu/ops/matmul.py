"""GEMM front door with backend dispatch.

Reference parity: ``faer::linalg::matmul::matmul`` (``matmul/mod.rs:1617``) and
its dispatcher ``matmul_imp`` (``:1176``). faer dispatches on size and dtype to
nano-gemm / AVX gemm / generic microkernels; the TPU analogue dispatches on

* size  — tiny products go straight to ``jnp.dot`` (XLA emits an optimal
  single-tile MXU op; a Pallas launch would only add overhead), mirroring the
  nano-gemm threshold (``matmul/mod.rs:16``);
* dtype — f32/bf16 on a TPU backend use the Pallas tile kernel; f64/complex
  (XLA-emulated on TPU) and all CPU execution use ``lax.dot_general``.

``matvec`` / rank-1 special cases (``matmul/mod.rs:1214-1311``) need no special
handling: XLA already lowers rank-deficient dots optimally.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from faer_tpu.core import dtypes
from faer_tpu.core.config import config
from faer_tpu.core.flags import Accum, Conj


def _prep(x, conj, transpose):
    if transpose:
        x = x.mT if x.ndim > 2 else x.T
    return dtypes.conj_maybe(x, conj)


def _precision_for(dtype):
    """f32 data must multiply at near-f32 accuracy (faer numerical parity):
    on TPU the default single bf16 pass fails the 8n·eps tolerance, so f32
    uses bf16x3 (``HIGH``, ~1e-5 rel error) by default or full emulation
    (``HIGHEST``) when ``config.f32_precision = 'highest'``. bf16 data keeps
    the fast single pass.
    """
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        return None
    if config.f32_precision == "highest":
        return lax.Precision.HIGHEST
    return lax.Precision.HIGH


def _xla_matmul(a, b, precision=None):
    return lax.dot_general(
        a, b,
        dimension_numbers=(((a.ndim - 1,), (b.ndim - 2,)), ((), ())),
        preferred_element_type=dtypes.mxu_accum_dtype(a.dtype),
        precision=precision or _precision_for(a.dtype),
    ).astype(a.dtype)


def _use_pallas(a, b) -> bool:
    if not config.pallas_enabled():
        return False
    if a.ndim != 2 or b.ndim != 2:
        return False
    if a.dtype != b.dtype or a.dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    m, k = a.shape
    n = b.shape[1]
    return m * n * k > config.small_matmul_threshold


def matmul(
    acc,
    lhs,
    rhs,
    *,
    alpha=1.0,
    accum: Accum = Accum.REPLACE,
    conj_lhs: Conj = Conj.NO,
    conj_rhs: Conj = Conj.NO,
    transpose_lhs: bool = False,
    transpose_rhs: bool = False,
    precision=None,
):
    """Return ``accum(acc) + alpha * op(lhs) @ op(rhs)``.

    ``acc`` may be ``None`` when ``accum`` is ``REPLACE``. Purely functional
    (faer's in-place ``dst`` becomes the return value). Leading batch
    dimensions broadcast through the XLA path. ``precision`` overrides the
    global f32 MXU policy (sensitivity-critical small GEMMs pin HIGHEST).
    """
    a = _prep(lhs, conj_lhs, transpose_lhs)
    b = _prep(rhs, conj_rhs, transpose_rhs)

    if precision is None and _use_pallas(a, b):
        from faer_tpu.ops.pallas.matmul_kernel import pallas_matmul

        prod = pallas_matmul(a, b)
    else:
        prod = _xla_matmul(a, b, precision=precision)

    if not (isinstance(alpha, (int, float)) and alpha == 1.0):
        prod = prod * jnp.asarray(alpha, dtype=prod.dtype)
    if accum is Accum.ADD:
        if acc is None:
            raise ValueError("Accum.ADD requires an accumulator operand")
        prod = acc + prod
    return prod


def rank_update(acc, u, v, *, alpha=1.0, accum: Accum = Accum.ADD,
                conj_u: Conj = Conj.NO, conj_v: Conj = Conj.YES):
    """Rank-1 update ``acc + alpha * u v^H`` (faer ``matmul/mod.rs:1292``)."""
    uu = dtypes.conj_maybe(jnp.reshape(u, (-1, 1)), conj_u)
    vv = dtypes.conj_maybe(jnp.reshape(v, (1, -1)), conj_v)
    prod = uu * vv
    if not (isinstance(alpha, (int, float)) and alpha == 1.0):
        prod = prod * jnp.asarray(alpha, dtype=prod.dtype)
    return prod if accum is Accum.REPLACE else acc + prod


def matvec(a, x, *, conj_a: Conj = Conj.NO, transpose_a: bool = False):
    """y = op(A) x — thin wrapper, XLA lowers this optimally on its own."""
    aa = _prep(a, conj_a, transpose_a)
    return _xla_matmul(aa, x[:, None])[:, 0] if x.ndim == 1 else _xla_matmul(aa, x)
