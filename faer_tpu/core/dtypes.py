"""Dtype policy for the TPU build.

Replaces faer's scalar/SIMD trait layer (``faer-traits/src/lib.rs:1224-1560``):
on TPU, vectorization is owned by XLA/Mosaic, so the trait machinery collapses
to (a) a dtype policy table and (b) a handful of helpers (``conj_maybe``,
``real_dtype_of`` …) that the kernels use to stay generic over
f32/f64/c64/c128/bf16.

Policy:
  * ``float32`` — primary compute dtype; MXU-native (with bf16x3/ f32
    accumulation chosen via ``preferred_element_type``).
  * ``bfloat16`` — storage/throughput dtype for matmul-heavy paths.
  * ``float64`` — supported for correctness via XLA's f64 emulation on TPU
    (slow matmul) and natively on CPU; decompositions accept it everywhere.
  * ``complex64/complex128`` — supported via XLA complex; Pallas kernels
    operate on real pairs, the jnp paths use complex directly.
  * faer's ``fx128`` (double-double) → ``faer_tpu.utils.doubledouble``,
    an opt-in (hi, lo) float pair format for extended precision.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# dtypes the library accepts at the public boundary
SUPPORTED_DTYPES = (
    jnp.bfloat16,
    jnp.float32,
    jnp.float64,
    jnp.complex64,
    jnp.complex128,
)


def canonical(dtype) -> jnp.dtype:
    return jnp.dtype(dtype)


def is_complex(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def real_dtype_of(dtype):
    """The associated real field: c64 → f32, c128 → f64, reals → themselves."""
    d = jnp.dtype(dtype)
    if d == jnp.complex64:
        return jnp.dtype(jnp.float32)
    if d == jnp.complex128:
        return jnp.dtype(jnp.float64)
    return d


def complex_dtype_of(dtype):
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128)):
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def eps(dtype) -> float:
    """Machine epsilon of the associated real dtype (faer ``ApproxEq::eps``)."""
    return float(jnp.finfo(real_dtype_of(dtype)).eps)


def min_positive(dtype) -> float:
    return float(jnp.finfo(real_dtype_of(dtype)).tiny)


def deflation_stall_cap(dtype) -> int:
    """Exponent cap for the progressive deflation floor ``2**(stall // 5)``
    used by the Schur/QZ iterations.

    Keeps the loosened absolute floor at or below ``√eps·‖H‖`` — a bounded
    backward perturbation — in every dtype.  A fixed cap of 24 is fine in
    f64 (eps·2²⁴ ≈ 3.7e-9) but in f32 reaches ~2·‖H‖, so a genuinely
    non-converging matrix would be silently reported converged with O(‖H‖)
    backward error.
    """
    import math

    return min(24, int(-0.5 * math.log2(eps(dtype))))


def conj_maybe(x, conj) -> jnp.ndarray:
    """Conjugate ``x`` iff ``conj`` is ``Conj.YES`` and x is complex.

    This is the TPU analogue of faer's ``Conjugate`` canonical trick
    (``faer-traits/src/lib.rs:847``): conjugation is a trace-time flag, never a
    data copy — XLA fuses the negation of the imaginary part into the consumer.
    """
    from faer_tpu.core.flags import Conj

    if conj is Conj.YES and is_complex(x.dtype):
        return jnp.conj(x)
    return x


def np_rtol(dtype) -> float:
    """Default relative tolerance used by the test comparators."""
    return 8.0 * eps(dtype)


def mxu_accum_dtype(dtype):
    """Accumulation dtype for MXU matmuls (`preferred_element_type`)."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.bfloat16) or d == jnp.dtype(jnp.float32):
        return jnp.float32
    if d == jnp.dtype(jnp.complex64):
        return jnp.complex64
    if d == jnp.dtype(jnp.complex128):
        return jnp.complex128
    return jnp.float64


def asarray_checked(a, name: str = "array"):
    """Convert to a jnp array, rejecting unsupported dtypes early."""
    x = jnp.asarray(a)
    if x.dtype not in (np.dtype(np.float32), np.dtype(np.float64),
                       np.dtype(np.complex64), np.dtype(np.complex128)) \
            and x.dtype != jnp.bfloat16:
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.dtype(bool):
            x = x.astype(jnp.float32)
        else:
            raise TypeError(f"{name}: unsupported dtype {x.dtype}")
    return x
