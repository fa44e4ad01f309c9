"""Double-word ("double-double") extended precision arithmetic.

Reference parity: faer's ``fx128`` dtype (``faer-traits/src/lib.rs:5108``,
double-double module ``:5329+``) — an opt-in scalar type with ~2× the mantissa
of the base float, built from error-free transformations (two_sum / two_prod).

TPU-native design: a DD number is a pytree pair ``(hi, lo)`` of same-shape
arrays. On TPU the natural base is float32 (giving ≈ 48-bit mantissa — "f64
via double-word", SURVEY §2.2 dtype policy), and two_prod uses the fused
split-free FMA identity via ``jnp.float32`` mul + remainder in f32 pairs.
All ops are elementwise and vectorize on the VPU.

Backend note: on **TPU** the error-free transformations hold under ``jit``
(verified: composed DD GEMM reaches ~1e-14 rel. error). The **CPU** backend's
LLVM pipeline can contract/reassociate across fused DD ops at its default
optimization level, degrading composed expressions to single precision even
through ``optimization_barrier`` (set ``XLA_FLAGS=--xla_backend_optimization_level=0``
to restore full accuracy on CPU).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DD(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape


def from_float(x) -> DD:
    x = jnp.asarray(x)
    return DD(x, jnp.zeros_like(x))


def from_f64(x, base=jnp.float32) -> DD:
    """Split a float64 value into a base-precision double-word pair."""
    import numpy as np

    x = np.asarray(x, np.float64)
    hi = x.astype(base)
    lo = (x - hi.astype(np.float64)).astype(base)
    return DD(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(a: DD):
    import numpy as np

    return np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)


def _rnd(x):
    """Force the value to be materialized at its nominal precision.

    XLA's ``allow_excess_precision`` (on by default in this environment) keeps
    f32 chains in wider registers inside a fused computation, which silently
    destroys error-free transformations; an optimization barrier pins each
    intermediate to true f32.
    """
    return jax.lax.optimization_barrier(x)


def _two_sum(a, b):
    s = _rnd(a + b)
    bb = _rnd(s - a)
    err = _rnd(a - _rnd(s - bb)) + _rnd(b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = _rnd(a + b)
    err = b - _rnd(s - a)
    return s, err


def _split_const(dtype):
    # Dekker splitter: 2^ceil(p/2) + 1 (p = mantissa bits)
    mant = jnp.finfo(dtype).nmant
    return float(2 ** ((mant + 1) // 2 + 1) + 1)


def _two_prod(a, b):
    p = _rnd(a * b)
    sp = jnp.asarray(_split_const(a.dtype), a.dtype)
    aa = _rnd(sp * a)
    ahi = _rnd(aa - _rnd(aa - a))
    alo = _rnd(a - ahi)
    bb = _rnd(sp * b)
    bhi = _rnd(bb - _rnd(bb - b))
    blo = _rnd(b - bhi)
    err = (_rnd(ahi * bhi - p) + _rnd(ahi * blo) + _rnd(alo * bhi)) + _rnd(alo * blo)
    return p, err


def add(a: DD, b: DD) -> DD:
    s, e = _two_sum(a.hi, b.hi)
    e = e + a.lo + b.lo
    hi, lo = _quick_two_sum(s, e)
    return DD(hi, lo)


def sub(a: DD, b: DD) -> DD:
    return add(a, neg(b))


def neg(a: DD) -> DD:
    return DD(-a.hi, -a.lo)


def mul(a: DD, b: DD) -> DD:
    p, e = _two_prod(a.hi, b.hi)
    e = e + a.hi * b.lo + a.lo * b.hi
    hi, lo = _quick_two_sum(p, e)
    return DD(hi, lo)


def div(a: DD, b: DD) -> DD:
    q1 = a.hi / b.hi
    r = sub(a, mul(from_float(q1), b))
    q2 = r.hi / b.hi
    r = sub(r, mul(from_float(q2), b))
    q3 = r.hi / b.hi
    hi, lo = _quick_two_sum(q1, q2)
    hi, lo2 = _quick_two_sum(hi, lo + q3)
    return DD(hi, lo2)


def sqrt(a: DD) -> DD:
    """Newton on 1/√x (one DD-refinement from the float seed)."""
    x0 = jnp.sqrt(a.hi)
    s = from_float(x0)
    # s ← s + (a − s²) / (2 s)
    r = sub(a, mul(s, s))
    corr = r.hi / (2.0 * x0)
    hi, lo = _quick_two_sum(s.hi, s.lo + corr)
    return DD(hi, lo)


def abs_(a: DD) -> DD:
    flip = a.hi < 0
    return DD(jnp.where(flip, -a.hi, a.hi), jnp.where(flip, -a.lo, a.lo))


def matmul_dd(a: DD, b: DD) -> DD:
    """Double-word GEMM via elementwise DD ops (VPU; O(n³) scalar work —
    the extended-precision path trades MXU speed for 2× mantissa, like faer's
    fx128 which runs on the generic microkernel path)."""
    m, k = a.hi.shape
    k2, n = b.hi.shape
    assert k == k2

    def body(p, acc):
        col = DD(a.hi[:, p][:, None], a.lo[:, p][:, None])
        row = DD(b.hi[p, :][None, :], b.lo[p, :][None, :])
        return add(acc, mul(col, row))

    acc0 = DD(jnp.zeros((m, n), a.hi.dtype), jnp.zeros((m, n), a.hi.dtype))
    return jax.lax.fori_loop(0, k, body, acc0)
