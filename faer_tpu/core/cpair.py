"""Split-complex arithmetic: (re, im) pairs of real arrays.

This TPU runtime rejects complex element types, so every complex-on-TPU code
path (VERDICT round-1 item 3; faer supports c32/c64 in every decomposition,
``faer-traits/src/lib.rs:1224``) runs on PAIRS of real arrays instead.  The
helpers below implement the scalar field: all are elementwise/branchless and
lower to plain VPU ops, so the surrounding algorithms keep identical
structure to their native-complex twins.
"""
from __future__ import annotations

import jax.numpy as jnp


def cmul(a, b):
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def cmulc(a, b):
    """a · conj(b)."""
    ar, ai = a
    br, bi = b
    return ar * br + ai * bi, ai * br - ar * bi


def cconj(a):
    ar, ai = a
    return ar, -ai


def cneg(a):
    return -a[0], -a[1]


def cadd(a, b):
    return a[0] + b[0], a[1] + b[1]


def csub(a, b):
    return a[0] - b[0], a[1] - b[1]


def cabs2(a):
    ar, ai = a
    return ar * ar + ai * ai


def cabs(a):
    return jnp.sqrt(cabs2(a))


def cscale(s, a):
    """real s · complex a."""
    return s * a[0], s * a[1]


def cdiv(a, b):
    ar, ai = a
    br, bi = b
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def csqrt(a):
    """Principal complex square root, branchless."""
    ar, ai = a
    r = jnp.sqrt(ar * ar + ai * ai)
    re = jnp.sqrt(jnp.maximum((r + ar) * 0.5, 0.0))
    im_mag = jnp.sqrt(jnp.maximum((r - ar) * 0.5, 0.0))
    sgn = jnp.where(ai >= 0, jnp.ones_like(ai), -jnp.ones_like(ai))
    return re, sgn * im_mag


def cwhere(pred, a, b):
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def czero_like(a):
    return jnp.zeros_like(a[0]), jnp.zeros_like(a[1])


def cone_like(a):
    return jnp.ones_like(a[0]), jnp.zeros_like(a[1])


def pmatmul(a, b):
    """Pair matrix product with the 3-GEMM (Karatsuba) split:
    (ar·br − ai·bi, (ar+ai)(br+bi) − ar·br − ai·bi) — one real GEMM saved
    over the naive 4."""
    from faer_tpu.ops.matmul import matmul

    ar, ai = a
    br, bi = b
    t1 = matmul(None, ar, br)
    t2 = matmul(None, ai, bi)
    t3 = matmul(None, ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def padjoint(a):
    """Conjugate transpose of a pair matrix."""
    ar, ai = a
    return ar.T, -ai.T


def from_complex(x):
    """Native complex array → (re, im) pair (host/CPU side)."""
    return jnp.real(x), jnp.imag(x)


def to_complex(pair, cdt=None):
    """(re, im) pair → native complex (only on complex-capable devices)."""
    re, im = pair
    if cdt is None:
        from faer_tpu.core import dtypes

        cdt = dtypes.complex_dtype_of(re.dtype)
    return re.astype(cdt) + jnp.asarray(1j, cdt) * im.astype(cdt)
