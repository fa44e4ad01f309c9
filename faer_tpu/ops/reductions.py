"""Reductions: norms, sums, diagonal products.

Reference parity: ``faer/src/linalg/reductions/*`` — ``norm_l1``, ``norm_l2``
(overflow-safe, ``norm_l2.rs:81,156``), ``norm_l2_sqr``, ``norm_max``, ``sum``,
``determinant``. faer uses a 3-accumulator (small/medium/big) scheme for l2;
the TPU equivalent is max-rescaling — one extra max-reduction pass, fully
fused by XLA, with the same overflow/underflow safety.
"""
from __future__ import annotations

import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.flags import Norm


def norm_max(x):
    a = jnp.abs(x)
    return jnp.max(a.astype(dtypes.real_dtype_of(x.dtype))) if x.size else jnp.zeros((), dtypes.real_dtype_of(x.dtype))


def norm_l1(x):
    return jnp.sum(jnp.abs(x).astype(dtypes.real_dtype_of(x.dtype)))


def norm_l2_sqr(x):
    a = jnp.abs(x).astype(dtypes.real_dtype_of(x.dtype))
    return jnp.sum(a * a)


def norm_l2(x):
    """Overflow/underflow-safe ‖x‖₂ via max rescaling."""
    rdt = dtypes.real_dtype_of(x.dtype)
    a = jnp.abs(x).astype(rdt)
    m = jnp.max(a) if x.size else jnp.zeros((), rdt)
    safe_m = jnp.where(m == 0, jnp.ones_like(m), m)
    scaled = a / safe_m
    return m * jnp.sqrt(jnp.sum(scaled * scaled))


def norm(x, kind: Norm = Norm.L2):
    return {
        Norm.L1: norm_l1,
        Norm.L2: norm_l2,
        Norm.L2_SQR: norm_l2_sqr,
        Norm.MAX: norm_max,
    }[kind](x)


def sum_all(x):
    return jnp.sum(x)


def prod_diag(x):
    """Product of diagonal entries (determinant of a triangular factor)."""
    return jnp.prod(jnp.diagonal(x))


def log_abs_det_diag(x):
    """(sign, log|det|) of a triangular factor — overflow-safe."""
    d = jnp.diagonal(x)
    if dtypes.is_complex(x.dtype):
        mag = jnp.abs(d)
        sign = jnp.prod(jnp.where(mag == 0, jnp.zeros_like(d), d / jnp.where(mag == 0, jnp.ones_like(mag), mag).astype(d.dtype)))
    else:
        sign = jnp.prod(jnp.sign(d))
    return sign, jnp.sum(jnp.log(jnp.abs(d)))
