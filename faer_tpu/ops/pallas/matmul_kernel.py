"""Pallas MXU GEMM tile kernel.

TPU-native replacement for faer's GEMM backends (dispatch at
``faer/src/linalg/matmul/mod.rs:1176-1450``; microkernels ``:60-479``): one
tiled kernel with an (m, n, k) grid, f32 accumulation in VMEM scratch, and the
K-reduction innermost so each (m, n) output tile stays resident while A/B tiles
stream from HBM. Conjugation/transposition are handled at trace time by the
dispatcher (``faer_tpu.ops.matmul``), mirroring faer's ``Conj`` flags.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    from faer_tpu.core.config import config

    if a_ref.dtype == jnp.bfloat16:
        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                              preferred_element_type=jnp.float32)
    elif config.f32_precision == "highest":
        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    else:
        # bf16x3: Mosaic rejects Precision.HIGH, so split each f32 operand
        # into bf16 hi+lo (a = ah + al exactly to ~16 extra mantissa bits)
        # and take three MXU passes: ah·bh + ah·bl + al·bh
        a = a_ref[:]
        b = b_ref[:]
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
        acc += jnp.dot(ah, bl, preferred_element_type=jnp.float32)
        acc += jnp.dot(al, bh, preferred_element_type=jnp.float32)
        acc_ref[:] += acc

    @pl.when(pl.program_id(2) == nk - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def _mm_padded(a, b, bm: int, bn: int, bk: int, out_dtype):
    m, k = a.shape
    _, n = b.shape
    grid = (m // bm, n // bn, k // bk)
    kernel = functools.partial(_mm_kernel, nk=grid[2])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * a.dtype.itemsize + m * n * 4,
            transcendentals=0,
        ),
    )(a, b)


def _pick_block(dim: int, pref: int, align: int) -> int:
    """Largest multiple of ``align`` that is ≤ pref and covers dim if small."""
    if dim <= align:
        return align
    return min(_round_up(dim, align), pref)


def pallas_matmul(a: jax.Array, b: jax.Array, *, out_dtype=None,
                  bm: int = 512, bn: int = 512, bk: int = 512) -> jax.Array:
    """C = A @ B for real f32/bf16 2-D operands via the Pallas MXU kernel.

    Ragged shapes are zero-padded up to tile multiples (zero padding is exact
    for matmul); the result is sliced back.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    out_dtype = out_dtype or a.dtype

    sublane = 16 if a.dtype == jnp.bfloat16 else 8
    bm = _pick_block(m, bm, 128 if m >= 128 else sublane)
    bn = _pick_block(n, bn, 128)
    bk = _pick_block(k, bk, 128)

    mp, kp, np_ = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)
    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    out = _mm_padded(a, b, bm, bn, bk, jnp.dtype(out_dtype))
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
