"""Pallas SYRK-lower kernel: C ← C − A·Aᵀ computed on LOWER tiles only.

faer's Cholesky trailing update is a true *syrk* — only the lower half of
``A22 − L21·L21ᵀ`` is ever formed (``faer/src/linalg/matmul/triangular.rs``
``BlockStructure::TriangularLower`` dispatch).  The XLA path here had to issue
a FULL square GEMM (``matmul(l21, l21.T)``), spending 2·M²·K MXU flops where
M²·K suffice — at n = 4096, block 256, that is ~46 GF of a 23 GF-credited
factorization.  This kernel restores the syrk saving the TPU way: a 1-D
packed grid over the lower tile pairs (i ≥ j), tile coordinates delivered via
scalar prefetch, one NT ``dot_general`` per (tile, k-slab) on the MXU, and the
untouched upper tiles keep their input values through input/output aliasing.

Precision follows the library's f32 GEMM policy (bf16x3 split, or one
HIGHEST-precision pass when configured) — same numerics as ``pallas_matmul``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT_DIMS = (((1,), (1,)), ((), ()))  # contract on axis 1 of both: A_i · A_jᵀ


def _dot_nt(a, b, highest: bool):
    if a.dtype == jnp.bfloat16:
        return jax.lax.dot_general(a, b, _NT_DIMS,
                                   preferred_element_type=jnp.float32)
    if highest:
        return jax.lax.dot_general(a, b, _NT_DIMS,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    # bf16x3 (see matmul_kernel._mm_kernel): ah·bh + ah·bl + al·bh
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(ah, bh, _NT_DIMS,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ah, bl, _NT_DIMS,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(al, bh, _NT_DIMS,
                               preferred_element_type=jnp.float32)
    return acc


def _syrk_kernel(ti_ref, tj_ref, c_ref, ai_ref, aj_ref, o_ref, acc_ref, *,
                 nk: int, highest: bool):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = c_ref[:].astype(jnp.float32)

    acc_ref[:] -= _dot_nt(ai_ref[:], aj_ref[:], highest)

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("bm", "bk", "highest"))
def _syrk_padded(c, a, ti, tj, bm: int, bk: int, highest: bool):
    m = c.shape[0]
    k = a.shape[1]
    nt = ti.shape[0]
    nk = k // bk
    kernel = functools.partial(_syrk_kernel, nk=nk, highest=highest)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, nk),
            in_specs=[
                pl.BlockSpec((bm, bm),
                             lambda t, kk, ti, tj: (ti[t], tj[t])),
                pl.BlockSpec((bm, bk),
                             lambda t, kk, ti, tj: (ti[t], kk)),
                pl.BlockSpec((bm, bk),
                             lambda t, kk, ti, tj: (tj[t], kk)),
            ],
            out_specs=pl.BlockSpec((bm, bm),
                                   lambda t, kk, ti, tj: (ti[t], tj[t])),
            scratch_shapes=[pltpu.VMEM((bm, bm), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, m), c.dtype),
        input_output_aliases={2: 0},  # C (first tensor operand) → output
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * bm * bm * k,
            bytes_accessed=(2 * nt * bm * k + 2 * nt * bm * bm)
            * c.dtype.itemsize,
            transcendentals=0,
        ),
    )(ti, tj, c, a, a)


def syrk_lower_sub(c, a, *, bm: int = 256, bk: int = 512):
    """``C − A·Aᵀ`` with only the LOWER (i ≥ j) tiles computed.

    The strict-upper triangle of the result is UNSPECIFIED (C's original
    values when XLA honors the input/output alias, undefined otherwise) —
    callers must consume ``tril`` only, which is exactly the Cholesky
    trailing-update contract.  Ragged shapes are zero-padded to tile
    multiples and sliced back.
    """
    m, m2 = c.shape
    assert m == m2 and a.shape[0] == m, (c.shape, a.shape)
    k = a.shape[1]
    bm = min(bm, _round_up(m, 128))
    bk = min(bk, _round_up(k, 128))
    mp, kp = _round_up(m, bm), _round_up(k, bk)
    if mp != m:
        c = jnp.pad(c, ((0, mp - m), (0, mp - m)))
    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    t = mp // bm
    ii, jj = np.tril_indices(t)
    ti = jnp.asarray(ii, jnp.int32)
    tj = jnp.asarray(jj, jnp.int32)

    from faer_tpu.core.config import config

    out = _syrk_padded(c, a, ti, tj, bm, bk,
                       config.f32_precision == "highest")
    if mp != m:
        out = out[:m, :m]
    return out
