"""v5 fused LLT panel kernel: diagonal-block factor + panel TRSM in ONE
``pallas_call``.

Round-4's verdict: three rounds of leaf tuning left the factor drivers at a
flat ~15% of roofline because each panel is a CHAIN of XLA ops (mirror →
recursive leaf kernels → TRTRI → L21 GEMM).  This kernel collapses the whole
panel step into one dispatch:

1. mirror the (b, b) diagonal block in-kernel (one transpose);
2. factor it with register-resident rank-1 micro-steps — each sub-block strip
   of ``sb`` rows is loaded into vregs ONCE and updated functionally, so the
   serial per-column chain is rsqrt + two VPU ops instead of a VMEM
   round-trip per step (v4 measured ~230 cycles/column; this targets <100);
3. right-looking cross-sub-block updates via MXU dots (v4 structure);
4. invert L11ᵀ in-kernel (128-blocked Neumann doubling — the proven-safe
   cap, see ``ops/triangular.py``) and apply the panel TRSM
   ``L21 = A21 · L11⁻ᵀ`` as chunked MXU dots at bf16x3 precision (Mosaic
   lowers only DEFAULT/HIGHEST dot precisions; the manual hi/lo split
   reproduces XLA's ``HIGH`` = 3 bf16 passes, the library-wide f32 policy).

Reference parity: faer ``cholesky/llt/factor.rs:67`` →
``cholesky_block_left_looking`` (``ldlt/factor.rs:499``) — the panel factor +
panel triangular solve of the blocked LLT, here fused for the TPU's
dispatch-latency profile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _dot_hi(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _dot3(a, b):
    """bf16x3 dot (== XLA ``Precision.HIGH``, the library f32 GEMM policy):
    Mosaic lowers only DEFAULT/HIGHEST, so split into 3 native MXU passes."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _neumann_unit_inv(r, nb: int):
    """(I + R)⁻¹ for strictly-triangular R via log-depth doubling (≤ 128)."""
    eye = jnp.eye(nb, dtype=jnp.float32)
    p = -r
    s = eye + p
    span = 2
    while span < nb:
        p = _dot_hi(p, p)
        s = s + _dot_hi(p, s)
        span *= 2
    return s


def _upper_inv_blocked(u, b: int):
    """U⁻¹ for upper-triangular (b, b) U with 128-blocked Neumann doubling.

    Doubling past 128 overflows f32 (combinatorial M^k growth — see
    ``ops/triangular.py``); recursive 2×2 combine above that.
    """
    if b <= 128:
        iu = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
        eye = (iu == ju).astype(jnp.float32)
        u = jnp.where(iu <= ju, u, 0.0)
        d = jnp.sum(u * eye, axis=1, keepdims=True)
        r_up = (u * (1.0 - eye)) / d
        return _neumann_unit_inv(r_up, b) / jnp.reshape(d, (1, b))
    h = b // 2
    i1 = _upper_inv_blocked(u[:h, :h], h)
    i2 = _upper_inv_blocked(u[h:, h:], b - h)
    # [[U1, B], [0, U2]]⁻¹ = [[I1, -I1 B I2], [0, I2]]
    top = jnp.concatenate([i1, -_dot_hi(_dot_hi(i1, u[:h, h:]), i2)], axis=1)
    bot = jnp.concatenate([jnp.zeros((b - h, h), jnp.float32), i2], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _llt_panel_v5_kernel(slab_in, o_ref, cnt_ref, ok_ref, d_ref, *,
                         m, b, eps, delta, sb, rch):
    """``slab_in``/``o_ref``: (m, b), rows 0..b = A11 (lower valid),
    rows b.. = A21.  ``d_ref``: (b, b) scratch holding the factored diagonal
    block with ROWS = columns of L (symmetric input is its own transpose)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    subi = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0)
    cnt = jnp.zeros((), jnp.int32)
    ok = jnp.ones((), jnp.bool_)

    # 1. mirror the diagonal block: full symmetric storage in d_ref
    dlow = slab_in[0:b, :]
    iu = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    d_ref[:] = jnp.where(iu >= ju, dlow, jnp.transpose(dlow))

    # 2. factor: register-resident micro-steps per sb-row strip
    nsub = (b + sb - 1) // sb
    for s in range(nsub):
        sb0 = s * sb
        nj = min(sb, b - sb0)
        strip = d_ref[sb0:sb0 + nj, :]                     # (nj, b) value
        for jl in range(nj):
            j = sb0 + jl
            rowj = strip[jl:jl + 1, :]                     # (1, b)
            pj = rowj[0:1, j:j + 1]                        # (1, 1)
            needs = pj <= delta
            ok = ok & (pj[0, 0] > 0)
            if eps > 0:
                pj = jnp.where(needs, eps, pj)
                cnt = cnt + jnp.where(needs[0, 0], jnp.int32(1), jnp.int32(0))
            else:
                pj = jnp.where(pj <= 0, 1.0, pj)
            rs = jax.lax.rsqrt(pj)                         # (1, 1)
            piv = pj * rs
            col = jnp.where(lanes == j, piv,
                            jnp.where(lanes > j, rowj * rs, rowj))
            if jl < nj - 1:
                uv = strip[:, j:j + 1] * rs                # (nj, 1)
                strip = jnp.where(subi > jl, strip - uv * col,
                                  jnp.where(subi == jl, col, strip))
            else:
                strip = jnp.where(subi == jl, col, strip)
        d_ref[sb0:sb0 + nj, :] = strip
        sb_end = sb0 + nj
        if sb_end >= b:
            continue
        # cross-sub-block Schur update (v4 structure): W = C·U11⁻¹; C -= W·M
        m_rows = strip                                     # final L cols
        u11 = m_rows[:, sb0:sb_end]
        iu8 = jax.lax.broadcasted_iota(jnp.int32, (nj, nj), 0)
        ju8 = jax.lax.broadcasted_iota(jnp.int32, (nj, nj), 1)
        eye = (iu8 == ju8).astype(jnp.float32)
        u11 = jnp.where(iu8 <= ju8, u11, 0.0)
        dd = jnp.sum(u11 * eye, axis=1, keepdims=True)
        r_up = (u11 * (1.0 - eye)) / dd
        uinv8 = _neumann_unit_inv(r_up, nj) / jnp.reshape(dd, (1, nj))
        for c0 in range(sb_end, b, rch):
            cw = min(rch, b - c0)
            c_chunk = d_ref[c0:c0 + cw, :]
            w = _dot_hi(c_chunk[:, sb0:sb_end], uinv8)
            d_ref[c0:c0 + cw, :] = c_chunk - _dot_hi(w, m_rows)

    # 3. write L11 (lower) into the output's top block: L11 = (d_ref rows)ᵀ
    lt = d_ref[:]                                          # rows = L columns
    o_ref[0:b, :] = jnp.where(iu >= ju, jnp.transpose(lt), 0.0)

    # 4. panel TRSM: L21 = A21 · (L11ᵀ)⁻¹, chunked bf16x3 MXU dots
    if m > b:
        uinv = _upper_inv_blocked(jnp.where(iu <= ju, lt, 0.0), b)
        for c0 in range(b, m, rch):
            cw = min(rch, m - c0)
            o_ref[c0:c0 + cw, :] = _dot3(slab_in[c0:c0 + cw, :], uinv)

    cnt_ref[0, 0] = cnt
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "delta", "sb", "rch"))
def llt_panel_v5_pallas(slab, *, eps: float = 0.0, delta: float = 0.0,
                        sb: int = 32, rch: int = 512):
    """Fused LLT panel step of an (m, b) f32 slab: returns
    ``(strip, count, ok)`` with ``strip[:b] = L11`` (lower triangular) and
    ``strip[b:] = L21 = A21·L11⁻ᵀ``.

    The caller's trailing update is then ONE symmetric GEMM
    ``A22 −= L21·L21ᵀ`` — a panel costs exactly two dispatches.

    Measured on v5e (tools/r5llt.py, 4096-row slab): b=256 58.2 µs at sb=32
    (91.1 at sb=8), b=512 143.1 µs at sb=32 — sb=32 default; the v4 chain
    (mirror + recursive leaf + TRTRI + L21 GEMM) was ~120 µs at b=256.
    """
    m, b = slab.shape
    mp = _round_up(m, 8)
    if mp != m:
        slab = jnp.pad(slab, ((0, mp - m), (0, 0)))
    kernel = functools.partial(_llt_panel_v5_kernel, m=mp, b=b,
                               eps=float(eps), delta=float(delta),
                               sb=sb, rch=rch)
    # slab/strip alias (each row chunk is read before it is written), and the
    # scoped-vmem ceiling is raised past the 16M default for 512-wide panels
    # (slab 8M + d_ref 1M + dot temporaries)
    # slab + d_ref + TRTRI/dot temporaries (~12M measured high-water at
    # b=512; physical VMEM is far above the 16M default scoped limit)
    vmem_budget = mp * b * 4 + 2 * b * b * 4 + (12 << 20)
    strip, cnt, okf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((mp, b), slab.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((b, b), jnp.float32)],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_budget, 100 * (1 << 20))),
    )(slab)
    return strip[:m], cnt[0, 0], okf[0, 0] != 0
