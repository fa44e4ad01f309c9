"""Pallas panel-factorization kernels (the sequential cores of LU/LLT/QR).

Reference parity: these replace the microkernel layer faer builds in Rust/SIMD
(``lu/partial_pivoting/factor.rs`` unblocked path, ``cholesky/ldlt/factor.rs``
unblocked path, ``qr/no_pivoting/factor.rs`` unblocked path).

Why Pallas: the panel factor is a chain of n small dependent steps. Driven
from XLA (``fori_loop`` of masked updates) every step re-streams the panel
through HBM (~10 µs/step measured); inside one Mosaic kernel the panel stays
VMEM-resident and each step is a couple of register passes (~1 µs/step).

Layout notes (TPU tiling): the loop index walks *columns*; columns live on the
lane dimension, where dynamic slicing is expensive — so columns are selected
with lane-iota masks (full-width ops), while *row* reads/swaps use dynamic
sublane slices (cheap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# partially-pivoted LU panel
# ---------------------------------------------------------------------------

def _lu_panel_kernel(a_ref, o_ref, perm_ref, nt_ref, ok_ref, *, m, b, kmax, mvalid):
    o_ref[:] = a_ref[:]
    perm_ref[:] = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(j, carry):
        nt, ok = carry
        lane_j = lanes == j
        colj = jnp.sum(jnp.where(lane_j, o_ref[:], 0.0), axis=1, keepdims=True)
        mag = jnp.where((rows >= j) & (rows < mvalid), jnp.abs(colj), -1.0)
        # index_dtype pinned to int32: Mosaic only lowers int32 arg-reductions
        # (and x64 mode would otherwise promote the index to int64)
        p = jax.lax.argmax(mag[:, 0], axis=0, index_dtype=jnp.int32)
        # swap rows j <-> p (and perm entries)
        rowj = o_ref[pl.ds(j, 1), :]
        rowp = o_ref[pl.ds(p, 1), :]
        o_ref[pl.ds(j, 1), :] = rowp
        o_ref[pl.ds(p, 1), :] = rowj
        pj = perm_ref[pl.ds(j, 1), :]
        pp = perm_ref[pl.ds(p, 1), :]
        perm_ref[pl.ds(j, 1), :] = pp
        perm_ref[pl.ds(p, 1), :] = pj
        nt = nt + jnp.where(p != j, jnp.int32(1), jnp.int32(0))
        # pivot = (new) row j, lane j
        pivot = jnp.sum(jnp.where(lane_j, rowp, 0.0))
        ok = ok & (pivot != 0)
        safe = jnp.where(pivot == 0, 1.0, pivot)
        # post-swap column j derived from the pre-swap extraction (swap the
        # two affected entries) — saves a full-panel pass per step
        cj = jnp.sum(jnp.where(rows == j, colj, 0.0))
        cp = jnp.sum(jnp.where(rows == p, colj, 0.0))
        colj = jnp.where(rows == j, cp, jnp.where(rows == p, cj, colj))
        mult = jnp.where(rows > j, colj / safe, colj)
        # one fused pass: write multipliers into column j, rank-1 update right
        upd = jnp.where((rows > j) & (lanes > j), mult * rowp, 0.0)
        o_ref[:] = jnp.where(lane_j & (rows > j), mult, o_ref[:] - upd)
        return nt, ok

    nt, ok = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(kmax), body, (jnp.zeros((), jnp.int32), jnp.ones((), jnp.bool_)))
    nt_ref[0, 0] = nt
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def lu_panel_pallas(panel):
    """Partially-pivoted LU of an (m, b) f32 panel, fully VMEM-resident.

    Returns ``(packed, perm, nt, ok)`` matching ``linalg.lu._panel_lu``.
    """
    m, b = panel.shape
    kmax = min(m, b)
    mp = _round_up(m, 8)
    bp = _round_up(b, 128)
    if (mp, bp) != (m, b):
        panel = jnp.pad(panel, ((0, mp - m), (0, bp - b)))
    kernel = functools.partial(_lu_panel_kernel, m=mp, b=bp, kmax=kmax, mvalid=m)
    packed, perm, nt, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((mp, bp), panel.dtype),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(panel)
    return (packed[:m, :b], perm[:m, 0], nt[0, 0], ok[0, 0] != 0)


# ---------------------------------------------------------------------------
# LLT diagonal block
# ---------------------------------------------------------------------------

def _llt_block_kernel(a_ref, o_ref, cnt_ref, ok_ref, *, b, bvalid, eps, delta):
    o_ref[:] = a_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(j, carry):
        cnt, ok = carry
        lane_j = lanes == j
        rowj = o_ref[pl.ds(j, 1), :]
        pj = jnp.sum(jnp.where(lane_j, rowj, 0.0))
        needs = pj <= delta
        ok = ok & (pj > 0)
        if eps > 0:
            pj = jnp.where(needs, eps, pj)
            cnt = cnt + jnp.where(needs, jnp.int32(1), jnp.int32(0))
        else:
            pj = jnp.where(pj <= 0, 1.0, pj)
        piv = jnp.sqrt(pj)
        colj = jnp.sum(jnp.where(lane_j, o_ref[:], 0.0), axis=1, keepdims=True)
        col = jnp.where(rows > j, colj / piv, colj)
        col = jnp.where(rows == j, piv, col)
        # row j of the transposed-view equals col (symmetric block); fused pass
        colT = jnp.sum(jnp.where(rows == j, o_ref[:], 0.0), axis=0, keepdims=True)
        colT = jnp.where(lanes > j, colT / piv, colT)
        upd = jnp.where((rows > j) & (lanes > j), col * colT, 0.0)
        o_ref[:] = jnp.where(lane_j, col, o_ref[:] - upd)
        return cnt, ok

    cnt, ok = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(bvalid), body, (jnp.zeros((), jnp.int32), jnp.ones((), jnp.bool_)))
    cnt_ref[0, 0] = cnt
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "delta"))
def llt_block_pallas(block, *, eps: float = 0.0, delta: float = 0.0):
    """Unblocked LLT of a (b, b) f32 block in VMEM (lower triangle used).

    Returns ``(L, count, ok)`` matching ``linalg.cholesky._panel_llt``.
    The input must be symmetric in full storage (mirror applied by caller) so
    row reads can stand in for column reads.
    """
    b = block.shape[0]
    bp = _round_up(b, 128)
    if bp != b:
        block = jnp.pad(block, ((0, bp - b), (0, bp - b)))
    kernel = functools.partial(_llt_block_kernel, b=bp, bvalid=b,
                               eps=float(eps), delta=float(delta))
    l, cnt, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, bp), block.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(block)
    return jnp.tril(l[:b, :b]), cnt[0, 0], ok[0, 0] != 0


# ---------------------------------------------------------------------------
# Householder QR panel
# ---------------------------------------------------------------------------

def _qr_panel_kernel(a_ref, o_ref, tau_ref, *, m, b, kmax, mvalid):
    o_ref[:] = a_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(j, _):
        lane_j = lanes == j
        valid = rows < mvalid
        colj = jnp.sum(jnp.where(lane_j, o_ref[:], 0.0), axis=1, keepdims=True)
        alpha = jnp.sum(jnp.where(rows == j, colj, 0.0))
        below = (rows > j) & valid
        tail_sq = jnp.sum(jnp.where(below, colj * colj, 0.0))
        norm = jnp.sqrt(alpha * alpha + tail_sq)
        # both branches literal → must carry the panel dtype explicitly (an
        # all-literal where is weak f64 under jax_enable_x64)
        sign = jnp.where(alpha >= 0, jnp.ones_like(alpha), -jnp.ones_like(alpha))
        beta = -sign * norm
        is_id = tail_sq == 0.0
        s = alpha - beta
        safe_s = jnp.where(is_id, 1.0, s)
        safe_b = jnp.where(is_id, 1.0, beta)
        tau = jnp.where(is_id, 0.0, (beta - alpha) / safe_b)
        beta = jnp.where(is_id, alpha, beta)
        v = jnp.where(below, colj / safe_s, 0.0)
        v = jnp.where(is_id, jnp.zeros_like(v), v)
        v = jnp.where(rows == j, 1.0, v)
        tau_ref[pl.ds(j, 1), :] = jnp.reshape(tau, (1, 1))
        # apply H = I − τ v vᵀ to lanes > j, then store packed column j
        w = jnp.sum(v * o_ref[:], axis=0, keepdims=True)      # vᵀA (1, b)
        upd = tau * v * w
        packed_col = jnp.where(rows == j, beta, jnp.where(below, v, colj))
        o_ref[:] = jnp.where(lane_j, packed_col,
                             jnp.where(lanes > j, o_ref[:] - upd, o_ref[:]))
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(kmax), body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=())
def qr_panel_pallas(panel):
    """Householder QR of an (m, b) f32 panel in VMEM.

    Returns ``(packed, taus)`` matching ``linalg.qr._panel_qr`` (real dtypes).
    """
    m, b = panel.shape
    kmax = min(m, b)
    mp = _round_up(m, 8)
    bp = _round_up(b, 128)
    if (mp, bp) != (m, b):
        panel = jnp.pad(panel, ((0, mp - m), (0, bp - b)))
    kernel = functools.partial(_qr_panel_kernel, m=mp, b=bp, kmax=kmax, mvalid=m)
    packed, taus = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((mp, bp), panel.dtype),
            jax.ShapeDtypeStruct((bp, 1), panel.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(panel)
    return packed[:m, :b], taus[:kmax, 0]


# ---------------------------------------------------------------------------
# triangular inverse (TRTRI)
# ---------------------------------------------------------------------------

def _trtri_kernel(t_ref, o_ref, *, n, nvalid, unit):
    """inv(L) for lower-triangular L via the Neumann doubling identity.

    ``L = D(I + M)`` with M strictly lower (nilpotent) →
    ``(I + M)^{-1} = Σ (−M)^i`` computed in ⌈log2 n⌉ doubling steps of two MXU
    matmuls each, plus one Newton–Schulz refinement — all inside ONE kernel.
    Replaces a chain of ~18 separately-dispatched tiny XLA GEMMs (each pays
    ~10-20 µs dispatch latency) with ~15 µs total in-VMEM work.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    valid = (rows < nvalid) & (lanes < nvalid)
    eye = jnp.where(rows == lanes, 1.0, 0.0).astype(o_ref.dtype)
    t = t_ref[:]
    strict = jnp.where((rows > lanes) & valid, t, 0.0)
    if unit:
        dinv = jnp.ones((n, 1), o_ref.dtype)
    else:
        d = jnp.sum(jnp.where((rows == lanes) & valid, t, 0.0),
                    axis=1, keepdims=True)                     # (n, 1)
        d = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < nvalid,
                      d, 1.0)
        dinv = 1.0 / d
    m = strict * dinv                                          # rows scaled

    def mm(a, b):
        # HIGHEST: true-f32 MXU passes — the inverse is sensitivity-critical
        # (error amplified by ‖L⁻¹‖ downstream); bf16 default loses 4 digits
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

    p = -m
    s = eye + p
    span = 2
    while span < nvalid:
        p = mm(p, p)
        s = s + mm(p, s)
        span *= 2
    s = s * jnp.reshape(dinv, (1, n))                          # cols scaled
    # Newton–Schulz: squares the Neumann sum's residual (full-dtype accuracy)
    tt = strict + (eye if unit else eye / dinv)                # L, padded = I
    s = s + mm(s, eye - mm(tt, s))
    o_ref[:] = jnp.where(rows >= lanes, s, 0.0)


@functools.partial(jax.jit, static_argnames=("unit",))
def trtri_pallas(t, *, unit: bool = False):
    """inv(L) of an (n, n) f32 lower-triangular block in one Mosaic kernel."""
    n = t.shape[0]
    np_ = max(_round_up(n, 128), 128)
    if np_ != n:
        t = jnp.pad(t, ((0, np_ - n), (0, np_ - n)))
    kernel = functools.partial(_trtri_kernel, n=np_, nvalid=n, unit=unit)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, np_), t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t)
    return out[:n, :n]


# ---------------------------------------------------------------------------
# tridiagonal implicit-QR sweep
# ---------------------------------------------------------------------------

def _tridiag_sweep_kernel(lm_ref, mu_ref, d_ref, e_ref,
                          do_ref, eo_ref, c_ref, s_ref, *, n):
    """One Wilkinson-shifted bulge-chase sweep on (d, e) with VMEM-resident
    state and register carries.

    Driven from XLA, each scan step pays ~8 tiny HBM DMAs (~6 µs measured);
    in-kernel the same step is a couple of VMEM row accesses (~0.1 µs).
    Emits the Givens coefficients for the eigenvector GEMM chain.
    """
    l = lm_ref[0]
    m = lm_ref[1]
    mu = mu_ref[0]
    do_ref[...] = d_ref[...]
    eo_ref[...] = e_ref[...]
    c_ref[...] = jnp.ones_like(c_ref)
    s_ref[...] = jnp.zeros_like(s_ref)

    def _rd(ref, i):
        return ref[pl.ds(i, 1), :][0, 0]

    def _wr(ref, i, v):
        ref[pl.ds(i, 1), :] = jnp.reshape(v, (1, 1))

    x0 = _rd(d_ref, l) - mu
    z0 = _rd(e_ref, l)

    def body(i, carry):
        x, bz = carry
        active = (i >= l) & (i < m)
        r = jnp.sqrt(x * x + bz * bz)
        safe = jnp.where(r == 0, 1.0, r)
        c = jnp.where(active, jnp.where(r == 0, 1.0, x / safe), 1.0)
        s = jnp.where(active, jnp.where(r == 0, 0.0, bz / safe), 0.0)
        _wr(c_ref, i, c)
        _wr(s_ref, i, s)

        @pl.when(active & (i > l))
        def _():
            _wr(eo_ref, i - 1, r)

        di = _rd(do_ref, i)
        dip1 = _rd(do_ref, i + 1)
        ei = _rd(eo_ref, i)
        new_di = c * c * di + 2 * c * s * ei + s * s * dip1
        new_dip1 = s * s * di - 2 * c * s * ei + c * c * dip1
        new_ei = c * s * (dip1 - di) + (c * c - s * s) * ei

        @pl.when(active)
        def _():
            _wr(do_ref, i, new_di)
            _wr(do_ref, i + 1, new_dip1)
            _wr(eo_ref, i, new_ei)

        has_next = active & (i + 1 < m)
        e_next = _rd(eo_ref, jnp.minimum(i + 1, n - 2))

        @pl.when(has_next)
        def _():
            _wr(eo_ref, i + 1, c * e_next)

        new_bz = jnp.where(active, jnp.where(has_next, s * e_next, 0.0), bz)
        new_x = jnp.where(active, new_ei, x)
        return new_x, new_bz

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), body, (x0, z0))


@functools.partial(jax.jit, static_argnames=())
def tridiag_sweep_pallas(d, e, l, m, mu):
    """One tridiagonal QR sweep: returns (d', e', c_arr, s_arr). f32 only."""
    n = d.shape[0]
    lm = jnp.stack([l.astype(jnp.int32), m.astype(jnp.int32)])
    kernel = functools.partial(_tridiag_sweep_kernel, n=n)
    d2, e2, c_arr, s_arr = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), d.dtype),
            jax.ShapeDtypeStruct((n - 1, 1), e.dtype),
            jax.ShapeDtypeStruct((n - 1, 1), d.dtype),
            jax.ShapeDtypeStruct((n - 1, 1), d.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(lm, jnp.reshape(mu, (1,)), d[:, None], e[:, None])
    return d2[:, 0], e2[:, 0], c_arr[:, 0], s_arr[:, 0]


# ---------------------------------------------------------------------------
# bidiagonal implicit-QR (Golub-Kahan) sweep
# ---------------------------------------------------------------------------

def _bidiag_sweep_kernel(lm_ref, mu_ref, d_ref, e_ref,
                         do_ref, eo_ref, c1_ref, s1_ref, c2_ref, s2_ref, *, n):
    """One shifted Golub-Kahan sweep on bidiagonal (d, e): VMEM-resident state,
    emits the right (c1, s1 → V) and left (c2, s2 → U) rotation coefficients.
    """
    l = lm_ref[0]
    m = lm_ref[1]
    mu = mu_ref[0]
    do_ref[...] = d_ref[...]
    eo_ref[...] = e_ref[...]
    c1_ref[...] = jnp.ones_like(c1_ref)
    s1_ref[...] = jnp.zeros_like(s1_ref)
    c2_ref[...] = jnp.ones_like(c2_ref)
    s2_ref[...] = jnp.zeros_like(s2_ref)

    def _rd(ref, i):
        return ref[pl.ds(i, 1), :][0, 0]

    def _wr(ref, i, v):
        ref[pl.ds(i, 1), :] = jnp.reshape(v, (1, 1))

    dl = _rd(d_ref, l)
    x0 = dl * dl - mu
    z0 = dl * _rd(e_ref, l)

    def body(i, carry):
        x, bz = carry
        active = (i >= l) & (i < m)

        def giv(a_, b_):
            r = jnp.sqrt(a_ * a_ + b_ * b_)
            safe = jnp.where(r == 0, 1.0, r)
            c = jnp.where(active, jnp.where(r == 0, 1.0, a_ / safe), 1.0)
            s = jnp.where(active, jnp.where(r == 0, 0.0, b_ / safe), 0.0)
            return c, s, r

        c1, s1, r1 = giv(x, bz)
        _wr(c1_ref, i, c1)
        _wr(s1_ref, i, s1)

        @pl.when(active & (i > l))
        def _():
            _wr(eo_ref, i - 1, r1)

        di = _rd(do_ref, i)
        dip1 = _rd(do_ref, i + 1)
        ei = _rd(eo_ref, i)
        new_di = c1 * di + s1 * ei
        new_ei = -s1 * di + c1 * ei
        bulge = s1 * dip1
        new_dip1 = c1 * dip1

        c2, s2, r2 = giv(new_di, bulge)
        _wr(c2_ref, i, c2)
        _wr(s2_ref, i, s2)
        e2v = c2 * new_ei + s2 * new_dip1
        d2ip1 = -s2 * new_ei + c2 * new_dip1

        @pl.when(active)
        def _():
            _wr(do_ref, i, r2)
            _wr(do_ref, i + 1, d2ip1)
            _wr(eo_ref, i, e2v)

        has_next = active & (i + 1 < m)
        e_next = _rd(eo_ref, jnp.minimum(i + 1, n - 2))

        @pl.when(has_next)
        def _():
            _wr(eo_ref, i + 1, c2 * e_next)

        new_bz = jnp.where(active, jnp.where(has_next, s2 * e_next, 0.0), bz)
        new_x = jnp.where(active, e2v, x)
        return new_x, new_bz

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), body, (x0, z0))


@functools.partial(jax.jit, static_argnames=())
def bidiag_sweep_pallas(d, e, l, m, mu):
    """One Golub-Kahan sweep: returns (d', e', c1, s1, c2, s2). f32 only."""
    n = d.shape[0]
    lm = jnp.stack([l.astype(jnp.int32), m.astype(jnp.int32)])
    kernel = functools.partial(_bidiag_sweep_kernel, n=n)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((n, 1), d.dtype),
             jax.ShapeDtypeStruct((n - 1, 1), e.dtype)]
            + [jax.ShapeDtypeStruct((n - 1, 1), d.dtype)] * 4
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
    )(lm, jnp.reshape(mu, (1,)), d[:, None], e[:, None])
    d2, e2, c1, s1, c2, s2 = outs
    return d2[:, 0], e2[:, 0], c1[:, 0], s1[:, 0], c2[:, 0], s2[:, 0]


# ---------------------------------------------------------------------------
# LLT diagonal block, v3: unrolled sub-blocked elimination
# ---------------------------------------------------------------------------

def _llt_block_v3_kernel(a_ref, o_ref, cnt_ref, ok_ref, *, b, bvalid,
                         eps, delta):
    """Rows of o_ref = columns of A (symmetric input, so the storage is its
    own transpose).  Python-unrolled 8-column sub-blocks: each step reads its
    column row directly and eagerly updates only the columns below it inside
    the sub-block; the cross-sub-block Schur update is one exact GEMM per
    row-chunk (no Neumann coupling — unlike LU, both rank-update factors come
    from *final* panel columns)."""
    SB = 8
    o_ref[:] = a_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    cnt = jnp.zeros((), jnp.int32)
    ok = jnp.ones((), jnp.bool_)

    def _dot(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

    nsub = (bvalid + SB - 1) // SB
    for s in range(nsub):
        sb0 = s * SB
        nj = min(SB, bvalid - sb0)
        for jl in range(nj):
            j = sb0 + jl
            colj = o_ref[j:j + 1, :]                      # (1, b) = A[:, j]
            pj = jnp.sum(colj[:, j:j + 1])
            needs = pj <= delta
            ok = ok & (pj > 0)
            if eps > 0:
                pj = jnp.where(needs, eps, pj)
                cnt = cnt + jnp.where(needs, jnp.int32(1), jnp.int32(0))
            else:
                pj = jnp.where(pj <= 0, 1.0, pj)
            piv = jnp.sqrt(pj)
            col = jnp.where(lanes == j, piv,
                            jnp.where(lanes > j, colj / piv, colj))
            o_ref[j:j + 1, :] = col
            if jl < nj - 1:
                rest = o_ref[j + 1:sb0 + SB, :]           # (k, b)
                uv = jnp.transpose(col[:, j + 1:sb0 + SB])  # (k, 1) = L[c, j]
                o_ref[j + 1:sb0 + SB, :] = rest - uv * col
        sb_end = sb0 + SB
        if sb_end >= b:
            continue
        M = o_ref[sb0:sb0 + SB, :]                        # final sub-block L
        RCH = 128
        for c0 in range(sb_end, b, RCH):
            cw = min(RCH, b - c0)
            lc = jnp.transpose(M[:, c0:c0 + cw])          # (cw, SB) = L[c, j]
            o_ref[c0:c0 + cw, :] = o_ref[c0:c0 + cw, :] - _dot(lc, M)
    cnt_ref[0, 0] = cnt
    ok_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "delta"))
def llt_block_v3_pallas(block, *, eps: float = 0.0, delta: float = 0.0):
    """Unblocked LLT of a (b, b) f32 symmetric block — unrolled v3 kernel.

    Same contract as ``llt_block_pallas``: ``(L, count, ok)``.
    """
    b = block.shape[0]
    bp = _round_up(b, 128)
    if bp != b:
        block = jnp.pad(block, ((0, bp - b), (0, bp - b)))
    kernel = functools.partial(_llt_block_v3_kernel, b=bp, bvalid=b,
                               eps=float(eps), delta=float(delta))
    l, cnt, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, bp), block.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(block)
    # kernel rows hold L's COLUMNS (transposed storage): L = tril(out.T)
    return jnp.tril(l[:b, :b].T), cnt[0, 0], ok[0, 0] != 0
