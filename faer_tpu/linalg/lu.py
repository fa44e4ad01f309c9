"""LU factorizations: partial pivoting (blocked) and full pivoting.

Reference parity:
* ``faer/src/linalg/lu/partial_pivoting/factor.rs`` — ``lu_in_place`` (``:234``),
  blocked right-looking with per-column row pivoting;
* ``faer/src/linalg/lu/full_pivoting/factor.rs`` — ``lu_in_place`` (``:466``),
  argmax over the trailing submatrix with fused update+search kernels;
* solve/inverse/reconstruct siblings (``lu/*/{solve,inverse,reconstruct}.rs``).

TPU-native design (SURVEY §7 stage 3): the panel factor is a ``lax.fori_loop``
over columns with masked rank-1 updates and on-chip argmax pivot search —
static shapes throughout, all data stays on device. The outer panel sweep is a
trace-time Python loop (shapes shrink statically, the idiomatic JAX pattern),
so the trailing update is an exact-size GEMM on the MXU rather than a masked
full-width one (no wasted FLOPs).

Pivots are accumulated as a permutation vector applied with one gather per
panel (``jnp.take``), not row-by-row swaps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes, perm as permod
from faer_tpu.core.errors import LuInfo
from faer_tpu.core.params import FullPivLuParams, PartialPivLuParams
from faer_tpu.ops.matmul import matmul
from faer_tpu.ops.triangular_solve import solve_unit_lower_triangular, solve_upper_triangular


def _panel_lu(panel):
    """Unblocked partially-pivoted LU of an (m, b) panel.

    Returns (panel_lu, local_perm, n_transpositions, ok). Runs as one
    ``fori_loop`` with masked updates: column-argmax pivot search, row swap via
    two dynamic row reads + scatter, masked rank-1 trailing update.
    """
    m, b = panel.shape
    rdt = dtypes.real_dtype_of(panel.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    def body(j, state):
        a, perm, nt, ok = state
        col = a[:, j]
        mag = jnp.abs(col).astype(rdt)
        mag = jnp.where(rows >= j, mag, -jnp.ones((), rdt))
        p = jnp.argmax(mag).astype(jnp.int32)
        # swap rows j and p (of both the panel and the permutation)
        a = permod.swap_rows(a, j, p)
        perm = permod.swap_rows(perm, j, p)
        nt = nt + jnp.where(p != j, 1, 0)
        pivot = a[j, j]
        ok = ok & (pivot != 0)
        safe = jnp.where(pivot == 0, jnp.ones_like(pivot), pivot)
        below = rows > j
        mult = jnp.where(below, a[:, j] / safe, a[:, j])
        a = a.at[:, j].set(mult)
        # masked rank-1 update of the trailing block (rows > j, cols > j)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)[0]
        rmask = below[:, None]
        cmask = (cols > j)[None, :]
        upd = jnp.where(rmask & cmask, mult[:, None] * a[j, :][None, :], 0)
        a = a - upd
        return a, perm, nt, ok

    init = (
        panel,
        jnp.arange(m, dtype=jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.ones((), jnp.bool_),
    )
    a, perm, nt, ok = jax.lax.fori_loop(0, min(m, b), body, init)
    return a, perm, nt, ok


# Tournament pivoting kicks in for leaf panels taller than this.  Measured
# on v5e at 4096^2: CALU loses to the direct chunked kernel even with the
# O(b^2) parity (10.4 vs 7.2 ms full LU — the per-leaf argsort/gather/
# re-factor overheads exceed the kernel's per-lane cost), so it is gated
# beyond current bench sizes; the structure is kept for m >> 4096.
_CALU_GROUP = 1 << 30


def _lu_leaf_calu(panel, group: int = _CALU_GROUP):
    """Tournament (CALU) pivoting for a tall leaf panel (m, b).

    faer's panel uses per-column partial pivoting
    (``lu/partial_pivoting/factor.rs``); on TPU the per-column argmax chain
    over m lanes is the serial floor, and its cost grows superlinearly with m
    in the Mosaic kernel.  CALU (Grigori et al.) picks all b pivots at once
    via a reduction tournament: factor row-groups independently, re-factor
    the stacked per-group pivot candidates, then build L for the remaining
    rows as one GEMM against U₁₁⁻¹.  Pivots differ from strict partial
    pivoting but the growth factor stays bounded (communication-avoiding LU,
    backward stable in practice).
    """
    from faer_tpu.ops.pallas.lu_panel_v2 import lu_panel_v2_pallas
    from faer_tpu.ops.triangular import invert_upper_triangular

    m, b = panel.shape
    ng = -(-m // group)
    mp = ng * group
    padded = panel if mp == m else jnp.concatenate(
        [panel, jnp.zeros((mp - m, b), panel.dtype)], axis=0)
    cands = []
    for g in range(ng):
        sub = padded[g * group:(g + 1) * group]
        _, perm_g, _, _ = lu_panel_v2_pallas(sub)
        cands.append(g * group + perm_g[:b])
    cand = jnp.concatenate(cands)                    # (ng·b,) global indices
    stacked = jnp.take(padded, cand, axis=0)         # original candidate rows
    packed2, perm2, _, ok = lu_panel_v2_pallas(stacked)
    win = jnp.take(cand, perm2[:b])                  # global pivot rows
    # physical order: pivots first (elimination order), then the rest
    big = jnp.int32(m + b)
    ranks = jnp.full((m,), big, jnp.int32)
    ranks = ranks.at[win].set(jnp.arange(b, dtype=jnp.int32), mode="drop")
    ranks = jnp.where(ranks < big, ranks, b + jnp.arange(m, dtype=jnp.int32))
    perm = jnp.argsort(ranks).astype(jnp.int32)
    rest = perm[b:]
    u11inv = invert_upper_triangular(jnp.triu(packed2[:b, :b]))
    l21 = matmul(None, jnp.take(panel, rest, axis=0), u11inv,
                 precision=jax.lax.Precision.HIGHEST)
    packed = jnp.concatenate([packed2[:b], l21], axis=0)
    return packed, perm, permod.perm_transposition_count(perm), ok


def _panel_lu_blocked(panel, base: int):
    """Two-level panel LU: recursive column-halving down to a fori base.

    The base case touches the whole panel per eliminated column (VPU/HBM
    bound); halving the width halves that traffic per level while the
    inter-half coupling becomes a unit-TRSM (via matmul-only inverse) + GEMM
    on the MXU. Returns (packed, perm, n_transpositions, ok).
    """
    m, b = panel.shape
    if b <= base:
        from faer_tpu.core.config import panel_kernels_enabled

        if panel_kernels_enabled(panel.dtype):
            if m > _CALU_GROUP:
                # tournament pivoting: the kernel's per-step cost grows
                # superlinearly with lanes past ~2k rows
                return _lu_leaf_calu(panel)
            # v4: v3's unrolled virtual-pivot structure + multiplier/one-hot
            # scratch rows written at step time (no per-sub-block
            # reconstruction passes) — see ops/pallas/leaf_v4.py
            from faer_tpu.ops.pallas.leaf_v4 import lu_panel_v4_pallas

            return lu_panel_v4_pallas(panel)
        return _panel_lu(panel)
    h = (b + 1) // 2
    left, perm1, nt1, ok1 = _panel_lu_blocked(panel[:, :h], base)
    right = jnp.take(panel[:, h:], perm1, axis=0)
    l11 = jnp.tril(left[:h, :h], -1) + jnp.eye(h, dtype=panel.dtype)
    u12 = solve_unit_lower_triangular(l11, right[:h])
    r2 = right[h:] - matmul(None, left[h:, :h], u12)
    bot, perm2, nt2, ok2 = _panel_lu_blocked(r2, base)
    left_bot = jnp.take(left[h:, :], perm2, axis=0)
    out = jnp.zeros_like(panel)
    out = out.at[:h, :h].set(left[:h, :])
    out = out.at[h:, :h].set(left_bot)
    out = out.at[:h, h:].set(u12)
    out = out.at[h:, h:].set(bot)
    perm = jnp.concatenate([perm1[:h], jnp.take(perm1[h:], perm2)])
    return out, perm, nt1 + nt2, ok1 & ok2


def _lu_factor_v5(a, block: int, ob: int):
    """Round-5 f32 LU driver: one fused v5 panel kernel per panel +
    two-level trailing updates over full-height column strips.

    Structure (round-4 verdict #1, the LU half): an inner panel step is a
    single ``pallas_call`` (``lu_panel_v5_pallas`` — bf16x3 coupling dots,
    sb=16; 269.7 µs at (4096, 256) vs the v4 recursion chain's ~1.06 ms per
    512 panel, tools/r4lu5.py) followed by one strip-local gather + TRSM +
    GEMM.  Outer ``ob``-wide blocks update LATER strips once per block — a
    single full-width gather, one unit-TRSM and one rank-``ob`` GEMM —
    instead of once per ``block``-panel, cutting trailing HBM traffic and
    gather passes by ``ob/block``.  Earlier (finished) strips are never
    re-permuted in the loop; the later blocks' row permutations are composed
    backward and applied exactly once at assembly (``_compose_tails``).

    faer ``lu/partial_pivoting/factor.rs:234`` blocked recursion, re-shaped
    for the TPU's dispatch-latency profile.
    """
    from faer_tpu.ops.pallas.lu_panel_v5 import lu_panel_v5_pallas
    from faer_tpu.ops.triangular import invert_lower_triangular

    m, n = a.shape
    starts = list(range(0, n, ob))
    strips = [a[:, K:min(K + ob, n)] for K in starts]
    perm = jnp.arange(m, dtype=jnp.int32)
    nt = jnp.zeros((), jnp.int32)
    ok = jnp.ones((), jnp.bool_)
    gperms = []
    for J, K in enumerate(starts):
        ow = strips[J].shape[1]
        t = strips[J][K:]                            # (m-K, ow) active rows
        gperm = jnp.arange(m - K, dtype=jnp.int32)
        for k in range(0, ow, block):
            bw = min(block, ow - k)
            packed, lperm, pnt, pok = lu_panel_v5_pallas(t[k:, k:k + bw])
            nt = nt + pnt
            ok = ok & pok
            tp = jnp.take(t[k:], lperm, axis=0)      # strip-local gather
            gperm = jnp.concatenate(
                [gperm[:k], jnp.take(gperm[k:], lperm)])
            pieces_top = [tp[:bw, :k], packed[:bw]]
            pieces_bot = [tp[bw:, :k], packed[bw:]]
            if k + bw < ow:
                l11inv = invert_lower_triangular(
                    jnp.tril(packed[:bw, :bw], -1) + jnp.eye(bw, dtype=a.dtype),
                    unit=True, base=bw)
                u12 = matmul(None, l11inv, tp[:bw, k + bw:],
                             precision=jax.lax.Precision.HIGHEST)
                low = tp[bw:, k + bw:] - matmul(None, packed[bw:], u12)
                pieces_top.append(u12)
                pieces_bot.append(low)
            top = jnp.concatenate(pieces_top, 1) if len(pieces_top) > 1 \
                else pieces_top[0]
            bot = jnp.concatenate(pieces_bot, 1) if len(pieces_bot) > 1 \
                else pieces_bot[0]
            t = jnp.concatenate([t[:k], top, bot], axis=0)
        strips[J] = jnp.concatenate([strips[J][:K], t], axis=0) if K else t
        perm = jnp.concatenate([perm[:K], jnp.take(perm[K:], gperm)])
        gperms.append(gperm)
        if J + 1 < len(starts):
            l11o = jnp.tril(t[:ow, :ow], -1) + jnp.eye(ow, dtype=a.dtype)
            l11o_inv = invert_lower_triangular(l11o, unit=True, base=256)
            for j in range(J + 1, len(starts)):
                rj = jnp.take(strips[j][K:], gperm, axis=0)
                u12j = matmul(None, l11o_inv, rj[:ow],
                              precision=jax.lax.Precision.HIGHEST)
                lowj = rj[ow:] - matmul(None, t[ow:, :ow], u12j)
                strips[j] = jnp.concatenate(
                    [strips[j][:K], u12j, lowj], axis=0)

    # later blocks' permutations, composed backward, applied once per strip
    tails = _compose_tails(gperms, [s.shape[1] for s in strips])
    for J, K in enumerate(starts):
        ow = strips[J].shape[1]
        if tails[J] is not None and m - K > ow:
            idx = jnp.concatenate(
                [jnp.arange(ow, dtype=jnp.int32), ow + tails[J]])
            strips[J] = jnp.concatenate(
                [strips[J][:K], jnp.take(strips[J][K:], idx, axis=0)], axis=0)
    out = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=1)
    return out, perm, LuInfo(transposition_count=nt, success=ok)


@functools.partial(jax.jit, static_argnames=("params",))
def lu_in_place(a, params: PartialPivLuParams | None = None):
    """Blocked partial-pivot LU: returns ``(lu, row_perm, info)``.

    ``lu`` packs unit-lower L (strict) and U; ``row_perm`` satisfies
    ``A[row_perm, :] = L @ U``. faer ``lu_in_place``
    (``lu/partial_pivoting/factor.rs:234``). Panels factor recursively
    (``_panel_lu_blocked``); the U12 solve is one GEMM against the unit-lower
    panel inverse; matrix writes are in-place slice updates.  Large f32
    squares route through the fused-panel two-level driver
    (``_lu_factor_v5``).
    """
    params = params or PartialPivLuParams.auto(a.dtype, a.shape)
    m, n = a.shape
    kmax = min(m, n)
    # 512-wide panels measured fastest at 4096 f32 on v5e (5.0 vs 4.4 TF/s)
    block = params.block_size or (512 if kmax >= 2048 else
                                  256 if kmax >= 1024 else
                                  64 if kmax >= 128 else kmax)
    from faer_tpu.core.config import panel_kernels_enabled

    # leaf width 256 measured ~5% faster than 128 at (4096, 512) panels
    # (one fewer coupling level); a single 512-wide kernel is slower (1.55 vs
    # 1.06 ms) — the GEMM couplings beat in-kernel chunked rank-8 updates
    if panel_kernels_enabled(a.dtype):
        leaf = params.kernel_leaf if params.kernel_leaf is not None else 256
        leaf = min(max(128, ((leaf + 127) // 128) * 128), 512)
        if m == n and n % 256 == 0 and n >= 1024:
            return _lu_factor_v5(a, block=256, ob=1024 if n >= 2048 else 256)
    else:
        leaf = params.recursion_threshold
    base = min(leaf, block)
    perm = jnp.arange(m, dtype=jnp.int32)
    nt = jnp.zeros((), jnp.int32)
    ok = jnp.ones((), jnp.bool_)

    # right-looking over a *shrinking* trail; finished panels and U12 rows are
    # kept as separate buffers and assembled once at the end (the previous
    # dynamic_update_slice formulation paid a full n² copy per panel write).
    trail = a                 # (m - k, n - k)
    panels = []               # [(k, packed (m-k, bw))]
    u12s = {}                 # k -> (bw, n - k - bw), finalized U rows
    local_perms = []
    for k in range(0, kmax, block):
        bw = min(block, kmax - k)
        panel, local_perm, pnt, pok = _panel_lu_blocked(trail[:, :bw], base)
        nt = nt + pnt
        ok = ok & pok
        perm = perm.at[k:].set(jnp.take(perm[k:], local_perm))
        local_perms.append(local_perm)
        if k + bw < n:
            from faer_tpu.ops.triangular import invert_lower_triangular

            right = jnp.take(trail[:, bw:], local_perm, axis=0)
            l11inv = invert_lower_triangular(
                jnp.tril(panel[:bw, :bw], -1) + jnp.eye(bw, dtype=a.dtype),
                unit=True, base=bw)
            u12 = matmul(None, l11inv, right[:bw],
                         precision=jax.lax.Precision.HIGHEST)
            u12s[k] = u12
            if m - k - bw > 0:
                trail = right[bw:] - matmul(None, panel[bw:, :bw], u12)
        panels.append((k, panel))

    # compose the later panels' row permutations backward so each strip is
    # gathered exactly ONCE (not re-permuted on every subsequent panel)
    tails = _compose_tails(local_perms, [p.shape[1] for _, p in panels])
    for j, (ks, panel) in enumerate(panels):
        bwj = panel.shape[1]
        if tails[j] is not None and panel.shape[0] > bwj:
            idx = jnp.concatenate(
                [jnp.arange(bwj, dtype=jnp.int32), bwj + tails[j]])
            panels[j] = (ks, jnp.take(panel, idx, axis=0))

    # assemble the packed LU: column strip j = stacked U12 pieces from earlier
    # panels + its own packed panel (+ zero fill below for m > n strips)
    strips = []
    starts = [ks for ks, _ in panels]
    for idx, (ks, panel) in enumerate(panels):
        bw = panel.shape[1]
        pieces = []
        for i in range(idx):
            ksi, bwi = starts[i], panels[i][1].shape[1]
            pieces.append(u12s[ksi][:, ks - ksi - bwi: ks - ksi - bwi + bw])
        pieces.append(panel)
        strips.append(jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                      else panel)
    if n > kmax:
        # wide matrices: trailing columns are pure U12 stacks
        ktop = starts[-1]
        tailcols = []
        for i, (ksi, p) in enumerate(panels):
            bwi = p.shape[1]
            if ksi in u12s:
                tailcols.append(u12s[ksi][:, kmax - ksi - bwi:])
        rest = jnp.concatenate(tailcols, axis=0)
        if rest.shape[0] < m:
            rest = jnp.concatenate(
                [rest, jnp.zeros((m - rest.shape[0], rest.shape[1]), a.dtype)],
                axis=0)
        strips.append(rest)
        del ktop
    out = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=1)

    info = LuInfo(transposition_count=nt, success=ok)
    return out, perm, info


def _compose_tails(local_perms, widths):
    """Compose block-local permutations backward: ``tails[j]`` maps final
    trail order to pre-block-(j+1) order, so each finished strip is gathered
    exactly once (shared by the partial- and full-pivot assemblies)."""
    tails = [None] * len(local_perms)
    tail_next = None
    for j in range(len(local_perms) - 1, -1, -1):
        lp = local_perms[j]
        bwj = widths[j]
        if tail_next is None or lp.shape[0] <= bwj:
            t_j = lp
        else:
            t_j = jnp.concatenate([lp[:bwj], jnp.take(lp[bwj:], tail_next)])
        tails[j] = tail_next
        tail_next = t_j
    return tails


def _full_piv_block(trail, bw: int):
    """``bw`` steps of full pivoting on the whole (shrunk) trail: global
    argmax, row+col swaps, rank-1 update — the faer fused-kernel structure
    (``lu/full_pivoting/factor.rs:466``) as one masked ``fori_loop``."""
    mk, nk = trail.shape
    rdt = dtypes.real_dtype_of(trail.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (mk, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, nk), 1)[0]

    def body(j, state):
        a, rperm, cperm, nt, ok = state
        mag = jnp.abs(a).astype(rdt)
        mag = jnp.where((rows[:, None] >= j) & (cols[None, :] >= j), mag, -1)
        flat = jnp.argmax(mag)
        p = (flat // nk).astype(jnp.int32)
        q = (flat % nk).astype(jnp.int32)
        a = permod.swap_rows(a, j, p)
        rperm = permod.swap_rows(rperm, j, p)
        a = permod.swap_cols(a, j, q)
        cperm = permod.swap_rows(cperm, j, q)
        nt = nt + jnp.where(p != j, 1, 0) + jnp.where(q != j, 1, 0)
        pivot = a[j, j]
        ok = ok & (pivot != 0)
        safe = jnp.where(pivot == 0, jnp.ones_like(pivot), pivot)
        below = rows > j
        mult = jnp.where(below, a[:, j] / safe, a[:, j])
        a = a.at[:, j].set(mult)
        upd = jnp.where(below[:, None] & (cols > j)[None, :],
                        mult[:, None] * a[j, :][None, :], 0)
        return a - upd, rperm, cperm, nt, ok

    init = (trail, jnp.arange(mk, dtype=jnp.int32),
            jnp.arange(nk, dtype=jnp.int32), jnp.zeros((), jnp.int32),
            jnp.ones((), jnp.bool_))
    return jax.lax.fori_loop(0, bw, body, init)


@functools.partial(jax.jit, static_argnames=("params",))
def full_piv_lu_in_place(a, params: FullPivLuParams | None = None):
    """Full-pivot LU: returns ``(lu, row_perm, col_perm, info)``.

    ``A[row_perm][:, col_perm] = L @ U``.  Blocked over a SHRINKING trail:
    each block runs ``bw`` fused argmax+update steps on the current trail
    (full pivoting must update everything before each pivot search, so the
    trailing update cannot be deferred — but carrying an explicitly shrunk
    trail cuts the per-step touched area from n² to (n−k)², ~3× total
    traffic; the previous version was fully unblocked and pathological at
    4096).  faer ``lu_in_place`` (``lu/full_pivoting/factor.rs:466``).
    """
    del params
    m, n = a.shape
    kmax = min(m, n)
    block = 256 if kmax > 256 else kmax

    rperm = jnp.arange(m, dtype=jnp.int32)
    cperm = jnp.arange(n, dtype=jnp.int32)
    nt = jnp.zeros((), jnp.int32)
    ok = jnp.ones((), jnp.bool_)
    trail = a
    lrs, lcs = [], []             # block-local row / col permutations
    lstrips = []                  # [(k, (m−k, bw) diag+L column strip)]
    u12s = {}                     # k -> (bw, n−k−bw) finalized U rows
    ks_list = []
    for k in range(0, kmax, block):
        bw = min(block, kmax - k)
        tp, lr, lc, bnt, bok = _full_piv_block(trail, bw)
        rperm = rperm.at[k:].set(jnp.take(rperm[k:], lr))
        cperm = cperm.at[k:].set(jnp.take(cperm[k:], lc))
        nt = nt + bnt
        ok = ok & bok
        lrs.append(lr)
        lcs.append(lc)
        ks_list.append(k)
        lstrips.append(tp[:, :bw])
        if k + bw < n:
            u12s[k] = tp[:bw, bw:]
        trail = tp[bw:, bw:]

    widths = [s.shape[1] for s in lstrips]
    # later blocks permute the remaining trail rows (affecting earlier L
    # strips below their diagonal) AND the remaining trail cols (affecting
    # earlier U12 strips): compose both backward, gather each strip once
    row_tails = _compose_tails(lrs, widths)
    col_tails = _compose_tails(lcs, widths)
    for j, strip in enumerate(lstrips):
        bwj = widths[j]
        if row_tails[j] is not None and strip.shape[0] > bwj:
            idx = jnp.concatenate(
                [jnp.arange(bwj, dtype=jnp.int32), bwj + row_tails[j]])
            lstrips[j] = jnp.take(strip, idx, axis=0)
    for j, k in enumerate(ks_list):
        if k in u12s and col_tails[j] is not None:
            bwj = widths[j]
            u12s[k] = jnp.take(u12s[k], col_tails[j], axis=1)

    # assemble: column strip j = earlier blocks' U12 slices + its own L strip
    strips = []
    for j, k in enumerate(ks_list):
        bw = widths[j]
        pieces = []
        for i in range(j):
            ki, bwi = ks_list[i], widths[i]
            pieces.append(u12s[ki][:, k - ki - bwi: k - ki - bwi + bw])
        pieces.append(lstrips[j])
        strips.append(jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                      else lstrips[j])
    if n > kmax:
        tailcols = []
        for i, ki in enumerate(ks_list):
            if ki in u12s:
                tailcols.append(u12s[ki][:, kmax - ki - widths[i]:])
        rest = jnp.concatenate(tailcols, axis=0)
        if rest.shape[0] < m:
            rest = jnp.concatenate(
                [rest, jnp.zeros((m - rest.shape[0], rest.shape[1]), a.dtype)],
                axis=0)
        strips.append(rest)
    out = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=1)
    return out, rperm, cperm, LuInfo(transposition_count=nt, success=ok)


# ---------------------------------------------------------------------------
# solve / inverse / reconstruct (lu/partial_pivoting/{solve,inverse,...}.rs)
# ---------------------------------------------------------------------------

@jax.jit
def lu_solve(lu, row_perm, b):
    """Solve A x = b given the packed partial-pivot LU."""
    pb = jnp.take(b, row_perm, axis=0)
    y = solve_unit_lower_triangular(lu[:, :lu.shape[0]], pb)
    return solve_upper_triangular(lu[:lu.shape[1], :], y)


@jax.jit
def lu_solve_transpose(lu, row_perm, b):
    """Solve Aᵀ x = b: Aᵀ = Uᵀ Lᵀ Pᵀ...  x = P⁻¹ L⁻ᵀ U⁻ᵀ b."""
    from faer_tpu.ops.triangular_solve import (
        solve_lower_triangular_transpose,
        solve_upper_triangular_transpose,
    )

    y = solve_upper_triangular_transpose(lu, b)
    z = solve_lower_triangular_transpose(lu, y, unit=True)
    return permod.permute_rows_inverse(z, row_perm)


@jax.jit
def lu_reconstruct(lu, row_perm):
    """Rebuild A from the packed LU (faer ``reconstruct.rs``)."""
    m, n = lu.shape
    k = min(m, n)
    l = jnp.tril(lu[:, :k], -1) + jnp.eye(m, k, dtype=lu.dtype)
    u = jnp.triu(lu[:k, :])
    return permod.permute_rows_inverse(matmul(None, l, u), row_perm)


@jax.jit
def lu_inverse(lu, row_perm):
    """A⁻¹ from packed LU of a square matrix (faer ``inverse.rs``)."""
    n = lu.shape[0]
    return lu_solve(lu, row_perm, jnp.eye(n, dtype=lu.dtype))


@jax.jit
def full_piv_lu_solve(lu, row_perm, col_perm, b):
    pb = jnp.take(b, row_perm, axis=0)
    y = solve_unit_lower_triangular(lu[:, :lu.shape[0]], pb)
    x = solve_upper_triangular(lu[:lu.shape[1], :], y)
    return permod.permute_rows_inverse(x, col_perm)


@jax.jit
def full_piv_lu_reconstruct(lu, row_perm, col_perm):
    m, n = lu.shape
    k = min(m, n)
    l = jnp.tril(lu[:, :k], -1) + jnp.eye(m, k, dtype=lu.dtype)
    u = jnp.triu(lu[:k, :])
    a = matmul(None, l, u)
    a = permod.permute_rows_inverse(a, row_perm)
    return permod.permute_cols_inverse(a, col_perm)


@jax.jit
def lu_determinant(lu, row_perm, nt):
    """det(A) from packed LU + transposition count."""
    sign = jnp.where(nt % 2 == 0, 1.0, -1.0).astype(dtypes.real_dtype_of(lu.dtype))
    return jnp.prod(jnp.diagonal(lu)) * sign.astype(lu.dtype)
