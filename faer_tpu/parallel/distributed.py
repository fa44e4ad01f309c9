"""Distributed (multi-chip) factorizations: block-cyclic LLT / LU / QR over ICI.

SURVEY §2.7/§5.8: the TPU-native analogue of scaling the problem dimension is
a ScaLAPACK-style 1-D block-cyclic layout over a device mesh with explicit
collectives via ``shard_map``.  Round-3 rework (VERDICT ask #4): **per-panel**
communication and ``lax.fori_loop`` panel iteration (compile time independent
of the block count):

* LLT / QR — COLUMN-cyclic: global column block g lives on device ``g % P``
  (cyclic → load stays balanced as the trailing matrix shrinks).  Each panel
  step broadcasts the owner's panel with one ``psum`` (a zero-padded
  all-reduce rides ICI), the small panel factor is computed redundantly on
  every chip (cheaper than a second collective), and the O(n²b) trailing
  update runs locally on each chip's own column blocks.
* LU — ROW-cyclic with **tournament (CALU) pivoting**: each device selects b
  local candidate rows with a pivoted panel LU, one ``all_gather`` of the
  P·b candidate rows elects the panel's b pivots, one ``psum`` exchanges the
  displaced full rows, and one ``psum`` broadcasts the winning panel rows.
  Three collectives per PANEL (the round-2 code paid three per COLUMN).
  Reference analogue: faer's blocked partial-pivot LU
  (``lu/partial_pivoting/factor.rs:234``) with the pivot search distributed
  as in CALU/ScaLAPACK.  Tournament pivoting admits |L| slightly above 1
  (bounded by 2^levels) — the classic CALU trade for per-panel messaging.
* solves — block substitution with one ``psum`` broadcast per block, so the
  triangular solves are distributed too (not single-chip gathers).

Single-chip kernels stay mesh-agnostic (SURVEY §5.8); this module composes
them inside the shard_map body.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from faer_tpu.core.params import LltRegularization
from faer_tpu.linalg.cholesky import _llt_panel_recursive
from faer_tpu.ops.matmul import matmul
from faer_tpu.ops.triangular import invert_lower_triangular
from faer_tpu.ops.triangular_solve import (
    solve_unit_lower_triangular,
    solve_upper_triangular,
    solve_upper_triangular_on_right,
)

_i32 = jnp.int32


def _shard_map(body, mesh, in_specs, out_specs, check_rep=False):
    try:                                   # jax >= 0.8
        return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
    except (AttributeError, TypeError):    # older runtimes
        from jax.experimental.shard_map import shard_map

        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=check_rep)


# --------------------------------------------------------------------------
# cyclic <-> device-major layout shuffles (pure reshapes, no host loops)
# --------------------------------------------------------------------------


def _cyclic_to_local(a, nblocks: int, nproc: int, b: int):
    """(rows, n) column-cyclic → device-major column layout."""
    lb = nblocks // nproc
    r = a.shape[0]
    return (a.reshape(r, lb, nproc, b).transpose(0, 2, 1, 3)
            .reshape(r, nblocks * b))


def _local_to_cyclic(al, nblocks: int, nproc: int, b: int):
    lb = nblocks // nproc
    r = al.shape[0]
    return (al.reshape(r, nproc, lb, b).transpose(0, 2, 1, 3)
            .reshape(r, nblocks * b))


def _cyclic_rows_to_local(a, nblocks: int, nproc: int, b: int):
    lb = nblocks // nproc
    c = a.shape[1]
    return (a.reshape(lb, nproc, b, c).transpose(1, 0, 2, 3)
            .reshape(nblocks * b, c))


def _local_rows_to_cyclic(al, nblocks: int, nproc: int, b: int):
    lb = nblocks // nproc
    c = al.shape[1]
    return (al.reshape(nproc, lb, b, c).transpose(1, 0, 2, 3)
            .reshape(nblocks * b, c))


# --------------------------------------------------------------------------
# block-cyclic LLT (column-cyclic, one psum per panel)
# --------------------------------------------------------------------------


def block_cyclic_llt(a, mesh: Mesh, *, axis: str = "p", block: int = 64):
    """Distributed LLT of an SPD matrix over a 1-D mesh axis.

    Returns the lower factor L (replicated). The matrix must satisfy
    ``n % (block * P) == 0`` (pad upstream otherwise).
    """
    n = a.shape[0]
    nproc = mesh.shape[axis]
    assert n % (block * nproc) == 0, (n, block, nproc)
    nblocks = n // block
    lb_per = nblocks // nproc
    reg = LltRegularization()
    rows_iota = jnp.arange(n, dtype=_i32)

    def body(a_loc):
        # a_loc: (n, lb_per*block) — this device's cyclic column blocks
        p = jax.lax.axis_index(axis)
        gidx = jnp.arange(lb_per, dtype=_i32) * nproc + p
        colmask_g = jnp.repeat(gidx, block)
        row_ids = (gidx[:, None] * block
                   + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)

        def panel_step(g, a_loc):
            owner = g % nproc
            lb = g // nproc
            cand = jax.lax.dynamic_slice(a_loc, (0, lb * block), (n, block))
            cand = jnp.where(p == owner, cand, jnp.zeros_like(cand))
            panel = jax.lax.psum(cand, axis)      # broadcast owner's panel
            # redundant small panel factor on every chip
            diag = jax.lax.dynamic_slice(panel, (g * block, 0), (block, block))
            ldiag, _, _ = _llt_panel_recursive(diag, reg, min(64, block))
            linv = invert_lower_triangular(ldiag, base=block)
            below_m = (rows_iota >= (g + 1) * block)[:, None]
            lbelow = matmul(None, jnp.where(below_m, panel, 0),
                            jnp.conj(linv).T)
            lpanel = jnp.where(below_m, lbelow, jnp.zeros_like(lbelow))
            lpanel = jax.lax.dynamic_update_slice(lpanel, ldiag, (g * block, 0))
            stored = jax.lax.dynamic_update_slice(a_loc, lpanel, (0, lb * block))
            a_loc = jnp.where(p == owner, stored, a_loc)
            # trailing update of ALL this device's later blocks in ONE GEMM
            lrows = jnp.take(lpanel, row_ids, axis=0)      # (lb_per·b, b)
            upd = matmul(None, lpanel, jnp.conj(lrows).T)  # (n, lb_per·b)
            keep = colmask_g > g
            return jnp.where(keep[None, :], a_loc - upd, a_loc)

        return jax.lax.fori_loop(0, nblocks, panel_step, a_loc)

    from faer_tpu.core.config import platform_scope

    a_local = _cyclic_to_local(a, nblocks, nproc, block)
    fn = _shard_map(body, mesh, P(None, axis), P(None, axis))
    # gate fast-path kernels by the mesh's platform, not the default backend
    with platform_scope(mesh.devices.flat[0].platform):
        out_local = fn(a_local)
    l = _local_to_cyclic(out_local, nblocks, nproc, block)
    return jnp.tril(l)


def block_cyclic_llt_2d(a, mesh: Mesh, *, row_axis: str = "pr",
                        col_axis: str = "pc", block: int = 32):
    """Distributed LLT over a 2-D BLOCK-CYCLIC layout (ScaLAPACK ``pdpotrf``
    structure): block (i, j) lives on device (i mod pr, j mod pc); per step
    the k-panel is assembled with one ``psum`` per mesh axis and every device
    runs ONE local trailing GEMM on its own blocks — communication scales as
    O(n·b) per panel on each axis instead of the 1-D layout's full-matrix
    column traffic, and the trailing flops split pr·pc ways (SURVEY §5.8
    "2-D block-cyclic over ICI").

    Returns the lower factor L (replicated).  Requires
    ``n % (block·pr) == n % (block·pc) == 0``.
    """
    n = a.shape[0]
    pr = mesh.shape[row_axis]
    pc = mesh.shape[col_axis]
    assert n % (block * pr) == 0 and n % (block * pc) == 0, (n, block, pr, pc)
    nblocks = n // block
    lbr = nblocks // pr
    lbc = nblocks // pc
    reg = LltRegularization()
    rows_iota = jnp.arange(n, dtype=_i32)

    def body(a_loc):
        # a_loc: (lbr·b, lbc·b) — this device's 2-D cyclic blocks
        r = jax.lax.axis_index(row_axis)
        c = jax.lax.axis_index(col_axis)
        gi = jnp.arange(lbr, dtype=_i32) * pr + r
        gj = jnp.arange(lbc, dtype=_i32) * pc + c
        colmask_g = jnp.repeat(gj, block)
        grow_ids = (gi[:, None] * block
                    + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)
        gcol_ids = (gj[:, None] * block
                    + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)

        def step(k, a_loc):
            coln = k % pc
            lc = k // pc
            # my rows of panel k — live on device column k%pc only
            strip = jax.lax.dynamic_slice(a_loc, (0, lc * block),
                                          (lbr * block, block))
            strip = jnp.where(c == coln, strip, jnp.zeros_like(strip))
            strip = jax.lax.psum(strip, col_axis)
            # assemble the GLOBAL (n, b) panel: scatter my rows, psum rows
            panel = jnp.zeros((n, block), a_loc.dtype).at[grow_ids].set(strip)
            panel = jax.lax.psum(panel, row_axis)
            diag = jax.lax.dynamic_slice(panel, (k * block, 0), (block, block))
            ldiag, _, _ = _llt_panel_recursive(diag, reg, min(64, block))
            linv = invert_lower_triangular(ldiag, base=block)
            below = (rows_iota >= (k + 1) * block)[:, None]
            lpanel = matmul(None, jnp.where(below, panel, 0),
                            jnp.conj(linv).T)
            lpanel = jnp.where(below, lpanel, jnp.zeros_like(lpanel))
            lpanel = jax.lax.dynamic_update_slice(lpanel, ldiag,
                                                  (k * block, 0))
            # store my rows of the finished panel back (owner column only)
            mine = jnp.take(lpanel, grow_ids, axis=0)
            stored = jax.lax.dynamic_update_slice(a_loc, mine, (0, lc * block))
            a_loc = jnp.where(c == coln, stored, a_loc)
            # one LOCAL trailing GEMM: A_ij −= L_ik L_jkᴴ on my blocks j > k
            lcols = jnp.take(lpanel, gcol_ids, axis=0)
            upd = matmul(None, mine, jnp.conj(lcols).T)
            keep = (colmask_g > k)[None, :]
            return jnp.where(keep, a_loc - upd, a_loc)

        return jax.lax.fori_loop(0, nblocks, step, a_loc)

    from faer_tpu.core.config import platform_scope

    a2 = _cyclic_to_local(a, nblocks, pc, block)
    a2 = _cyclic_rows_to_local(a2, nblocks, pr, block)
    fn = _shard_map(body, mesh, P(row_axis, col_axis), P(row_axis, col_axis))
    with platform_scope(mesh.devices.flat[0].platform):
        out_local = fn(a2)
    l = _local_rows_to_cyclic(out_local, nblocks, pr, block)
    l = _local_to_cyclic(l, nblocks, pc, block)
    return jnp.tril(l)


def block_cyclic_llt_solve(l, b_rhs, mesh: Mesh | None = None, *,
                           axis: str = "p", block: int = 64):
    """Solve from the distributed LLT factor.

    With a mesh: distributed block forward/back substitution (one ``psum``
    broadcast per block — SURVEY §5.8); without: single-chip TRSMs.
    """
    from faer_tpu.linalg.cholesky import llt_solve

    if mesh is None:
        return llt_solve(l, b_rhs)
    y = _dist_lower_solve(l, b_rhs, mesh, axis=axis, block=block, unit=False)
    return _dist_upper_solve(jnp.conj(l).T, y, mesh, axis=axis, block=block)


def _dist_lower_solve(l, b_rhs, mesh: Mesh, *, axis: str, block: int,
                      unit: bool):
    """Distributed block forward substitution: L column-cyclic, one ``psum``
    broadcast of each solved block of x per step."""
    n = l.shape[0]
    nproc = mesh.shape[axis]
    assert n % (block * nproc) == 0, (n, block, nproc)
    nblocks = n // block
    rows_iota = jnp.arange(n, dtype=_i32)

    def body(l_loc, b_loc):
        p = jax.lax.axis_index(axis)

        def step(g, st):
            x, rhs = st
            owner = g % nproc
            lb = g // nproc
            lcol = jax.lax.dynamic_slice(l_loc, (0, lb * block), (n, block))
            lcol = jnp.where(p == owner, lcol, jnp.zeros_like(lcol))
            lcol = jax.lax.psum(lcol, axis)        # broadcast L[:, g-block]
            lgg = jax.lax.dynamic_slice(lcol, (g * block, 0), (block, block))
            rg = jax.lax.dynamic_slice(rhs, (g * block, 0),
                                       (block, rhs.shape[1]))
            xg = (solve_unit_lower_triangular(lgg, rg) if unit else
                  jax.lax.linalg.triangular_solve(lgg, rg, left_side=True,
                                                  lower=True))
            x = jax.lax.dynamic_update_slice(x, xg, (g * block, 0))
            below = (rows_iota >= (g + 1) * block)[:, None]
            upd = matmul(None, jnp.where(below, lcol, 0), xg)
            rhs = jnp.where(below, rhs - upd, rhs)
            return x, rhs

        x, _ = jax.lax.fori_loop(0, nblocks, step, (b_loc * 0.0, b_loc))
        return x

    from faer_tpu.core.config import platform_scope

    l_local = _cyclic_to_local(l, nblocks, nproc, block)
    fn = _shard_map(body, mesh, (P(None, axis), P(None, None)), P(None, None))
    with platform_scope(mesh.devices.flat[0].platform):
        return fn(l_local, b_rhs)


def _dist_upper_solve(u, b_rhs, mesh: Mesh, *, axis: str, block: int,
                      unit: bool = False):
    """Distributed block back substitution for a ROW-replicated upper factor
    handed in column-cyclic layout."""
    n = u.shape[0]
    nproc = mesh.shape[axis]
    nblocks = n // block
    rows_iota = jnp.arange(n, dtype=_i32)

    def body(u_loc, b_loc):
        p = jax.lax.axis_index(axis)

        def step(t, st):
            x, rhs = st
            g = nblocks - 1 - t
            owner = g % nproc
            lb = g // nproc
            ucol = jax.lax.dynamic_slice(u_loc, (0, lb * block), (n, block))
            ucol = jnp.where(p == owner, ucol, jnp.zeros_like(ucol))
            ucol = jax.lax.psum(ucol, axis)
            ugg = jax.lax.dynamic_slice(ucol, (g * block, 0), (block, block))
            rg = jax.lax.dynamic_slice(rhs, (g * block, 0),
                                       (block, rhs.shape[1]))
            xg = jax.lax.linalg.triangular_solve(ugg, rg, left_side=True,
                                                 lower=False,
                                                 unit_diagonal=unit)
            x = jax.lax.dynamic_update_slice(x, xg, (g * block, 0))
            above = (rows_iota < g * block)[:, None]
            upd = matmul(None, jnp.where(above, ucol, 0), xg)
            rhs = jnp.where(above, rhs - upd, rhs)
            return x, rhs

        x, _ = jax.lax.fori_loop(0, nblocks, step, (b_loc * 0.0, b_loc))
        return x

    from faer_tpu.core.config import platform_scope

    u_local = _cyclic_to_local(u, nblocks, nproc, block)
    fn = _shard_map(body, mesh, (P(None, axis), P(None, None)), P(None, None))
    with platform_scope(mesh.devices.flat[0].platform):
        return fn(u_local, b_rhs)


# ---------------------------------------------------------------------------
# block-cyclic partial-pivot LU (row-cyclic) with tournament (CALU) pivoting:
# three collectives per PANEL — candidate all_gather, row-exchange psum,
# panel-row psum (SURVEY §5.8; VERDICT round-2 ask #4)
# ---------------------------------------------------------------------------


def _local_candidates(w, active, nsel: int):
    """Pivoted elimination on the local panel block ``w`` (m_loc, b)
    restricted to ``active`` rows; returns the first ``nsel`` pivot-row
    local indices and their validity."""
    m_loc = w.shape[0]
    iota = jnp.arange(m_loc, dtype=_i32)

    def step(j, st):
        wk, avail, sel, val = st
        colj = jax.lax.dynamic_index_in_dim(wk, j, axis=1, keepdims=False)
        cand = jnp.where(avail, jnp.abs(colj), -jnp.ones_like(colj))
        i = jnp.argmax(cand).astype(_i32)
        good = cand[i] >= 0
        sel = sel.at[j].set(i)
        val = val.at[j].set(good)
        avail = avail & (iota != i)
        pivrow = wk[i]
        pv = pivrow[j]
        safe = jnp.where(pv == 0, jnp.ones_like(pv), pv)
        mult = jnp.where(avail, colj / safe, jnp.zeros_like(colj))
        wk = wk - mult[:, None] * pivrow[None, :]
        return wk, avail, sel, val

    _, _, sel, val = jax.lax.fori_loop(
        0, nsel, step,
        (jnp.where(active[:, None], w, 0), active,
         jnp.zeros((nsel,), _i32), jnp.zeros((nsel,), bool)))
    return sel, val


def _tournament(stacked, grows, valid, nsel: int):
    """Redundant final round: pivoted elimination over the stacked candidate
    panel rows; returns the winning global row positions (pivot order)."""
    rows = stacked.shape[0]
    iota = jnp.arange(rows, dtype=_i32)

    def step(j, st):
        wk, avail, win = st
        colj = jax.lax.dynamic_index_in_dim(wk, j, axis=1, keepdims=False)
        cand = jnp.where(avail, jnp.abs(colj), -jnp.ones_like(colj))
        i = jnp.argmax(cand).astype(_i32)
        win = win.at[j].set(grows[i])
        avail = avail & (iota != i)
        pivrow = wk[i]
        pv = pivrow[j]
        safe = jnp.where(pv == 0, jnp.ones_like(pv), pv)
        mult = jnp.where(avail, colj / safe, jnp.zeros_like(colj))
        wk = wk - mult[:, None] * pivrow[None, :]
        return wk, avail, win

    _, _, win = jax.lax.fori_loop(
        0, nsel, step,
        (jnp.where(valid[:, None], stacked, 0), valid,
         jnp.zeros((nsel,), _i32)))
    return win


def _unpivoted_lu_packed(w):
    """In-order LU of the (b, b) tournament-winner block: L\\U packed, plus
    an all-pivots-nonzero flag."""
    b = w.shape[0]
    iota = jnp.arange(b, dtype=_i32)

    def step(j, st):
        w, ok = st
        pv = jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(w, j, axis=0, keepdims=False),
            j, axis=0, keepdims=False)
        ok = ok & (pv != 0)
        safe = jnp.where(pv == 0, jnp.ones_like(pv), pv)
        colj = jax.lax.dynamic_index_in_dim(w, j, axis=1, keepdims=False)
        below = iota > j
        mult = jnp.where(below, colj / safe, colj)
        w = jax.lax.dynamic_update_slice(w, mult[:, None], (0, j))
        pivrow = jax.lax.dynamic_index_in_dim(w, j, axis=0, keepdims=False)
        right = iota > j
        upd = jnp.where(below[:, None] & right[None, :],
                        mult[:, None] * pivrow[None, :], 0)
        return w - upd, ok

    return jax.lax.fori_loop(0, b, step, (w, jnp.ones((), bool)))


def block_cyclic_lu(a, mesh: Mesh, *, axis: str = "p", block: int = 64):
    """Distributed LU over a 1-D ROW-cyclic layout with tournament (CALU)
    pivoting.

    Returns ``(lu_packed, row_perm, ok)`` replicated, with
    ``A[row_perm, :] = L U``.  Per panel: local candidate selection (pivoted
    local panel LU), one ``all_gather`` electing b pivots, one ``psum`` row
    exchange, one ``psum`` panel-row broadcast, then local trailing GEMM.
    Tournament pivoting bounds |L| by 2^levels (not 1) — the CALU trade.
    """
    n = a.shape[0]
    nproc = mesh.shape[axis]
    assert n % (block * nproc) == 0, (n, block, nproc)
    nblocks = n // block
    lb_per = nblocks // nproc
    m_loc = lb_per * block
    cols_iota = jnp.arange(n, dtype=_i32)
    ex = 2 * block                      # row-exchange buffer slots

    def body(a_loc):
        p = jax.lax.axis_index(axis)
        gidx = jnp.arange(lb_per, dtype=_i32) * nproc + p
        grow = (gidx[:, None] * block
                + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)

        def panel_step(g, st):
            a_loc, perm, ok = st
            k = g * block
            pe = k + block
            owner = g % nproc
            lb = g // nproc

            # --- 1. local candidate selection on the panel columns
            pcols = jax.lax.dynamic_slice(a_loc, (0, k), (m_loc, block))
            active = grow >= k
            sel, val = _local_candidates(pcols, active, block)
            cand_vals = jnp.take(pcols, sel, axis=0)          # (b, b)
            cand_grow = jnp.where(val, jnp.take(grow, sel), n)

            # --- 2. tournament: one all_gather of the candidates
            gv = jax.lax.all_gather(cand_vals, axis)          # (P, b, b)
            gg = jax.lax.all_gather(cand_grow, axis)          # (P, b)
            gval = jax.lax.all_gather(val, axis)
            win = _tournament(gv.reshape(-1, block), gg.reshape(-1),
                              gval.reshape(-1), block)        # (b,) positions

            # --- 3. swap bookkeeping (replicated, b fori steps on (n,) ints)
            def swapstep(j, rowat):
                wj = win[j]
                q = jnp.argmax(rowat == wj).astype(_i32)
                d = k + j
                rd, rq = rowat[d], rowat[q]
                return rowat.at[d].set(rq).at[q].set(rd)

            rowat = jax.lax.fori_loop(0, block, swapstep, cols_iota)
            perm = jnp.take(perm, rowat)

            # --- 4. one psum row exchange of the displaced full rows
            moved = rowat != cols_iota
            mpos = jnp.sort(jnp.where(moved, cols_iota, n))[:ex]   # dests
            msrc = jnp.where(mpos < n,
                             jnp.take(rowat, jnp.minimum(mpos, n - 1)), n)
            smask = (msrc[:, None] == grow[None, :])
            contrib = matmul(None, smask.astype(a_loc.dtype), a_loc)
            rows_src = jax.lax.psum(contrib, axis)            # (2b, n)
            wmask = (grow[:, None] == mpos[None, :])
            replaced = matmul(None, wmask.astype(a_loc.dtype), rows_src)
            a_loc = jnp.where(jnp.any(wmask, axis=1)[:, None], replaced, a_loc)

            # --- 5. one psum broadcast of the (post-exchange) panel rows
            pmask = ((k + jnp.arange(block, dtype=_i32))[:, None]
                     == grow[None, :])
            panel_rows = jax.lax.psum(
                matmul(None, pmask.astype(a_loc.dtype), a_loc), axis)  # (b, n)

            # --- 6. redundant panel factor + local trailing update
            w11 = jax.lax.dynamic_slice(panel_rows, (0, k), (block, block))
            packed11, pok = _unpivoted_lu_packed(w11)
            ok = ok & pok
            l11 = jnp.tril(packed11, -1) + jnp.eye(block, dtype=a_loc.dtype)
            u11 = jnp.triu(packed11)
            u12 = solve_unit_lower_triangular(l11, panel_rows)     # (b, n)
            after = (cols_iota >= pe)[None, :]
            u12 = jnp.where(after, u12, 0)
            # owner stores [prior-L | L11\U11 | U12] in the panel rows
            newrows = jnp.where(after, u12, panel_rows)
            newrows = jax.lax.dynamic_update_slice(newrows, packed11, (0, k))
            stored = jax.lax.dynamic_update_slice(a_loc, newrows,
                                                  (lb * block, 0))
            a_loc = jnp.where(p == owner, stored, a_loc)
            # local L21 and one trailing GEMM
            below = (grow >= pe)[:, None]
            apan = jax.lax.dynamic_slice(a_loc, (0, k), (m_loc, block))
            l21 = solve_upper_triangular_on_right(u11, jnp.where(below, apan, 0))
            upd = matmul(None, l21, u12)
            a_loc = jnp.where(below, a_loc - upd, a_loc)
            l21_full = jax.lax.dynamic_update_slice(
                jnp.zeros_like(a_loc), l21, (0, k))
            pc = ((cols_iota >= k) & (cols_iota < pe))[None, :]
            a_loc = jnp.where(below & pc, l21_full, a_loc)
            return a_loc, perm, ok

        perm0 = cols_iota
        return jax.lax.fori_loop(
            0, nblocks, panel_step, (a_loc, perm0, jnp.ones((), bool)))

    from faer_tpu.core.config import platform_scope

    a_local = _cyclic_rows_to_local(a, nblocks, nproc, block)
    fn = _shard_map(body, mesh, P(axis, None), (P(axis, None), P(), P()))
    with platform_scope(mesh.devices.flat[0].platform):
        out_local, perm, ok = fn(a_local)
    lu = _local_rows_to_cyclic(out_local, nblocks, nproc, block)
    return lu, perm, ok


def block_cyclic_lu_2d(a, mesh: Mesh, *, row_axis: str = "pr",
                       col_axis: str = "pc", block: int = 32):
    """Distributed partial-pivot LU over a 2-D BLOCK-CYCLIC layout
    (ScaLAPACK ``pdgetrf`` structure with CALU tournament pivoting):
    block (i, j) on device (i mod pr, j mod pc).  Per panel: one ``psum``
    over ``pc`` ships the panel strip to every device column, candidates +
    one ``all_gather`` over ``pr`` elect the pivots (tournament), one
    ``psum`` over ``pr`` exchanges displaced row slices PER COLUMN, one
    ``psum`` over ``pr`` broadcasts the pivot rows, one ``psum`` over ``pc``
    broadcasts L21 — then every device runs ONE local trailing GEMM.

    Returns ``(lu_packed, row_perm, ok)`` replicated, ``A[row_perm] = L U``.
    """
    n = a.shape[0]
    pr = mesh.shape[row_axis]
    pc = mesh.shape[col_axis]
    assert n % (block * pr) == 0 and n % (block * pc) == 0, (n, block, pr, pc)
    nblocks = n // block
    lbr = nblocks // pr
    lbc = nblocks // pc
    m_loc = lbr * block
    nc_loc = lbc * block
    cols_iota = jnp.arange(n, dtype=_i32)
    ex = 2 * block

    def body(a_loc):
        r = jax.lax.axis_index(row_axis)
        c = jax.lax.axis_index(col_axis)
        gi = jnp.arange(lbr, dtype=_i32) * pr + r
        gj = jnp.arange(lbc, dtype=_i32) * pc + c
        grow = (gi[:, None] * block
                + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)
        gcol = (gj[:, None] * block
                + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)

        def panel_step(g, st):
            a_loc, perm, ok = st
            k = g * block
            pe = k + block
            coln = g % pc
            lc = g // pc

            # --- 1. ship the panel strip to every device column
            strip = jax.lax.dynamic_slice(a_loc, (0, lc * block),
                                          (m_loc, block))
            strip = jnp.where(c == coln, strip, jnp.zeros_like(strip))
            strip = jax.lax.psum(strip, col_axis)          # (m_loc, b)

            # --- 2. candidates + tournament over the row axis (redundant
            # across device columns so every column applies the same swaps)
            active = grow >= k
            sel, val = _local_candidates(strip, active, block)
            cand_vals = jnp.take(strip, sel, axis=0)
            cand_grow = jnp.where(val, jnp.take(grow, sel), n)
            gv = jax.lax.all_gather(cand_vals, row_axis)
            gg = jax.lax.all_gather(cand_grow, row_axis)
            gval = jax.lax.all_gather(val, row_axis)
            win = _tournament(gv.reshape(-1, block), gg.reshape(-1),
                              gval.reshape(-1), block)

            # --- 3. swap bookkeeping (replicated)
            def swapstep(j, rowat):
                wj = win[j]
                q = jnp.argmax(rowat == wj).astype(_i32)
                d = k + j
                rd, rq = rowat[d], rowat[q]
                return rowat.at[d].set(rq).at[q].set(rd)

            rowat = jax.lax.fori_loop(0, block, swapstep, cols_iota)
            perm = jnp.take(perm, rowat)

            # --- 4. per-column psum row exchange of displaced row slices
            moved = rowat != cols_iota
            mpos = jnp.sort(jnp.where(moved, cols_iota, n))[:ex]
            msrc = jnp.where(mpos < n,
                             jnp.take(rowat, jnp.minimum(mpos, n - 1)), n)
            smask = (msrc[:, None] == grow[None, :])
            contrib = matmul(None, smask.astype(a_loc.dtype), a_loc)
            rows_src = jax.lax.psum(contrib, row_axis)     # (2b, nc_loc)
            wmask = (grow[:, None] == mpos[None, :])
            replaced = matmul(None, wmask.astype(a_loc.dtype), rows_src)
            a_loc = jnp.where(jnp.any(wmask, axis=1)[:, None], replaced,
                              a_loc)

            # --- 5. pivot-row broadcast (per column) + w11 over columns
            pmask = ((k + jnp.arange(block, dtype=_i32))[:, None]
                     == grow[None, :])
            panel_rows = jax.lax.psum(
                matmul(None, pmask.astype(a_loc.dtype), a_loc),
                row_axis)                                   # (b, nc_loc)
            w11 = jax.lax.dynamic_slice(panel_rows, (0, lc * block),
                                        (block, block))
            w11 = jnp.where(c == coln, w11, jnp.zeros_like(w11))
            w11 = jax.lax.psum(w11, col_axis)
            packed11, pok = _unpivoted_lu_packed(w11)
            ok = ok & pok
            l11 = jnp.tril(packed11, -1) + jnp.eye(block, dtype=a_loc.dtype)
            u11 = jnp.triu(packed11)
            u12 = solve_unit_lower_triangular(l11, panel_rows)  # (b, nc_loc)
            after = (gcol >= pe)[None, :]
            u12 = jnp.where(after, u12, 0)
            # owner row-block stores [U12 | packed11] in its pivot rows
            newrows = jnp.where(after, u12, panel_rows)
            incol = ((gcol >= k) & (gcol < pe))[None, :]
            p11_local = jax.lax.dynamic_update_slice(
                jnp.zeros_like(newrows), packed11, (0, lc * block))
            newrows = jnp.where(incol & (c == coln), p11_local, newrows)
            stow = matmul(None, pmask.astype(a_loc.dtype).T, newrows)
            own_rows = jnp.any(pmask, axis=0)[:, None]      # my pivot rows
            a_loc = jnp.where(own_rows, stow, a_loc)

            # --- 6. L21 on the owner column, broadcast over pc, local GEMM
            below = (grow >= pe)[:, None]
            strip2 = jax.lax.dynamic_slice(a_loc, (0, lc * block),
                                           (m_loc, block))
            strip2 = jnp.where((c == coln) & below, strip2,
                               jnp.zeros_like(strip2))
            strip2 = jax.lax.psum(strip2, col_axis)
            l21 = solve_upper_triangular_on_right(u11, strip2)
            upd = matmul(None, l21, u12)
            a_loc = jnp.where(below, a_loc - upd, a_loc)
            # owner column stores L21 in the panel columns
            l21_store = jax.lax.dynamic_update_slice(
                jnp.zeros_like(a_loc), l21, (0, lc * block))
            put = below & incol & (c == coln)
            a_loc = jnp.where(put, l21_store, a_loc)
            return a_loc, perm, ok

        return jax.lax.fori_loop(0, nblocks, panel_step,
                                 (a_loc, cols_iota, jnp.ones((), bool)))

    from faer_tpu.core.config import platform_scope

    a2 = _cyclic_to_local(a, nblocks, pc, block)
    a2 = _cyclic_rows_to_local(a2, nblocks, pr, block)
    fn = _shard_map(body, mesh, P(row_axis, col_axis),
                    (P(row_axis, col_axis), P(), P()))
    with platform_scope(mesh.devices.flat[0].platform):
        out_local, perm, ok = fn(a2)
    lu = _local_rows_to_cyclic(out_local, nblocks, pr, block)
    lu = _local_to_cyclic(lu, nblocks, pc, block)
    return lu, perm, ok


def block_cyclic_lu_solve(lu, perm, b_rhs, mesh: Mesh | None = None, *,
                          axis: str = "p", block: int = 64):
    """Solve from the distributed LU factor; distributed block substitution
    when a mesh is given."""
    pb = jnp.take(b_rhs, perm, axis=0)
    if mesh is None:
        y = solve_unit_lower_triangular(jnp.tril(lu, -1) + jnp.eye(
            lu.shape[0], dtype=lu.dtype), pb)
        return solve_upper_triangular(jnp.triu(lu), y)
    y = _dist_lower_solve(jnp.tril(lu, -1) + jnp.eye(lu.shape[0], dtype=lu.dtype),
                          pb, mesh, axis=axis, block=block, unit=True)
    return _dist_upper_solve(jnp.triu(lu), y, mesh, axis=axis, block=block)


# ---------------------------------------------------------------------------
# block-cyclic Householder QR (column-cyclic): panel broadcast + redundant
# compact-WY factor + local trailing block applies, fori_loop over panels
# (static shapes via row-roll so the active sub-panel starts at row 0)
# ---------------------------------------------------------------------------


def block_cyclic_qr(a, mesh: Mesh, *, axis: str = "p", block: int = 64):
    """Distributed blocked Householder QR over a 1-D COLUMN-cyclic layout.

    Returns ``(packed, t_stack)`` replicated: R in the upper triangle,
    reflector tails below, compact-WY T per panel — the same contract as
    ``linalg.qr.qr_in_place``.
    """
    from faer_tpu.linalg.qr import _extract_v, _panel_qr_blocked
    from faer_tpu.ops.householder import apply_block_on_left, form_block_t

    m, n = a.shape
    nproc = mesh.shape[axis]
    assert n % (block * nproc) == 0, (n, block, nproc)
    nblocks = n // block
    lb_per = nblocks // nproc
    rows_iota = jnp.arange(m, dtype=_i32)

    def body(a_loc):
        p = jax.lax.axis_index(axis)
        gidx = jnp.arange(lb_per, dtype=_i32) * nproc + p
        colmask_g = jnp.repeat(gidx, block)
        ts0 = jnp.zeros((nblocks, block, block), a_loc.dtype)

        def panel_step(g, st):
            a_loc, ts = st
            owner = g % nproc
            lb = g // nproc
            cand = jax.lax.dynamic_slice(a_loc, (0, lb * block), (m, block))
            cand = jnp.where(p == owner, cand, jnp.zeros_like(cand))
            panel = jax.lax.psum(cand, axis)      # broadcast owner's panel
            # roll the active sub-panel [g·b, m) to row 0 (static shapes);
            # the wrapped-around top rows are masked out of the factorization
            shift = g * block
            act = (rows_iota < m - shift)[:, None]
            sub = jnp.where(act, jnp.roll(panel, -shift, axis=0), 0)
            packed_sub, taus = _panel_qr_blocked(sub, 32)
            v = _extract_v(packed_sub, block)
            t = form_block_t(v, taus)
            ts = jax.lax.dynamic_update_slice(ts, t[None], (g, 0, 0))
            back = jnp.roll(jnp.where(act, packed_sub, 0), shift, axis=0)
            new_panel = jnp.where((rows_iota >= shift)[:, None], back, panel)
            stored = jax.lax.dynamic_update_slice(a_loc, new_panel,
                                                  (0, lb * block))
            a_loc = jnp.where(p == owner, stored, a_loc)
            # local trailing block-reflector apply on later column blocks
            tail = jnp.where(act, jnp.roll(a_loc, -shift, axis=0), 0)
            applied = apply_block_on_left(v, t, tail, adjoint=True)
            applied = jnp.roll(jnp.where(act, applied, 0), shift, axis=0)
            keep = (colmask_g > g)[None, :] & (rows_iota >= shift)[:, None]
            return jnp.where(keep, applied, a_loc), ts

        return jax.lax.fori_loop(0, nblocks, panel_step, (a_loc, ts0))

    from faer_tpu.core.config import platform_scope

    a_local = _cyclic_to_local(a, nblocks, nproc, block)
    fn = _shard_map(body, mesh, P(None, axis), (P(None, axis), P()))
    with platform_scope(mesh.devices.flat[0].platform):
        out_local, t_stack = fn(a_local)
    packed = _local_to_cyclic(out_local, nblocks, nproc, block)
    return packed, t_stack


def block_cyclic_qr_lstsq(packed, t_stack, b_rhs, mesh: Mesh, *,
                          axis: str = "p", block: int = 64):
    """Distributed least-squares solve: panel-sequential Qᴴ apply (one panel
    ``psum`` broadcast per step) + distributed R back substitution."""
    from faer_tpu.linalg.qr import _extract_v
    from faer_tpu.ops.householder import apply_block_on_left

    m, n = packed.shape
    nproc = mesh.shape[axis]
    nblocks = n // block
    rows_iota = jnp.arange(m, dtype=_i32)

    def body(p_loc, b_loc):
        p = jax.lax.axis_index(axis)

        def step(g, qtb):
            owner = g % nproc
            lb = g // nproc
            cand = jax.lax.dynamic_slice(p_loc, (0, lb * block), (m, block))
            cand = jnp.where(p == owner, cand, jnp.zeros_like(cand))
            panel = jax.lax.psum(cand, axis)
            shift = g * block
            act = (rows_iota < m - shift)[:, None]
            v = _extract_v(jnp.where(act, jnp.roll(panel, -shift, axis=0), 0),
                           block)
            sub = jnp.where(act, jnp.roll(qtb, -shift, axis=0), 0)
            applied = apply_block_on_left(v, t_stack[g], sub, adjoint=True)
            applied = jnp.roll(jnp.where(act, applied, 0), shift, axis=0)
            return jnp.where((rows_iota >= shift)[:, None], applied, qtb)

        return jax.lax.fori_loop(0, nblocks, step, b_loc)

    from faer_tpu.core.config import platform_scope

    p_local = _cyclic_to_local(packed, nblocks, nproc, block)
    fn = _shard_map(body, mesh, (P(None, axis), P(None, None)), P(None, None))
    with platform_scope(mesh.devices.flat[0].platform):
        qtb = fn(p_local, b_rhs)
    r = jnp.triu(packed)[:n, :]
    return _dist_upper_solve(r, qtb[:n], mesh, axis=axis, block=block)


def block_cyclic_qr_2d(a, mesh: Mesh, *, row_axis: str = "pr",
                       col_axis: str = "pc", block: int = 32):
    """Distributed blocked Householder QR over a 2-D BLOCK-CYCLIC layout
    (ScaLAPACK ``pdgeqrf`` structure): block (i, j) on device
    (i mod pr, j mod pc).  Per panel g: one ``psum`` over ``pc`` ships the
    owner column's strip, one ``psum`` over ``pr`` assembles the global
    (m, b) panel, every device factors the active sub-panel redundantly
    (cheaper than shipping V + T back), and the trailing block-reflector
    apply is ONE partial-GEMM + ``psum`` over ``pr`` (W = VᴴA needs the full
    row space) followed by a local rank-b update — communication per panel
    is O(m·b + b·n/pc) instead of the 1-D layout's full column traffic, and
    the O(mnb) trailing flops split pr·pc ways.

    Returns ``(packed, t_stack)`` replicated — R in the upper triangle,
    reflector tails below, compact-WY T per panel (same contract as
    ``linalg.qr.qr_in_place``).  Requires ``m % (block·pr) == 0`` and
    ``n % (block·pc) == 0`` and ``m >= n``.

    Reference parity: faer blocked QR ``qr/no_pivoting/factor.rs:258`` with
    the panel/trailing split distributed as in ScaLAPACK pdgeqrf.
    """
    from faer_tpu.linalg.qr import _extract_v, _panel_qr_blocked
    from faer_tpu.ops.householder import form_block_t

    m, n = a.shape
    assert m >= n, (m, n)
    pr = mesh.shape[row_axis]
    pc = mesh.shape[col_axis]
    assert m % (block * pr) == 0 and n % (block * pc) == 0, (m, n, block,
                                                             pr, pc)
    mblocks = m // block
    nblocks = n // block
    lbr = mblocks // pr
    lbc = nblocks // pc
    m_loc = lbr * block
    rows_iota = jnp.arange(m, dtype=_i32)

    def body(a_loc):
        r = jax.lax.axis_index(row_axis)
        c = jax.lax.axis_index(col_axis)
        gi = jnp.arange(lbr, dtype=_i32) * pr + r
        gj = jnp.arange(lbc, dtype=_i32) * pc + c
        colmask_g = jnp.repeat(gj, block)
        grow_ids = (gi[:, None] * block
                    + jnp.arange(block, dtype=_i32)[None, :]).reshape(-1)
        ts0 = jnp.zeros((nblocks, block, block), a_loc.dtype)

        def panel_step(g, st):
            a_loc, ts = st
            coln = g % pc
            lc = g // pc
            shift = g * block

            # 1. ship owner column's strip across device columns
            strip = jax.lax.dynamic_slice(a_loc, (0, lc * block),
                                          (m_loc, block))
            strip = jnp.where(c == coln, strip, jnp.zeros_like(strip))
            strip = jax.lax.psum(strip, col_axis)
            # 2. assemble the global (m, b) panel over device rows
            panel = jnp.zeros((m, block), a_loc.dtype).at[grow_ids].set(strip)
            panel = jax.lax.psum(panel, row_axis)
            # 3. factor the active sub-panel redundantly (rows >= shift)
            act = (rows_iota < m - shift)[:, None]
            sub = jnp.where(act, jnp.roll(panel, -shift, axis=0), 0)
            packed_sub, taus = _panel_qr_blocked(sub, 32)
            v_sub = _extract_v(packed_sub, block)
            t = form_block_t(v_sub, taus)
            ts = jax.lax.dynamic_update_slice(ts, t[None], (g, 0, 0))
            # global-coordinate V: zero above the panel head
            v_glob = jnp.roll(jnp.where(act, v_sub, 0), shift, axis=0)
            v_glob = jnp.where((rows_iota >= shift)[:, None], v_glob, 0)
            # 4. store the finished panel back on its owner column
            back = jnp.roll(jnp.where(act, packed_sub, 0), shift, axis=0)
            new_panel = jnp.where((rows_iota >= shift)[:, None], back, panel)
            mine = jnp.take(new_panel, grow_ids, axis=0)
            stored = jax.lax.dynamic_update_slice(a_loc, mine,
                                                  (0, lc * block))
            a_loc = jnp.where(c == coln, stored, a_loc)
            # 5. trailing apply: W = Tᴴ (Vᴴ A_tail) — partial per device row,
            # one psum over pr; then the rank-b update runs locally
            v_loc = jnp.take(v_glob, grow_ids, axis=0)    # (m_loc, b)
            keepc = (colmask_g > g)[None, :]
            tail = jnp.where(keepc, a_loc, 0)
            w = jax.lax.psum(matmul(None, jnp.conj(v_loc).T, tail), row_axis)
            upd = matmul(None, v_loc, matmul(None, jnp.conj(t).T, w))
            return jnp.where(keepc, a_loc - upd, a_loc), ts

        return jax.lax.fori_loop(0, nblocks, panel_step, (a_loc, ts0))

    from faer_tpu.core.config import platform_scope

    a2 = _cyclic_to_local(a, nblocks, pc, block)
    a2 = _cyclic_rows_to_local(a2, mblocks, pr, block)
    fn = _shard_map(body, mesh, P(row_axis, col_axis),
                    (P(row_axis, col_axis), P()))
    with platform_scope(mesh.devices.flat[0].platform):
        out_local, t_stack = fn(a2)
    packed = _local_rows_to_cyclic(out_local, mblocks, pr, block)
    packed = _local_to_cyclic(packed, nblocks, pc, block)
    return packed, t_stack
