"""Distributed (multi-chip) factorizations: block-cyclic LLT / LU / QR over ICI.

SURVEY §2.7/§5.8: the TPU-native analogue of scaling the problem dimension is
a ScaLAPACK-style 1-D block-cyclic layout over a device mesh with explicit
collectives via ``shard_map``:

* LLT / QR — COLUMN-cyclic: global column block g lives on device ``g % P``
  (cyclic → load stays balanced as the trailing matrix shrinks).  Each panel
  step broadcasts the owner's panel with one ``psum`` (a zero-padded
  all-reduce rides ICI), the small panel factor is computed redundantly on
  every chip (cheaper than a second collective), and the O(n²b) trailing
  update runs locally on each chip's own column blocks.
* LU — ROW-cyclic with true partial pivoting: the per-column pivot search is
  a cross-device ``all_gather`` argmax over local candidates, and the pivot
  row exchange is a pair of ``psum`` row broadcasts; the panel's trailing
  update is one ``psum`` of the owner's U₁₂ rows followed by a local GEMM.
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
)


def _cyclic_to_local(a, nblocks: int, nproc: int, b: int):
    """Host-side helper: (n, n) → per-device local column blocks, cyclic."""
    cols = []
    for p in range(nproc):
        blocks = [a[:, g * b:(g + 1) * b] for g in range(p, nblocks, nproc)]
        cols.append(jnp.concatenate(blocks, axis=1))
    return jnp.concatenate(cols, axis=1)  # device-major layout


def _local_to_cyclic(al, nblocks: int, nproc: int, b: int):
    n = al.shape[0]
    lb_per = nblocks // nproc
    out = jnp.zeros_like(al)
    for g in range(nblocks):
        p = g % nproc
        lb = g // nproc
        src = al[:, (p * lb_per + lb) * b:(p * lb_per + lb + 1) * b]
        out = jax.lax.dynamic_update_slice(out, src, (0, g * b))
    return out


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

    def body(a_loc):
        # a_loc: (n, lb_per*block) — this device's cyclic column blocks
        p = jax.lax.axis_index(axis)

        for g in range(nblocks):
            owner = g % nproc
            lb = g // nproc
            cand = jax.lax.dynamic_slice(a_loc, (0, lb * block), (n, block))
            cand = jnp.where(p == owner, cand, jnp.zeros_like(cand))
            panel = jax.lax.psum(cand, axis)          # broadcast owner's panel
            # redundant small panel factor on every chip
            diag = jax.lax.dynamic_slice(panel, (g * block, 0), (block, block))
            ldiag, _, _ = _llt_panel_recursive(diag, reg, min(64, block))
            linv = invert_lower_triangular(ldiag, base=block)
            below = panel[(g + 1) * block:, :] if g + 1 < nblocks else panel[:0, :]
            lbelow = matmul(None, below, jnp.conj(linv).T)
            lpanel = jnp.zeros_like(panel)
            lpanel = jax.lax.dynamic_update_slice(lpanel, ldiag, (g * block, 0))
            if g + 1 < nblocks:
                lpanel = jax.lax.dynamic_update_slice(
                    lpanel, lbelow, ((g + 1) * block, 0))
            # owner stores the factored panel
            stored = jax.lax.dynamic_update_slice(a_loc, lpanel, (0, lb * block))
            a_loc = jnp.where(p == owner, stored, a_loc)
            # trailing update of ALL this device's later blocks in ONE GEMM:
            # gather the lpanel rows aligned with the local column blocks,
            # multiply once, and mask by global block index > g
            gidx = jnp.arange(lb_per, dtype=jnp.int32) * nproc + p
            row_ids = (gidx[:, None] * block
                       + jnp.arange(block, dtype=jnp.int32)[None, :]).reshape(-1)
            lrows = jnp.take(lpanel, row_ids, axis=0)      # (lb_per·b, b)
            upd = matmul(None, lpanel, jnp.conj(lrows).T)  # (n, lb_per·b)
            colmask = jnp.repeat(gidx, block) > g
            a_loc = jnp.where(colmask[None, :], a_loc - upd, a_loc)
        return a_loc

    from jax.experimental.shard_map import shard_map

    from faer_tpu.core.config import platform_scope

    a_local = _cyclic_to_local(a, nblocks, nproc, block)
    fn = shard_map(body, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis))
    # gate fast-path kernels by the mesh's platform, not the default backend
    with platform_scope(mesh.devices.flat[0].platform):
        out_local = fn(a_local)
    l = _local_to_cyclic(out_local, nblocks, nproc, block)
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

    def body(l_loc, b_loc):
        p = jax.lax.axis_index(axis)
        x = b_loc * 0.0
        rhs = b_loc
        for g in range(nblocks):
            owner = g % nproc
            lb = g // nproc
            lcol = jax.lax.dynamic_slice(l_loc, (0, lb * block), (n, block))
            lcol = jnp.where(p == owner, lcol, jnp.zeros_like(lcol))
            lcol = jax.lax.psum(lcol, axis)            # broadcast L[:, g-block]
            lgg = lcol[g * block:(g + 1) * block, :]
            xg = (solve_unit_lower_triangular(lgg, rhs[g * block:(g + 1) * block])
                  if unit else
                  jax.lax.linalg.triangular_solve(
                      lgg, rhs[g * block:(g + 1) * block], left_side=True,
                      lower=True))
            x = jax.lax.dynamic_update_slice(x, xg, (g * block, 0))
            if g + 1 < nblocks:
                upd = matmul(None, lcol[(g + 1) * block:, :], xg)
                rhs = rhs.at[(g + 1) * block:, :].add(-upd)
        return x

    from jax.experimental.shard_map import shard_map

    from faer_tpu.core.config import platform_scope

    nblocks_ = nblocks
    l_local = _cyclic_to_local(l, nblocks_, nproc, block)
    fn = shard_map(body, mesh=mesh, in_specs=(P(None, axis), P(None, None)),
                   out_specs=P(None, None), check_rep=False)
    with platform_scope(mesh.devices.flat[0].platform):
        return fn(l_local, b_rhs)


def _dist_upper_solve(u, b_rhs, mesh: Mesh, *, axis: str, block: int,
                      unit: bool = False):
    """Distributed block back substitution for a ROW-replicated upper factor
    handed in column-cyclic layout."""
    n = u.shape[0]
    nproc = mesh.shape[axis]
    nblocks = n // block

    def body(u_loc, b_loc):
        p = jax.lax.axis_index(axis)
        x = b_loc * 0.0
        rhs = b_loc
        for g in range(nblocks - 1, -1, -1):
            owner = g % nproc
            lb = g // nproc
            ucol = jax.lax.dynamic_slice(u_loc, (0, lb * block), (n, block))
            ucol = jnp.where(p == owner, ucol, jnp.zeros_like(ucol))
            ucol = jax.lax.psum(ucol, axis)
            ugg = ucol[g * block:(g + 1) * block, :]
            xg = jax.lax.linalg.triangular_solve(
                ugg, rhs[g * block:(g + 1) * block], left_side=True,
                lower=False, unit_diagonal=unit)
            x = jax.lax.dynamic_update_slice(x, xg, (g * block, 0))
            if g > 0:
                upd = matmul(None, ucol[: g * block, :], xg)
                rhs = rhs.at[: g * block, :].add(-upd)
        return x

    from jax.experimental.shard_map import shard_map

    from faer_tpu.core.config import platform_scope

    u_local = _cyclic_to_local(u, nblocks, nproc, block)
    fn = shard_map(body, mesh=mesh, in_specs=(P(None, axis), P(None, None)),
                   out_specs=P(None, None), check_rep=False)
    with platform_scope(mesh.devices.flat[0].platform):
        return fn(u_local, b_rhs)


# ---------------------------------------------------------------------------
# block-cyclic partial-pivot LU (row-cyclic): SURVEY §5.8 — pivot search via
# all_gather argmax across devices, pivot-row exchange via psum broadcasts
# ---------------------------------------------------------------------------


def _cyclic_rows_to_local(a, nblocks: int, nproc: int, b: int):
    rows = []
    for p in range(nproc):
        blocks = [a[g * b:(g + 1) * b, :] for g in range(p, nblocks, nproc)]
        rows.append(jnp.concatenate(blocks, axis=0))
    return jnp.concatenate(rows, axis=0)


def _local_rows_to_cyclic(al, nblocks: int, nproc: int, b: int):
    lb_per = nblocks // nproc
    out = jnp.zeros_like(al)
    for g in range(nblocks):
        p = g % nproc
        lb = g // nproc
        src = al[(p * lb_per + lb) * b:(p * lb_per + lb + 1) * b, :]
        out = jax.lax.dynamic_update_slice(out, src, (g * b, 0))
    return out


def block_cyclic_lu(a, mesh: Mesh, *, axis: str = "p", block: int = 64):
    """Distributed partial-pivot LU over a 1-D ROW-cyclic layout.

    Returns ``(lu_packed, row_perm, ok)`` replicated, with
    ``A[row_perm, :] = L U``.  Per column: cross-device pivot search
    (``all_gather`` of local argmax candidates), pivot-row exchange (two
    ``psum`` row broadcasts), in-panel elimination; per panel: one ``psum``
    broadcast of the owner's U₁₂ rows + a local trailing GEMM.
    """
    n = a.shape[0]
    nproc = mesh.shape[axis]
    assert n % (block * nproc) == 0, (n, block, nproc)
    nblocks = n // block
    lb_per = nblocks // nproc
    cols = jnp.arange(n)

    def body(a_loc):
        p = jax.lax.axis_index(axis)
        lrow_blk = jnp.arange(lb_per, dtype=jnp.int32) * nproc + p
        grow = (lrow_blk[:, None] * block
                + jnp.arange(block, dtype=jnp.int32)[None, :]).reshape(-1)
        perm = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones((), jnp.bool_)
        for g in range(nblocks):
            pe = (g + 1) * block              # panel end column
            for j in range(block):
                k = g * block + j
                col = a_loc[:, k]
                cand = jnp.where(grow >= k, jnp.abs(col), -jnp.ones_like(col))
                lv = jnp.max(cand)
                lgi = grow[jnp.argmax(cand)]
                vals = jax.lax.all_gather(lv, axis)
                gis = jax.lax.all_gather(lgi, axis)
                piv = gis[jnp.argmax(vals)]
                # exchange rows k <-> piv via two psum broadcasts
                rk = jax.lax.psum(jnp.sum(jnp.where(
                    (grow == k)[:, None], a_loc, 0.0), axis=0), axis)
                rp = jax.lax.psum(jnp.sum(jnp.where(
                    (grow == piv)[:, None], a_loc, 0.0), axis=0), axis)
                a_loc = jnp.where((grow == k)[:, None], rp[None, :], a_loc)
                a_loc = jnp.where((grow == piv)[:, None] & (piv != k),
                                  rk[None, :], a_loc)
                pk = perm[k]
                perm = perm.at[k].set(perm[piv]).at[piv].set(pk)
                pivot = rp[k]
                ok = ok & (pivot != 0)
                safe = jnp.where(pivot == 0, jnp.ones_like(pivot), pivot)
                mult = jnp.where(grow > k, a_loc[:, k] / safe, a_loc[:, k])
                a_loc = a_loc.at[:, k].set(mult)
                # eliminate within the remaining PANEL columns only
                cmask = (cols > k) & (cols < pe)
                a_loc = a_loc - jnp.where(
                    (grow > k)[:, None] & cmask[None, :],
                    mult[:, None] * rp[None, :], 0.0)
            if pe < n:
                # owner's panel rows hold [L11 \ U11 | A12]; broadcast, solve
                # U12 redundantly, one local trailing GEMM
                owner = g % nproc
                lb = g // nproc
                rows_g = jnp.where(
                    p == owner,
                    jax.lax.dynamic_slice(a_loc, (lb * block, 0), (block, n)),
                    jnp.zeros((block, n), a_loc.dtype))
                rows_g = jax.lax.psum(rows_g, axis)
                l11 = jnp.tril(rows_g[:, g * block:pe], -1) + jnp.eye(
                    block, dtype=a_loc.dtype)
                u12 = solve_unit_lower_triangular(l11, rows_g[:, pe:])
                l21 = a_loc[:, g * block:pe]
                upd = matmul(None, l21, u12)
                below = (grow >= pe)[:, None]
                a_loc = a_loc.at[:, pe:].set(jnp.where(
                    below, a_loc[:, pe:] - upd, a_loc[:, pe:]))
                stored = jax.lax.dynamic_update_slice(
                    a_loc, u12, (lb * block, pe))
                a_loc = jnp.where(p == owner, stored, a_loc)
        return a_loc, perm, ok

    from jax.experimental.shard_map import shard_map

    from faer_tpu.core.config import platform_scope

    a_local = _cyclic_rows_to_local(a, nblocks, nproc, block)
    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=(P(axis, None), P(), P()), check_rep=False)
    with platform_scope(mesh.devices.flat[0].platform):
        out_local, perm, ok = fn(a_local)
    lu = _local_rows_to_cyclic(out_local, nblocks, nproc, block)
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
# compact-WY factor + local trailing block applies
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

    def body(a_loc):
        p = jax.lax.axis_index(axis)
        gidx = jnp.arange(lb_per, dtype=jnp.int32) * nproc + p
        colmask_g = jnp.repeat(gidx, block)
        ts = []
        for g in range(nblocks):
            owner = g % nproc
            lb = g // nproc
            cand = jax.lax.dynamic_slice(a_loc, (0, lb * block), (m, block))
            cand = jnp.where(p == owner, cand, jnp.zeros_like(cand))
            panel = jax.lax.psum(cand, axis)          # broadcast owner's panel
            sub = panel[g * block:, :]
            packed_sub, taus = _panel_qr_blocked(sub, 32)
            v = _extract_v(packed_sub, block)
            t = form_block_t(v, taus)
            ts.append(t)
            packed_panel = jnp.concatenate([panel[: g * block], packed_sub])
            stored = jax.lax.dynamic_update_slice(a_loc, packed_panel,
                                                  (0, lb * block))
            a_loc = jnp.where(p == owner, stored, a_loc)
            # local trailing block-reflector apply on later column blocks
            tail = a_loc[g * block:, :]
            applied = apply_block_on_left(v, t, tail, adjoint=True)
            keep = colmask_g > g
            a_loc = a_loc.at[g * block:, :].set(
                jnp.where(keep[None, :], applied, tail))
        return a_loc, jnp.stack(ts)

    from jax.experimental.shard_map import shard_map

    from faer_tpu.core.config import platform_scope

    a_local = _cyclic_to_local(a, nblocks, nproc, block)
    fn = shard_map(body, mesh=mesh, in_specs=P(None, axis),
                   out_specs=(P(None, axis), P()), check_rep=False)
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

    def body(p_loc, b_loc):
        p = jax.lax.axis_index(axis)
        qtb = b_loc
        for g in range(nblocks):
            owner = g % nproc
            lb = g // nproc
            cand = jax.lax.dynamic_slice(p_loc, (0, lb * block), (m, block))
            cand = jnp.where(p == owner, cand, jnp.zeros_like(cand))
            panel = jax.lax.psum(cand, axis)
            v = _extract_v(panel[g * block:, :], block)
            t = t_stack[g]
            sub = apply_block_on_left(v, t, qtb[g * block:], adjoint=True)
            qtb = qtb.at[g * block:].set(sub)
        return qtb

    from jax.experimental.shard_map import shard_map

    from faer_tpu.core.config import platform_scope

    p_local = _cyclic_to_local(packed, nblocks, nproc, block)
    fn = shard_map(body, mesh=mesh, in_specs=(P(None, axis), P(None, None)),
                   out_specs=P(None, None), check_rep=False)
    with platform_scope(mesh.devices.flat[0].platform):
        qtb = fn(p_local, b_rhs)
    r = jnp.triu(packed)[:n, :]
    return _dist_upper_solve(r, qtb[:n], mesh, axis=axis, block=block)
