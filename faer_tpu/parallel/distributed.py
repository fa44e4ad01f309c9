"""Distributed (multi-chip) factorizations: block-cyclic Cholesky over ICI.

SURVEY §2.7/§5.8: the TPU-native analogue of scaling the problem dimension is
a ScaLAPACK-style 1-D block-cyclic layout over a device mesh with explicit
collectives via ``shard_map``:

* columns are distributed in blocks of ``b``; global block g lives on device
  ``g % P`` (cyclic → load stays balanced as the trailing matrix shrinks);
* each panel step: the owner's panel is broadcast with one ``psum`` (a zero-
  padded all-reduce rides ICI), the small panel factor is computed redundantly
  on every chip (cheaper than a second collective), and the O(n²b) trailing
  update runs locally on each chip's own column blocks.

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
            # trailing update of this device's blocks with global index > g
            for lb2 in range(lb_per):
                g2 = lb2 * nproc + p                  # traced (depends on p)
                lrows = jax.lax.dynamic_slice_in_dim(lpanel, g2 * block,
                                                     block, axis=0)
                upd = matmul(None, lpanel, jnp.conj(lrows).T)
                cur = jax.lax.dynamic_slice(a_loc, (0, lb2 * block), (n, block))
                newb = jnp.where(g2 > g, cur - upd, cur)
                a_loc = jax.lax.dynamic_update_slice(a_loc, newb, (0, lb2 * block))
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


def block_cyclic_llt_solve(l, b_rhs):
    """Solve from the replicated distributed factor (single-chip TRSMs)."""
    from faer_tpu.linalg.cholesky import llt_solve

    return llt_solve(l, b_rhs)
