"""Batched decompositions: vmap as a first-class parallel dimension.

SURVEY §2.7/§7 stage 8: for a linalg library the many-small-problems regime is
a primary TPU workload — every factorization composes with ``vmap``, and these
wrappers make it the documented API. Leading batch dimensions map over the
same trace; shard the batch axis over a mesh (``faer_tpu.parallel``) for
multi-chip throughput.
"""
from __future__ import annotations

import jax

from faer_tpu.linalg import cholesky as _ch
from faer_tpu.linalg import evd as _evd
from faer_tpu.linalg import lu as _lu
from faer_tpu.linalg import qr as _qr
from faer_tpu.linalg import svd as _svd


def _vmap1(fn):
    return jax.vmap(fn)


def llt_factor(a_batch, **kw):
    """Batched LLT: a_batch (B, n, n) → (L (B, n, n), info-batch)."""
    return _vmap1(lambda a: _ch.llt_factor(a, **kw))(a_batch)


def llt_solve(l_batch, b_batch):
    return _vmap1(_ch.llt_solve)(l_batch, b_batch)


def llt_solve_batched(a_batch, b_batch):
    """Factor + solve in one vmapped program."""

    def one(a, b):
        l, info = _ch.llt_factor(a)
        return _ch.llt_solve(l, b), info

    return _vmap1(one)(a_batch, b_batch)


def lu_factor(a_batch, **kw):
    return _vmap1(lambda a: _lu.lu_in_place(a, **kw))(a_batch)


def lu_solve(lu_batch, perm_batch, b_batch):
    return _vmap1(_lu.lu_solve)(lu_batch, perm_batch, b_batch)


def qr_factor(a_batch, **kw):
    return _vmap1(lambda a: _qr.qr_in_place(a, **kw)[:2])(a_batch)


def qr_solve_lstsq_batched(a_batch, b_batch):
    def one(a, b):
        packed, ts, block = _qr.qr_in_place(a)
        return _qr.qr_solve_lstsq(packed, ts, block, b)

    return _vmap1(one)(a_batch, b_batch)


def svd(a_batch, **kw):
    """Batched SVD → (U, S, V, info) with leading batch dims."""
    return _vmap1(lambda a: _svd.svd(a, **kw))(a_batch)


def self_adjoint_evd(a_batch):
    return _vmap1(_evd.self_adjoint_evd)(a_batch)


def eigenvalues(a_batch):
    return _vmap1(_evd.eigenvalues)(a_batch)
