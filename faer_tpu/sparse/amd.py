"""Approximate minimum degree ordering (host-side).

Reference parity: ``faer/src/sparse/linalg/amd.rs`` — ``order`` (``:903``),
``order_maybe_unsorted`` (``:941``), ``Control`` (``:964``), ``FlopCount``
(``:982``).

Implementation: quotient-graph minimum-degree with element absorption and
Amestoy/Davis/Duff-style approximate external degrees (the AMD bound
``d̄ = min(n−k, d_prev + |Le|, |A_i| + Σ|Le \\ i|)``). Host-side numpy/Python —
integer pointer chasing is the wrong shape for the TPU (SURVEY §2.5); a C++
port of this module is the planned acceleration.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from faer_tpu.sparse.csc import SparseCscMat, SymbolicSparseCsc


@dataclasses.dataclass(frozen=True)
class Control:
    """faer ``amd::Control`` (dense-row handling simplified)."""

    dense_threshold: float = 10.0
    aggressive_absorption: bool = True


@dataclasses.dataclass
class FlopCount:
    """faer ``amd::FlopCount``: estimated factorization cost under the order."""

    n_div: float = 0.0
    n_mult_subtract_ldl: float = 0.0
    n_mult_subtract_lu: float = 0.0


def _symmetrize_pattern(sym: SymbolicSparseCsc) -> list[set]:
    """Adjacency sets of A + Aᵀ without the diagonal."""
    n = sym.ncols
    adj = [set() for _ in range(n)]
    for j in range(n):
        for p in range(int(sym.col_ptr[j]), int(sym.col_ptr[j + 1])):
            i = int(sym.row_idx[p])
            if i != j:
                adj[i].add(j)
                adj[j].add(i)
    return adj


def _flop_count_for(sym: SymbolicSparseCsc, perm: np.ndarray) -> FlopCount:
    """Exact factorization cost under ``perm`` from the symbolic L column
    counts (faer reports the same quantities from the elimination)."""
    from faer_tpu.sparse import cholesky as _sch
    from faer_tpu.sparse.csc import SparseCscMat, permute_self_adjoint

    a_perm = permute_self_adjoint(SparseCscMat(sym, np.ones(sym.nnz)), perm)
    parent = _sch.elimination_tree(a_perm.symbolic)
    from faer_tpu import native

    nat = native.l_pattern(sym.ncols, a_perm.symbolic.col_ptr,
                           a_perm.symbolic.row_idx, parent)
    if nat is None:
        pats = _sch._column_patterns(a_perm.symbolic, parent)
        counts = np.array([len(p) for p in pats], dtype=np.int64)
    else:
        counts = np.diff(nat[0])
    d = counts.astype(np.float64) - 1.0  # off-diagonal count per column
    return FlopCount(
        n_div=float(d.sum()),
        n_mult_subtract_ldl=float((d * (d + 1) / 2).sum()),
        n_mult_subtract_lu=float((d * d).sum()),
    )


def order(sym: SymbolicSparseCsc, control: Control | None = None):
    """Fill-reducing permutation for a symmetric pattern.

    Returns ``(perm, FlopCount)`` with ``perm`` such that factorizing
    ``A[perm][:, perm]`` has reduced fill. faer ``amd::order`` (``amd.rs:903``).
    Dispatches to the native C++ kernel when available.
    """
    del control
    n = sym.ncols
    from faer_tpu import native

    nat = native.amd_order(n, sym.col_ptr, sym.row_idx)
    if nat is not None:
        return nat, _flop_count_for(sym, nat)
    adj = _symmetrize_pattern(sym)

    # quotient graph state: variable → adjacent variables + adjacent elements
    var_adj = adj                       # variable-variable edges (pruned lazily)
    var_elems = [set() for _ in range(n)]   # variable → element ids
    elem_bound = {}                     # element id → boundary variable set
    alive = np.ones(n, dtype=bool)
    degree = np.array([len(a) for a in adj], dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    flops = FlopCount()

    import heapq

    heap = [(int(degree[v]), v) for v in range(n)]
    heapq.heapify(heap)

    for k in range(n):
        # pop the minimum-degree alive variable (lazy deletion)
        while True:
            dcur, v = heapq.heappop(heap)
            if alive[v] and dcur == degree[v]:
                break
        alive[v] = False
        perm[k] = v

        # boundary of the new element = (var_adj[v] ∪ union of its elements'
        # boundaries) ∩ alive
        bound = set(u for u in var_adj[v] if alive[u])
        for e in var_elems[v]:
            bound |= set(u for u in elem_bound[e] if alive[u])
        bound.discard(v)

        d = len(bound)
        flops.n_div += d
        flops.n_mult_subtract_ldl += d * (d + 1) / 2.0
        flops.n_mult_subtract_lu += d * d

        # absorb v's elements into the new element
        for e in var_elems[v]:
            del elem_bound[e]
        eid = n + k
        elem_bound[eid] = bound

        # update the boundary variables
        for u in bound:
            var_adj[u].discard(v)
            var_adj[u] -= bound          # edges now covered by the element
            var_elems[u] = {e for e in var_elems[u] if e in elem_bound}
            var_elems[u].add(eid)
            # approximate external degree (AMD bound, exact on first element)
            approx = len(var_adj[u])
            seen = set()
            for e in var_elems[u]:
                new_part = elem_bound[e] - seen
                approx += len(new_part) - (u in new_part)
                seen |= elem_bound[e]
            newd = min(n - k - 1, approx)
            if newd != degree[u]:
                degree[u] = newd
                heapq.heappush(heap, (int(newd), u))

    return perm, flops


def order_maybe_unsorted(sym: SymbolicSparseCsc, control: Control | None = None):
    """faer ``order_maybe_unsorted`` (``amd.rs:941``): tolerant of unsorted
    row indices (sets are order-insensitive here)."""
    return order(sym, control)
