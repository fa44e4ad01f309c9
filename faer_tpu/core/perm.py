"""Permutations as index arrays.

Reference parity: ``faer/src/perm/mod.rs`` — ``Perm`` (``:160``),
``permute_rows/cols`` (``:230,256``), ``swap_rows_idx/swap_cols_idx``
(``:98,135``). On TPU a permutation is an int32 index vector applied with
``jnp.take`` (a gather — one HBM pass); inverse via scatter.
"""
from __future__ import annotations

import jax.numpy as jnp


def identity_perm(n: int):
    return jnp.arange(n, dtype=jnp.int32)


def invert_perm(perm):
    n = perm.shape[0]
    return jnp.zeros((n,), dtype=jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))


def permute_rows(a, perm):
    """rows of result i = rows of a at perm[i] (faer ``permute_rows``)."""
    return jnp.take(a, perm, axis=0)


def permute_cols(a, perm):
    return jnp.take(a, perm, axis=1)


def permute_rows_inverse(a, perm):
    return permute_rows(a, invert_perm(perm))


def permute_cols_inverse(a, perm):
    return permute_cols(a, invert_perm(perm))


def swap_rows(a, i, j):
    """Swap rows i, j (traced indices OK) — faer ``swap_rows_idx``."""
    ri = a[i]
    rj = a[j]
    return a.at[i].set(rj).at[j].set(ri)


def swap_cols(a, i, j):
    ci = a[:, i]
    cj = a[:, j]
    return a.at[:, i].set(cj).at[:, j].set(ci)


def perm_to_matrix(perm, dtype=jnp.float32):
    """Dense matrix P with P @ a == permute_rows(a, perm)."""
    n = perm.shape[0]
    return jnp.zeros((n, n), dtype=dtype).at[jnp.arange(n), perm].set(1)


def swaps_to_perm(swaps):
    """Fold a sequence of (i ↔ swaps[i]) transpositions, applied in order
    i = 0..len-1, into a single permutation vector (LAPACK ipiv semantics)."""
    import jax

    n = swaps.shape[0]

    def body(i, perm):
        j = swaps[i]
        pi = perm[i]
        pj = perm[j]
        return perm.at[i].set(pj).at[j].set(pi)

    return jax.lax.fori_loop(0, n, body, jnp.arange(n, dtype=jnp.int32))


def perm_transposition_count(perm):
    """Minimal transposition count of the permutation ACTUALLY applied:
    ``n − #cycles(perm)``.

    faer performs in-memory row swaps and reports the swap count
    (``lu/partial_pivoting/factor.rs:224``); the TPU kernels instead apply a
    virtual-pivot permutation in ONE gather (pivot rows first in pivot order,
    remainder compacted in original order), so the real count here is the
    minimal number of transpositions composing that permutation.  Its parity
    equals the permutation's sign — the only downstream observable (det sign)
    — and per-panel counts stay additive because sign is multiplicative under
    composition.  Computed with pointer-doubling cycle-min labels: O(n log n)
    fully-vectorized work, no sequential simulation.
    """
    n = perm.shape[0]
    nxt = perm.astype(jnp.int32)
    mn = jnp.arange(n, dtype=jnp.int32)
    for _ in range(max(1, int(n - 1).bit_length())):
        mn = jnp.minimum(mn, jnp.take(mn, nxt))
        nxt = jnp.take(nxt, nxt)
    # one position per cycle holds its cycle's minimum label
    ncyc = jnp.sum((mn == jnp.arange(n, dtype=jnp.int32)).astype(jnp.int32))
    return (n - ncyc).astype(jnp.int32)
