"""Level-scheduled ragged front batches: the device supernodal numeric.

Reference parity: ``faer/src/sparse/linalg/cholesky.rs`` supernodal numeric
loop (``factorize_supernodal_numeric_llt``, ``:3945``; LDLT ``:3287``) — one
dense partial factorization per supernode, updates flowing parent-ward.

TPU-native design (SURVEY §2.5 "bucket supernodes by padded size class"):
faer's per-supernode loop is a host-serial sweep calling dense kernels; a
per-front device dispatch costs ~ms through the runtime, so thousands of
fronts lose ~100× to the host path (BENCH_NOTES round 3).  Here the numeric
phase is restructured as a **multifrontal level schedule**:

* the supernode elimination tree is levelled by height, so every front in a
  level depends only on strictly earlier levels;
* fronts within a level are bucketed by padded size class ``(Wc, Uc)``
  (pivot-block width, update size) and factored as ONE batched dispatch per
  (level, class): assembly scatter + extend-add gather + batched
  chol/TRSM/SYRK + L/update scatters, all inside one jitted call;
* child Schur updates live in a flat device **arena** between levels — no
  host round-trips anywhere in the numeric phase (one final ``lvals`` read).

All scatter/gather index plans are integer-only and computed once per
symbolic pattern (:func:`plan_frontal`); re-factorizing new values with the
same pattern reuses the plan and the jit cache.  Index arrays, batch counts
and class sizes are padded to power-of-two buckets so the number of distinct
compiled shapes stays small across levels.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from faer_tpu.sparse.csc import (
    SparseCscMat,
    SymbolicSparseCsc,
    permute_self_adjoint,
)
from faer_tpu.sparse.supernodal import SupernodalSymbolic


def _cls(x: int) -> int:
    """Pad class: next power of two, minimum 8 (0 stays 0)."""
    if x == 0:
        return 0
    c = 8
    while c < x:
        c *= 2
    return c


def _pow2_at_least(x: int) -> int:
    c = 1
    while c < x:
        c *= 2
    return c


def _bucket_len(x: int) -> int:
    """Index-array length bucket (power of two, min 16; 0 stays 0)."""
    if x == 0:
        return 0
    c = 16
    while c < x:
        c *= 2
    return c


@dataclasses.dataclass
class _Group:
    """One (level, size-class) batch of fronts."""

    level: int
    wc: int                    # padded pivot width
    uc: int                    # padded update size
    nb: int                    # padded batch count
    n_real: int                # real fronts in the batch
    a_src: np.ndarray          # gather into permuted A values
    a_dst: np.ndarray          # scatter into the (nb, rc, rc) front block
    pad_dst: np.ndarray        # unit-diagonal positions (pivot padding)
    ea_src: np.ndarray         # gather from the update arena
    ea_dst: np.ndarray         # scatter into the front block
    l_src: np.ndarray          # gather from the factored (nb, rc, wc) L block
    l_dst: np.ndarray          # scatter into lvals
    u_src: np.ndarray          # gather from the (nb, uc, uc) update block
    u_dst: np.ndarray          # scatter into the arena


@dataclasses.dataclass
class FrontalPlan:
    """Integer-only device-batch schedule for one symbolic pattern."""

    ssym: SupernodalSymbolic
    groups: list               # [_Group], level order
    arena_size: int
    n_levels: int


def plan_frontal(ssym: SupernodalSymbolic,
                 a_sym: SymbolicSparseCsc) -> FrontalPlan:
    """Build the level/class schedule + all scatter/gather index plans.

    ``a_sym``: the (lower-triangular CSC) pattern of the matrix being
    factored — the same pattern the symbolic analysis ran on.  Fails loudly
    if a child update pattern escapes its parent front (cannot happen for
    parent-chained amalgamation, but the batched scatters would silently
    corrupt otherwise).
    """
    symb = ssym.base
    ls = symb.l_symbolic
    nsn = len(ssym.sn_rows)
    sn_start = ssym.sn_start

    # permuted-A pattern: positions into ap.values are plan-time constants
    dummy = SparseCscMat(a_sym, np.zeros(a_sym.nnz, dtype=np.float64))
    asym = permute_self_adjoint(dummy, symb.perm).symbolic

    widths = np.diff(sn_start).astype(np.int64)
    patterns = [np.asarray(r, dtype=np.int64) for r in ssym.sn_rows]
    ucs = np.array([p.size - w for p, w in zip(patterns, widths)],
                   dtype=np.int64)
    parent = np.full(nsn, -1, dtype=np.int64)
    for s in range(nsn):
        if ucs[s] > 0:
            parent[s] = ssym.col_of_sn[patterns[s][widths[s]]]
    children: list[list[int]] = [[] for _ in range(nsn)]
    for s in range(nsn):
        if parent[s] >= 0:
            children[int(parent[s])].append(s)

    # level by height (leaves = 0): every descendant strictly earlier
    level = np.zeros(nsn, dtype=np.int64)
    for s in range(nsn):           # children precede parents (s < parent[s])
        if parent[s] >= 0:
            p = int(parent[s])
            level[p] = max(level[p], level[s] + 1)

    # arena offsets: one (uc, uc) square per front with an update
    arena_off = np.zeros(nsn, dtype=np.int64)
    tot = 0
    for s in range(nsn):
        arena_off[s] = tot
        tot += int(ucs[s]) ** 2
    arena_size = max(tot, 1)

    by_lc: dict[tuple, list[int]] = {}
    for s in range(nsn):
        key = (int(level[s]), _cls(int(widths[s])), _cls(int(ucs[s])))
        by_lc.setdefault(key, []).append(s)

    groups: list[_Group] = []
    for (lev, wc, uc), members in sorted(by_lc.items()):
        rc = wc + uc
        nb = _pow2_at_least(len(members))
        a_src_l, a_dst_l = [], []
        pad_l = []
        ea_src_l, ea_dst_l = [], []
        l_src_l, l_dst_l = [], []
        u_src_l, u_dst_l = [], []
        for b, s in enumerate(members):
            j0, j1 = int(sn_start[s]), int(sn_start[s + 1])
            w = j1 - j0
            pat = patterns[s]
            if not np.array_equal(pat[:w], np.arange(j0, j1)):
                raise ValueError(
                    f"supernode {s}: pattern does not start with pivot rows")
            # local row index -> padded front coordinate
            loc = np.concatenate([
                np.arange(w, dtype=np.int64),
                wc + np.arange(pat.size - w, dtype=np.int64)])
            base = b * rc * rc

            # --- A assembly (lower triangle of the permuted pivot cols) ---
            for j in range(j0, j1):
                r = asym.col_range(j)
                ri = asym.row_idx[r]
                keep = ri >= j
                pos = np.searchsorted(pat, ri[keep])
                a_src_l.append(
                    np.arange(r.start, r.stop, dtype=np.int64)[keep])
                a_dst_l.append(base + loc[pos] * rc + (j - j0))

            # --- pivot padding: unit diagonal on cols w..wc ---
            if wc > w:
                kk = np.arange(w, wc, dtype=np.int64)
                pad_l.append(base + kk * rc + kk)

            # --- extend-add from children ---
            for ch in children[s]:
                uch = int(ucs[ch])
                if uch == 0:
                    continue
                crows = patterns[ch][int(widths[ch]):]
                pp = np.searchsorted(pat, crows)
                if pp.max(initial=-1) >= pat.size or not np.array_equal(
                        pat[pp], crows):
                    raise ValueError(
                        f"child {ch} update rows escape parent {s} front")
                lp = loc[pp]
                ii, jj = np.tril_indices(uch)
                ea_src_l.append(arena_off[ch] + ii * uch + jj)
                ea_dst_l.append(base + lp[ii] * rc + lp[jj])

            # --- L scatter: stacked [L11; L21] is (rc, wc) per front ---
            lbase = b * rc * wc
            for j in range(j0, j1):
                r = ls.col_range(j)
                pos = np.searchsorted(pat, ls.row_idx[r])
                l_src_l.append(lbase + loc[pos] * wc + (j - j0))
                l_dst_l.append(np.arange(r.start, r.stop, dtype=np.int64))

            # --- update store into the arena ---
            ucr = int(ucs[s])
            if ucr > 0:
                ubase = b * uc * uc
                ii = np.repeat(np.arange(ucr, dtype=np.int64), ucr)
                jj = np.tile(np.arange(ucr, dtype=np.int64), ucr)
                u_src_l.append(ubase + ii * uc + jj)
                u_dst_l.append(arena_off[s] + ii * ucr + jj)

        # dummy fronts (batch padding): full unit diagonal on the pivot block
        for b in range(len(members), nb):
            base = b * rc * rc
            kk = np.arange(wc, dtype=np.int64)
            pad_l.append(base + kk * rc + kk)

        def cat(parts):
            return (np.concatenate(parts) if parts
                    else np.zeros(0, np.int64))

        groups.append(_Group(
            level=lev, wc=wc, uc=uc, nb=nb, n_real=len(members),
            a_src=cat(a_src_l), a_dst=cat(a_dst_l), pad_dst=cat(pad_l),
            ea_src=cat(ea_src_l), ea_dst=cat(ea_dst_l),
            l_src=cat(l_src_l), l_dst=cat(l_dst_l),
            u_src=cat(u_src_l), u_dst=cat(u_dst_l)))

    return FrontalPlan(ssym=ssym, groups=groups, arena_size=arena_size,
                       n_levels=int(level.max(initial=0)) + 1)


# ---------------------------------------------------------------------------
# batched dense front math (direct batched formulations, vmap-free)
# ---------------------------------------------------------------------------

def _bmm(a, b):
    return jnp.einsum("bij,bjk->bik", a, b,
                      precision=jax.lax.Precision.HIGHEST)


def _tri_solve_right(l11, f21, *, unit: bool = False):
    """X with X L11ᵀ = F21 (batched): X = (L11⁻¹ F21ᵀ)ᵀ."""
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(l11, jnp.swapaxes(f21, 1, 2), lower=True,
                         unit_diagonal=unit)
    return jnp.swapaxes(y, 1, 2)


def _batched_chol(f, *, ldlt: bool = False):
    """(B, k, k) full-symmetric batched factor.

    LLT: returns ``(tril L, ok)``.  LDLT: returns ``(packed, ok)`` with D on
    the diagonal and unit-L strictly below (faer's packed LDLT layout).
    Zero/negative pivots flip ``ok`` and substitute 1 to keep values finite.
    """
    k = f.shape[-1]
    if k <= 32:
        rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

        def body(j, state):
            a, ok = state
            pj = a[:, j, j]
            bad = (pj <= 0) if not ldlt else (pj == 0)
            ok = ok & ~jnp.any(bad)
            safe = jnp.where(bad, jnp.ones_like(pj), pj)
            piv = safe if ldlt else jnp.sqrt(safe)
            col = jnp.where(rows[None, :] > j, a[:, :, j] / piv[:, None],
                            a[:, :, j])
            col = col.at[:, j].set(safe if ldlt else piv)
            a = a.at[:, :, j].set(col)
            mask = (rows[:, None] > j) & (rows[None, :] > j)
            low = jnp.where(rows[None, :] > j, col, 0.0)
            scal = safe if ldlt else jnp.ones_like(safe)
            upd = jnp.where(mask[None],
                            (low * scal[:, None])[:, :, None]
                            * low[:, None, :], 0.0)
            return a - upd, ok

        a, ok = jax.lax.fori_loop(0, k, body, (f, jnp.ones((), jnp.bool_)))
        return jnp.tril(a), ok
    h = k // 2
    l11, ok1 = _batched_chol(f[:, :h, :h], ldlt=ldlt)
    l21, _ = _partial_solve(l11, f[:, h:, :h], ldlt=ldlt)
    s = f[:, h:, h:] - _syrk(l11, l21, ldlt=ldlt)
    l22, ok2 = _batched_chol(s, ldlt=ldlt)
    z = jnp.zeros((f.shape[0], h, k - h), f.dtype)
    top = jnp.concatenate([l11, z], axis=2)
    bot = jnp.concatenate([l21, l22], axis=2)
    return jnp.concatenate([top, bot], axis=1), ok1 & ok2


def _partial_solve(l11, f21, *, ldlt: bool):
    """L21 from the packed pivot factor: L21 (D) L11ᴴ = F21."""
    if ldlt:
        lu = jnp.tril(l11, -1) + jnp.eye(l11.shape[-1], dtype=l11.dtype)[None]
        d = jnp.einsum("bii->bi", l11)
        safe_d = jnp.where(d == 0, jnp.ones_like(d), d)
        x = _tri_solve_right(lu, f21, unit=True)
        return x / safe_d[:, None, :], safe_d
    return _tri_solve_right(l11, f21), None


def _syrk(l11, l21, *, ldlt: bool):
    """The trailing self-adjoint update L21 (D) L21ᵀ."""
    if ldlt:
        d = jnp.einsum("bii->bi", l11)
        safe_d = jnp.where(d == 0, jnp.ones_like(d), d)
        return _bmm(l21 * safe_d[:, None, :], jnp.swapaxes(l21, 1, 2))
    return _bmm(l21, jnp.swapaxes(l21, 1, 2))


@functools.partial(jax.jit, static_argnames=("nb", "wc", "uc", "ldlt"),
                   donate_argnums=(1, 2))
def _group_step(avals, arena, lvals, okflag,
                a_src, a_dst, pad_dst, ea_src, ea_dst,
                l_src, l_dst, u_src, u_dst, *,
                nb: int, wc: int, uc: int, ldlt: bool):
    """One (level, class) batch: assemble → factor → scatter. All on device.

    Index arrays are padded to length buckets; padded entries carry an
    out-of-range destination and are dropped by the scatter mode (gathers pad
    with index 0 — their values land on dropped destinations).
    """
    rc = wc + uc
    dt = avals.dtype
    f = jnp.zeros((nb * rc * rc,), dt)
    f = f.at[a_dst].add(avals[a_src], mode="drop")
    f = f.at[pad_dst].add(jnp.ones((), dt), mode="drop")
    if ea_src.shape[0]:
        f = f.at[ea_dst].add(arena[ea_src], mode="drop")
    fm = f.reshape(nb, rc, rc)
    fm = jnp.tril(fm) + jnp.swapaxes(jnp.tril(fm, -1), 1, 2)

    l11, ok = _batched_chol(fm[:, :wc, :wc], ldlt=ldlt)
    if uc:
        l21, safe_d = _partial_solve(l11, fm[:, wc:, :wc], ldlt=ldlt)
        upd = fm[:, wc:, wc:] - _syrk(l11, l21, ldlt=ldlt)
        lcols = jnp.concatenate([jnp.tril(l11), l21], axis=1)
        arena = arena.at[u_dst].set(upd.reshape(-1)[u_src], mode="drop")
    else:
        lcols = jnp.tril(l11)
    lvals = lvals.at[l_dst].set(lcols.reshape(-1)[l_src], mode="drop")
    return arena, lvals, okflag & ok


def _pad_idx(a: np.ndarray, oob: int) -> np.ndarray:
    """Pad an index array to its length bucket with out-of-range entries."""
    m = _bucket_len(a.size)
    if m == a.size:
        return a
    out = np.full(m, oob, dtype=np.int64)
    out[: a.size] = a
    return out


def _pad_src(a: np.ndarray) -> np.ndarray:
    m = _bucket_len(a.size)
    if m == a.size:
        return a
    out = np.zeros(m, dtype=np.int64)
    out[: a.size] = a
    return out


def factorize_frontal_numeric(plan: FrontalPlan, a: SparseCscMat, *,
                              ldlt: bool = False) -> SparseCscMat:
    """Device-batched supernodal numeric LLT (or packed LDLT) factorization.

    One batched dispatch per (level, size-class); a single device→host read
    at the end.  Raises ``ValueError`` on a non-positive (LLT) / zero (LDLT)
    pivot, like the per-front path.
    """
    symb = plan.ssym.base
    ap = permute_self_adjoint(a, symb.perm)
    if np.iscomplexobj(ap.values):
        raise NotImplementedError(
            "batched frontal numeric is real-only; complex goes through the "
            "pair-backed dense route")
    dt = ap.values.dtype
    avals = jnp.asarray(ap.values)
    arena = jnp.zeros((plan.arena_size,), dt)
    lvals = jnp.zeros((symb.l_symbolic.nnz,), dt)
    ok = jnp.ones((), jnp.bool_)

    nnz_l = int(symb.l_symbolic.nnz)
    for g in plan.groups:
        rc = g.wc + g.uc
        fsz = g.nb * rc * rc
        arena, lvals, ok = _group_step(
            avals, arena, lvals, ok,
            jnp.asarray(_pad_src(g.a_src)),
            jnp.asarray(_pad_idx(g.a_dst, fsz)),
            jnp.asarray(_pad_idx(g.pad_dst, fsz)),
            jnp.asarray(_pad_src(g.ea_src)),
            jnp.asarray(_pad_idx(g.ea_dst, fsz)),
            jnp.asarray(_pad_src(g.l_src)),
            jnp.asarray(_pad_idx(g.l_dst, nnz_l)),
            jnp.asarray(_pad_src(g.u_src)),
            jnp.asarray(_pad_idx(g.u_dst, plan.arena_size)),
            nb=g.nb, wc=g.wc, uc=g.uc, ldlt=ldlt)

    lv = np.asarray(lvals)
    if not bool(ok):
        kind = "zero" if ldlt else "non-positive"
        raise ValueError(f"{kind} pivot in batched supernodal factorization")
    return SparseCscMat(symb.l_symbolic, lv)


def factorize_frontal_llt(plan: FrontalPlan, a: SparseCscMat) -> SparseCscMat:
    return factorize_frontal_numeric(plan, a, ldlt=False)


def factorize_frontal_ldlt(plan: FrontalPlan, a: SparseCscMat) -> SparseCscMat:
    """Supernodal LDLT (packed: D on diagonal, unit-L strict lower) on the
    batched device path — the faer ``factorize_supernodal_numeric_ldlt``
    counterpart (``cholesky.rs:3287``) for indefinite-but-factorizable
    matrices (no intranode pivoting; 2×2 pivots route through the host
    intranode-LBLT path).
    """
    return factorize_frontal_numeric(plan, a, ldlt=True)
