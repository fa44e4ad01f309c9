"""Mosaic bulge-chase window-step kernel (two-stage reduction probe).

Round-3 deferred two-stage band reduction on a back-of-envelope serial window
step cost of 2-4 µs (BENCH_NOTES "why two-stage did NOT ship"); the round-3
verdict asked for a *measured* step cost instead.  This kernel is that
measurement: ``chase_probe`` runs ``steps`` serially-dependent bulge-chase
window steps over a VMEM-resident band strip with the real dataflow —

* a dynamic sublane-offset window load (the chase walks down the band),
* a length-``b`` Householder computed from the window's leading column,
* the symmetric two-sided rank-2 application ``W ← W − v w̃ᵀ − w̃ vᵀ``
  (one MXU matvec + VPU outer products),
* the window store, whose rows overlap the next step's load (true serial
  dependency, same as a real chase).

``g`` independent windows per step model multi-bulge batching (chasing ``g``
sweeps' bulges in one pass amortizes band HBM traffic and fills the VPU);
their updates are unrolled so Mosaic can overlap them — per-step latency is
the measurement of interest, reported by ``tools/r5chase.py`` (results in
BENCH_NOTES "Round 5").

Reference: faer's one-stage ``tridiag.rs:274`` is the production path; the
two-stage structure follows Bischof-Lang-Sun SBR (band → tridiagonal chase).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _window_step(w):
    """One chase window step on a (2b, 2b) symmetric window.

    Computes the Householder that zeroes rows 2..b of column 0 (keeping row
    1 — the surviving subdiagonal), applies it two-sided, returns the
    updated window.  Pure f32, guard for zero tails.
    """
    tb = w.shape[0]
    b = tb // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
    col = w[:, 0:1]
    sel = (rows >= 1) & (rows <= b)
    x = jnp.where(sel, col, 0.0)
    sq = jnp.sum(x * x)
    alpha = jnp.sum(jnp.where(rows == 1, x, 0.0))
    tail_sq = sq - alpha * alpha
    norm = jnp.sqrt(sq)
    sign = jnp.where(alpha >= 0, 1.0, -1.0)
    beta = -sign * norm
    is_id = tail_sq <= 0.0
    safe_s = jnp.where(is_id, 1.0, alpha - beta)
    safe_b = jnp.where(is_id, 1.0, beta)
    tau = jnp.where(is_id, 0.0, (beta - alpha) / safe_b)
    v = jnp.where(rows == 1, 1.0, x * (1.0 / safe_s))
    v = jnp.where(sel, v, 0.0)
    # symmetric two-sided: u = τ·W v ;  w̃ = u − (τ/2)(vᵀu)·v
    u = jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32) * tau
    gamma = 0.5 * tau * jnp.sum(v * u)
    wt = u - gamma * v
    return w - v * wt.reshape(1, tb) - wt * v.reshape(1, tb)


def _chase_kernel(band_in, band_ref, *, b, steps, nw, g, r):
    band_ref[:] = band_in[:]
    tb = 2 * b

    def body(i, carry):
        off = jax.lax.rem(i, nw) * b
        for gi in range(g):
            base = gi * r
            w = band_ref[pl.ds(base + off, tb), :]
            band_ref[pl.ds(base + off, tb), :] = _window_step(w)
        return carry

    jax.lax.fori_loop(0, steps, body, jnp.zeros((), jnp.float32))


@functools.partial(jax.jit, static_argnames=("b", "steps", "g"))
def chase_probe(band, *, b: int, steps: int, g: int = 1):
    """Run ``steps`` serially-dependent chase window steps.

    ``band``: (g * r, 2b) f32 strip, r = 4b rows per batch lane; windows walk
    offsets {0, b, 2b} cyclically inside each strip (overlapping rows carry
    the serial dependency).  Returns the updated strip.
    """
    tb = 2 * b
    r = 4 * b
    nw = (r - tb) // b + 1
    assert band.shape == (g * r, tb), (band.shape, (g * r, tb))
    kernel = functools.partial(_chase_kernel, b=b, steps=steps, nw=nw,
                               g=g, r=r)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(band.shape, band.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(band)
