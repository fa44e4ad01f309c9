"""Round-4 perf microbenchmarks (run on the real TPU chip).

Measures the pieces the round-4 kernel work targets:
  * LLT leaf v1 vs v3 at 128/256/512 (the v3 kernel was never wired);
  * LU/QR v3 leaves at bench shapes (per-step serial floor);
  * argmax vs max vs packed-max inside a Mosaic serial chain (the LU
    pivot-search cost);
  * full-square trailing GEMM vs row-strip lower-triangle SYRK;
  * pallas_matmul vs XLA dot at 4096^3.

Usage: python tools/profile_r4.py [section ...]
Sections: leaves, argmax, syrk, mm  (default: all)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

CHAIN = 8
REPS = 5
RTT = None


def rtt():
    x = jnp.zeros(())
    f = jax.jit(lambda v: v + 1)
    float(f(x))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(step, x0, chain=None):
    """Auto-calibrated: pick chain so device time >= ~120 ms (tunnel RTT noise
    is several ms per read; 120 ms of work bounds the error to ~2-4%)."""
    global RTT
    if RTT is None:
        RTT = rtt()
        print(f"rtt {RTT*1e3:8.3f} ms", flush=True)

    def make(c):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, c, lambda i, v: step(v), x)
        return run

    if chain is None:
        probe = make(4)
        float(jnp.max(jnp.abs(probe(x0))))
        est = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.max(jnp.abs(probe(x0))))
            est = min(est, max((time.perf_counter() - t0 - RTT) / 4, 1e-6))
        chain = max(4, min(4096, int(0.12 / est)))
    run = make(chain)
    float(jnp.max(jnp.abs(run(x0))))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(run(x0))))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - RTT) / chain


def dep(base, out):
    return base + jnp.max(jnp.abs(out)) * 1e-30


# ---------------------------------------------------------------------------
# argmax / pivot-search microkernels: K dependent steps on a (rows, m) buffer
# ---------------------------------------------------------------------------

def _chain_kernel(a_ref, o_ref, *, m, k, mode):
    o_ref[:] = a_ref[:]
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(j, acc):
        row = o_ref[0:1, :]
        if mode == "argmax":
            p = jax.lax.argmax(jnp.abs(row)[0], 0, jnp.int32)
            onehot = (lanes1 == p).astype(jnp.float32)
        elif mode == "max":
            mx = jnp.max(jnp.abs(row))
            onehot = (jnp.abs(row) == mx).astype(jnp.float32)
        elif mode == "packmax":
            # pack |mag| (f32, positive) with the reversed lane id in the low
            # mantissa bits: max of packed == max of mag with lowest-index tie
            mag = jnp.abs(row)
            bits = pltpu.bitcast(mag, jnp.int32)
            packed = (bits & jnp.int32(~0xFFF)) | (
                (jnp.int32(m) - 1 - lanes1) & jnp.int32(0xFFF))
            mxp = jnp.max(packed)
            onehot = (packed == mxp).astype(jnp.float32)
        else:  # none: just a dependent row op
            onehot = row * 1e-30
        newrow = row - onehot * jnp.sum(onehot * row)
        o_ref[0:1, :] = newrow
        return acc + jnp.sum(onehot)

    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(k), body,
                            jnp.zeros((), jnp.float32))
    o_ref[1:2, 0:1] = jnp.reshape(acc, (1, 1))


@functools.partial(jax.jit, static_argnames=("m", "k", "mode"))
def chain_bench(x, m: int, k: int, mode: str):
    kern = functools.partial(_chain_kernel, m=m, k=k, mode=mode)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, m), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def section_argmax():
    print("== pivot-search serial chain (256 steps) ==", flush=True)
    for m in (1024, 4096):
        x = jax.random.normal(jax.random.key(0), (8, m), jnp.float32)
        for mode in ("none", "max", "packmax", "argmax"):
            t = timeit(lambda v: dep(x, chain_bench(v, m, 256, mode)), x)
            print(f"  m={m:5d} mode={mode:8s} {t*1e6:9.1f} us "
                  f"({t/256*1e9:7.1f} ns/step)", flush=True)


# ---------------------------------------------------------------------------
# folded-layout serial chain: the m-lane column stored as (8, m/8)
# ---------------------------------------------------------------------------

def _folded_chain_kernel(a_ref, o_ref, *, mf, k, mode):
    """Per-step ops on an (8, mf) folded column instead of (1, 8*mf)."""
    o_ref[:] = a_ref[:]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, mf), 0)
    lan = jax.lax.broadcasted_iota(jnp.int32, (8, mf), 1)
    gid = sub * mf + lan                       # global lane id, unique

    def body(j, acc):
        col = o_ref[0:8, :]
        if mode == "max":
            mx = jnp.max(jnp.abs(col))
            onehot = (jnp.abs(col) == mx).astype(jnp.float32)
        elif mode == "packmax":
            mag = jnp.abs(col)
            bits = pltpu.bitcast(mag, jnp.int32)
            packed = (bits & jnp.int32(~0x1FFF)) | (
                (jnp.int32(8 * mf) - 1 - gid) & jnp.int32(0x1FFF))
            mxp = jnp.max(packed)
            onehot = (packed == mxp).astype(jnp.float32)
        else:  # none
            onehot = col * 1e-30
        newcol = col - onehot * jnp.sum(onehot * col)
        o_ref[0:8, :] = newcol
        return acc + jnp.sum(onehot)

    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(k), body,
                            jnp.zeros((), jnp.float32))
    o_ref[8:9, 0:1] = jnp.reshape(acc, (1, 1))


@functools.partial(jax.jit, static_argnames=("mf", "k", "mode"))
def folded_chain_bench(x, mf: int, k: int, mode: str):
    kern = functools.partial(_folded_chain_kernel, mf=mf, k=k, mode=mode)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, mf), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def section_folded():
    print("== folded (8, m/8) pivot-search chain (256 steps) ==", flush=True)
    for m in (1024, 4096):
        mf = m // 8
        x = jax.random.normal(jax.random.key(0), (16, mf), jnp.float32)
        for mode in ("none", "max", "packmax"):
            t = timeit(lambda v: dep(x, folded_chain_bench(v, mf, 256, mode)), x)
            print(f"  m={m:5d} mode={mode:8s} {t*1e6:9.1f} us "
                  f"({t/256*1e9:7.1f} ns/step)", flush=True)


# ---------------------------------------------------------------------------
# leaves
# ---------------------------------------------------------------------------

def section_leaves():
    from faer_tpu.ops.pallas.panel_kernels import (
        llt_block_pallas, llt_block_v3_pallas, trtri_pallas)
    from faer_tpu.ops.pallas.lu_panel_v3 import lu_panel_v3_pallas
    from faer_tpu.ops.pallas.qr_panel_v3 import qr_panel_v3_pallas

    key = jax.random.key(1)
    print("== LLT leaves ==", flush=True)
    for b in (128, 256, 512):
        g = jax.random.normal(key, (b, b), jnp.float32)
        blk = g @ g.T / b + 2 * jnp.eye(b, dtype=jnp.float32)
        t1 = timeit(lambda x: dep(blk, llt_block_pallas(x)[0]), blk)
        t3 = timeit(lambda x: dep(blk, llt_block_v3_pallas(x)[0]), blk)
        tt = timeit(lambda x: dep(blk, trtri_pallas(jnp.tril(x) + 3 * jnp.eye(b, dtype=jnp.float32))), blk)
        print(f"  b={b:4d}  v1 {t1*1e6:8.1f} us   v3 {t3*1e6:8.1f} us   "
              f"trtri {tt*1e6:8.1f} us", flush=True)

    print("== LU v3 leaves ==", flush=True)
    for (m, b) in ((4096, 128), (4096, 256), (2048, 256), (1024, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        t = timeit(lambda x: dep(p, lu_panel_v3_pallas(x)[0]), p)
        print(f"  ({m:5d},{b:4d})  {t*1e6:8.1f} us  ({t/b*1e9:7.1f} ns/step)",
              flush=True)

    print("== QR v3 leaves ==", flush=True)
    for (m, b) in ((4096, 128), (4096, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        t = timeit(lambda x: dep(p, qr_panel_v3_pallas(x)[0]), p)
        print(f"  ({m:5d},{b:4d})  {t*1e6:8.1f} us  ({t/b*1e9:7.1f} ns/step)",
              flush=True)


# ---------------------------------------------------------------------------
# syrk strategies
# ---------------------------------------------------------------------------

def _strip_syrk(c, l, strip: int):
    """c - l @ l.T computed on the lower triangle via row strips (the strict
    upper part of the result is garbage)."""
    r = c.shape[0]
    outs = []
    for s0 in range(0, r, strip):
        w = min(strip, r - s0)
        cols = s0 + w
        part = c[s0:s0 + w, :cols] - l[s0:s0 + w] @ l[:cols].T
        if cols < r:
            part = jnp.concatenate([part, c[s0:s0 + w, cols:]], axis=1)
        outs.append(part)
    return jnp.concatenate(outs, axis=0)


def section_syrk():
    key = jax.random.key(2)
    r, bw = 3840, 256
    c = jax.random.normal(key, (r, r), jnp.float32)
    l = jax.random.normal(key, (r, bw), jnp.float32)

    @jax.jit
    def full(l_):
        return c - l_ @ l_.T

    print("== trailing syrk (r=3840, bw=256) ==", flush=True)
    t = timeit(lambda x: dep(l, full(x)), l)
    print(f"  full GEMM      {t*1e6:8.1f} us  ({2*r*r*bw/t/1e12:5.1f} TF/s)",
          flush=True)
    for strip in (512, 1024):
        f = jax.jit(functools.partial(_strip_syrk, c, strip=strip))
        t = timeit(lambda x: dep(l, f(x)), l)
        print(f"  strips {strip:5d}  {t*1e6:8.1f} us", flush=True)


def section_mm():
    from faer_tpu.ops.matmul import matmul
    key = jax.random.key(3)
    n = 4096
    a = jax.random.normal(key, (n, n), jnp.float32)
    print("== 4096^3 GEMM ==", flush=True)
    t = timeit(lambda x: matmul(None, x, x) * (1.0 / n), a)
    print(f"  ops.matmul      {t*1e3:7.3f} ms  ({2*n**3/t/1e12:5.1f} TF/s)", flush=True)
    t = timeit(lambda x: jax.lax.dot(x, x, precision=jax.lax.Precision.HIGH) * (1.0 / n), a)
    print(f"  lax.dot HIGH    {t*1e3:7.3f} ms  ({2*n**3/t/1e12:5.1f} TF/s)", flush=True)
    # thin-k GEMM (the syrk shape)
    l = jax.random.normal(key, (n, 256), jnp.float32)
    t = timeit(lambda x: dep(l, matmul(None, x, x.T)), l)
    print(f"  (4096,256)x(256,4096) {t*1e6:8.1f} us ({2*n*n*256/t/1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    secs = sys.argv[1:] or ["leaves", "argmax", "syrk", "mm"]
    for s in secs:
        globals()[f"section_{s}"]()
