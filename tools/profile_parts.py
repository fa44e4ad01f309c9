"""Component-level timing at n=4096 f32 on the real TPU.

Methodology matches bench.py: jit, warm, force a host scalar read per rep,
take best-of-reps (the tunnel adds variable latency; peak-vs-peak compares).
Usage: python tools/profile_parts.py [part ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = 4096
REPS = 7


def timeit(make_out, reps=REPS):
    f = jax.jit(make_out)
    float(jnp.sum(f()).real if hasattr(f(), "dtype") else f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(f())))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def rtt():
    x = jnp.zeros(())
    f = jax.jit(lambda: x + 1)
    float(f())
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    parts = set(sys.argv[1:]) or None
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (N, N), jnp.float32)
    spd = None

    base_rtt = rtt()
    print(f"rtt {base_rtt*1e3:8.3f} ms")

    def report(name, t, flops=None):
        t = max(t - base_rtt, 1e-9)
        gf = f"  {flops/t/1e9:8.0f} GF/s" if flops else ""
        print(f"{name:34s} {t*1e3:9.3f} ms{gf}", flush=True)

    def want(name):
        return parts is None or any(p in name for p in parts)

    from faer_tpu.ops.matmul import matmul

    if want("matmul"):
        report("matmul 4096^3", timeit(lambda: matmul(None, a, a)), 2 * N**3)

    if want("llt") or want("chol"):
        from faer_tpu.linalg.cholesky import llt_factor

        g = a / N
        spd = matmul(None, g, g.T) + jnp.eye(N, dtype=jnp.float32) * 2
        report("llt_factor 4096", timeit(lambda: llt_factor(spd)[0]), N**3 / 3)

    if want("lu"):
        from faer_tpu.linalg.lu import lu_in_place

        report("lu_in_place 4096", timeit(lambda: lu_in_place(a)[0]), 2 * N**3 / 3)

    if want("qr"):
        from faer_tpu.linalg.qr import qr_in_place

        report("qr_in_place 4096", timeit(lambda: qr_in_place(a)[0]), 4 * N**3 / 3)

    # --- panel kernels ------------------------------------------------------
    from faer_tpu.ops.pallas.panel_kernels import (
        llt_block_pallas, lu_panel_pallas, qr_panel_pallas)

    if want("panel"):
        for m, b in ((4096, 256), (4096, 128), (2048, 256), (256, 256), (128, 128)):
            p = jax.random.normal(k2, (m, b), jnp.float32)
            t = timeit(lambda p=p: lu_panel_pallas(p)[0])
            report(f"lu_panel ({m},{b})", t)
            print(f"    per-step: {(t-base_rtt)/min(m,b)*1e6:7.2f} us")
        for b in (512, 256, 128):
            g = jax.random.normal(k2, (b, b), jnp.float32)
            blk = matmul(None, g, g.T) / b + jnp.eye(b, dtype=jnp.float32) * 2
            t = timeit(lambda blk=blk: llt_block_pallas(blk)[0])
            report(f"llt_block ({b})", t)
            print(f"    per-step: {(t-base_rtt)/b*1e6:7.2f} us")
        for m, b in ((4096, 128), (4096, 64), (2048, 128)):
            p = jax.random.normal(k2, (m, b), jnp.float32)
            t = timeit(lambda p=p: qr_panel_pallas(p)[0])
            report(f"qr_panel ({m},{b})", t)
            print(f"    per-step: {(t-base_rtt)/min(m,b)*1e6:7.2f} us")

    if want("trsm"):
        from faer_tpu.ops.triangular_solve import solve_unit_lower_triangular

        for b in (512, 256):
            l = jnp.tril(jax.random.normal(k2, (b, b), jnp.float32)) + \
                jnp.eye(b, dtype=jnp.float32) * 3
            rhs = jax.random.normal(k1, (b, N), jnp.float32)
            report(f"trsm unit-lower ({b},{N})",
                   timeit(lambda l=l, rhs=rhs: solve_unit_lower_triangular(l, rhs)),
                   b * b * N)

    if want("gemm-chain"):
        # the LU trailing updates as they appear at block=512
        def chain():
            acc = jnp.zeros((), jnp.float32)
            x = a
            for k in range(0, N, 512):
                mrem = N - k - 512
                if mrem <= 0:
                    break
                acc = acc + jnp.sum(matmul(
                    None, x[k + 512:, k:k + 512], x[k:k + 512, k + 512:]) [0, :2])
            return acc
        report("lu trailing GEMM chain", timeit(chain), 2 * sum(
            (N - k - 512) ** 2 * 512 for k in range(0, N, 512) if N - k - 512 > 0))


if __name__ == "__main__":
    main()
