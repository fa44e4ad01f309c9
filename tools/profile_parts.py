"""Component-level timing at n=4096 f32 on the real TPU.

Methodology: the axon tunnel has ~25 ms RTT, ~3 ms per-dispatch overhead, and
caches identical dispatch requests — so every measurement runs a K-deep
*data-dependent* chain inside ONE jitted program (lax.fori_loop carrying the
output back into the input) and reports (wall - rtt) / K.

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
REPS = 5
CHAIN = 8

_rtt_cache = None


def rtt():
    global _rtt_cache
    if _rtt_cache is None:
        x = jnp.zeros(())
        f = jax.jit(lambda v: v + 1)
        float(f(x))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _rtt_cache = min(ts)
        print(f"rtt {_rtt_cache*1e3:8.3f} ms", flush=True)
    return _rtt_cache


def timeit(step, x0, chain=CHAIN, reps=REPS):
    """step: x -> x' (same shape/dtype, data-dependent). Returns s/op."""
    base = rtt()

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, chain, lambda i, v: step(v), x)

    float(jnp.max(jnp.abs(run(x0))))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(run(x0))))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - base, 1e-9) / chain


def report(name, t, flops=None):
    gf = f"  {flops/t/1e9:8.0f} GF/s" if flops else ""
    print(f"{name:34s} {t*1e3:9.3f} ms{gf}", flush=True)
    return t


def dep(base, out):
    """Perturb `base` by `out` so the chain is data-dependent but numerically
    unchanged."""
    return base + out * jnp.asarray(1e-30, base.dtype)


def main():
    parts = set(sys.argv[1:]) or None
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (N, N), jnp.float32)

    def want(name):
        return parts is None or any(p in name for p in parts)

    from faer_tpu.ops.matmul import matmul

    if want("matmul"):
        report("matmul 4096^3 (policy)",
               timeit(lambda x: matmul(None, x, x) * (1.0 / N), a), 2 * N**3)

    if want("llt") or want("chol"):
        from faer_tpu.linalg.cholesky import llt_factor

        g = a / N
        spd = matmul(None, g, g.T) + jnp.eye(N, dtype=jnp.float32) * 2
        report("llt_factor 4096",
               timeit(lambda x: dep(spd, llt_factor(x)[0]), spd), N**3 / 3)

    if want("lu"):
        from faer_tpu.linalg.lu import lu_in_place

        report("lu_in_place 4096",
               timeit(lambda x: dep(a, lu_in_place(x)[0]), a), 2 * N**3 / 3)

    if want("qr"):
        from faer_tpu.linalg.qr import qr_in_place

        report("qr_in_place 4096",
               timeit(lambda x: dep(a, qr_in_place(x)[0]), a), 4 * N**3 / 3)

    from faer_tpu.ops.pallas.panel_kernels import (
        llt_block_pallas, lu_panel_pallas, qr_panel_pallas)

    if want("panel"):
        for m, b in ((4096, 256), (4096, 128), (2048, 256), (1024, 256), (256, 256)):
            p = jax.random.normal(k2, (m, b), jnp.float32)
            t = report(f"lu_panel ({m},{b})",
                       timeit(lambda x: dep(p, lu_panel_pallas(x)[0]), p))
            print(f"    per-step: {t/min(m,b)*1e6:7.2f} us")
        for b in (512, 256, 128):
            g = jax.random.normal(k2, (b, b), jnp.float32)
            blk = matmul(None, g, g.T) / b + jnp.eye(b, dtype=jnp.float32) * 2
            t = report(f"llt_block ({b})",
                       timeit(lambda x: dep(blk, llt_block_pallas(x)[0]), blk))
            print(f"    per-step: {t/b*1e6:7.2f} us")
        for m, b in ((4096, 128), (2048, 128), (1024, 128), (256, 128)):
            p = jax.random.normal(k2, (m, b), jnp.float32)
            t = report(f"qr_panel ({m},{b})",
                       timeit(lambda x: dep(p, qr_panel_pallas(x)[0]), p))
            print(f"    per-step: {t/min(m,b)*1e6:7.2f} us")

    if want("trsm") or want("tri"):
        from faer_tpu.ops.triangular import invert_lower_triangular
        from faer_tpu.ops.triangular_solve import solve_unit_lower_triangular

        for b in (512, 256):
            l = jnp.tril(jax.random.normal(k2, (b, b), jnp.float32)) + \
                jnp.eye(b, dtype=jnp.float32) * 3
            rhs = jax.random.normal(k1, (b, N), jnp.float32)
            report(f"trsm unit-lower ({b},{N})",
                   timeit(lambda x: dep(rhs, solve_unit_lower_triangular(l, x)),
                          rhs), b * b * N)
            report(f"trtri ({b})",
                   timeit(lambda x: dep(l, invert_lower_triangular(x, base=b)), l),
                   b ** 3 / 3)


if __name__ == "__main__":
    main()
