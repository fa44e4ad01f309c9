"""Benchmark harness — run on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N, ...}

Headline metric (BASELINE.json): geometric mean GFLOP/s of 4096² f32
LLT / partial-pivot LU / QR factorizations. ``vs_baseline`` is the fraction of
the *empirical* f32 matmul roofline measured on the same chip in the same
precision policy (bf16x3) — the north-star target is ≥ 0.70.

Timing methodology: this environment's TPU runs behind an async tunnel where
``block_until_ready`` does not wait for execution, so every measurement forces
a device→host scalar read and subtracts the measured round-trip latency.
Details go to stderr; the single JSON line goes to stdout.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp


def _once(f) -> float:
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def _timeit(make_out, reps: int = 11, best: bool = True) -> float:
    """Best (default) or median of per-rep wall times. The shared tunnel's
    throughput varies 2-4x across seconds-long windows; peak-vs-peak (both the
    factor numerator and the matmul-roofline denominator take their best rep)
    is the stable, comparable measurement."""
    f = jax.jit(make_out)
    float(f())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0] if best else ts[len(ts) // 2]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    from faer_tpu.linalg.cholesky import llt_factor
    from faer_tpu.linalg.lu import lu_in_place
    from faer_tpu.linalg.qr import qr_in_place

    n = int(os.environ.get("FAER_TPU_BENCH_N", "4096"))
    key = jax.random.key(0)
    g = jax.random.normal(key, (n, n), jnp.float32)
    a_spd = (g @ g.T / n + jnp.eye(n, dtype=jnp.float32)).block_until_ready()

    rtt = _timeit(lambda: jnp.float32(1.0) + 1.0, reps=11, best=True)
    log(f"host<->device round-trip: {rtt*1e3:.1f} ms (subtracted)")

    # empirical matmul roofline at the library's f32 precision policy —
    # best-of-reps over a long in-jit chain (the denominator must be stable;
    # single short chains vary 2-3× with tunnel noise)
    chain_len = 20

    def mm_chain():
        def body(i, y):
            return jax.lax.dot(y, g, precision=jax.lax.Precision.HIGHEST
                               if os.environ.get("FAER_TPU_F32_PRECISION") == "highest"
                               else jax.lax.Precision.HIGH)
        y = jax.lax.fori_loop(0, chain_len, body, g)
        return jnp.sum(y)

    f = jax.jit(mm_chain)
    float(f())
    best = min(_once(f) for _ in range(5))
    t_mm = max(best - rtt, 1e-9) / chain_len
    peak = 2 * n**3 / t_mm
    log(f"empirical matmul roofline: {peak/1e12:.2f} TFLOP/s ({t_mm*1e3:.2f} ms per {n}³ GEMM)")

    results = {}
    flops = {
        "llt": n**3 / 3,
        "lu": 2 * n**3 / 3,
        "qr": 4 * n**3 / 3,
    }
    t = _timeit(lambda: jnp.sum(llt_factor(a_spd)[0])) - rtt
    results["llt"] = flops["llt"] / t
    log(f"llt  {n}: {t*1e3:7.1f} ms  {results['llt']/1e9:8.0f} GFLOP/s")
    t = _timeit(lambda: jnp.sum(lu_in_place(g)[0])) - rtt
    results["lu"] = flops["lu"] / t
    log(f"lu   {n}: {t*1e3:7.1f} ms  {results['lu']/1e9:8.0f} GFLOP/s")
    t = _timeit(lambda: jnp.sum(qr_in_place(g)[0])) - rtt
    results["qr"] = flops["qr"] / t
    log(f"qr   {n}: {t*1e3:7.1f} ms  {results['qr']/1e9:8.0f} GFLOP/s")

    geomean = math.exp(sum(math.log(v) for v in results.values()) / len(results))
    out = {
        "metric": f"{n}^2 f32 LLT/LU/QR factor geomean throughput (single TPU chip)",
        "value": round(geomean / 1e9, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(geomean / peak, 4),
        "detail": {
            "llt_gflops": round(results["llt"] / 1e9, 1),
            "lu_gflops": round(results["lu"] / 1e9, 1),
            "qr_gflops": round(results["qr"] / 1e9, 1),
            "empirical_matmul_roofline_gflops": round(peak / 1e9, 1),
            "baseline_definition": "fraction of same-chip empirical f32 matmul roofline (north star >= 0.70)",
            "backend": backend,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
