"""Chip wall times for the remaining BASELINE configs (round-3 ask #9):
4096 self-adjoint EVD + SVD, and the 8192x2048 tall-skinny lstsq.

Timing: data-dependent chains inside one jitted program are impractical for
multi-second spectral dispatches; instead each timing is a forced host read
with the measured tunnel RTT subtracted, repeated, best-of-k.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    # force host read of one leaf
    leaf = jax.tree.leaves(out)[0]
    float(jnp.max(jnp.abs(leaf)))
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.max(jnp.abs(leaf)))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from faer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    which = args[0] if args else "all"
    out_json = {}
    key = jax.random.key(0)

    if which in ("evd", "all", "spectral"):
        n = 4096
        g = jax.random.normal(key, (n, n), jnp.float32)
        a = (g + g.T) / 2
        from faer_tpu.linalg.evd import self_adjoint_evd

        t, (w, v, info) = timed(jax.jit(self_adjoint_evd), a)
        wn = np.asarray(w, np.float64)
        vn = np.asarray(v, np.float64)
        an = np.asarray(a, np.float64)
        res = np.linalg.norm(an @ vn - vn * wn[None, :]) / np.linalg.norm(an)
        orth = np.abs(vn.T @ vn - np.eye(n)).max()
        print(f"evd  {n}: {t*1e3:9.1f} ms   resid {res:.2e}  orth {orth:.2e}",
              flush=True)
        out_json["evd_4096_ms"] = round(t * 1e3, 1)
        out_json["evd_4096_resid"] = float(f"{res:.2e}")

    if which in ("svd", "all", "spectral"):
        n = 4096
        g = jax.random.normal(jax.random.key(1), (n, n), jnp.float32)
        from faer_tpu.linalg.svd import svd

        t, (u, s, v, info) = timed(jax.jit(svd), g)
        un = np.asarray(u, np.float64)
        sn = np.asarray(s, np.float64)
        vn = np.asarray(v, np.float64)
        gn = np.asarray(g, np.float64)
        rec = np.abs(un @ (sn[:, None] * vn.T) - gn).max() / np.abs(gn).max()
        orth = np.abs(un.T @ un - np.eye(n)).max()
        print(f"svd  {n}: {t*1e3:9.1f} ms   rec {rec:.2e}  orthU {orth:.2e}",
              flush=True)
        out_json["svd_4096_ms"] = round(t * 1e3, 1)
        out_json["svd_4096_rec"] = float(f"{rec:.2e}")

    if which in ("llt64", "all"):
        # BASELINE config: f64 SPD 1024 LLT factor + solve (f64 on TPU is
        # emulated — report honestly alongside the f32 headline)
        n = 1024
        g = jax.random.normal(jax.random.key(4), (n, n), jnp.float32).astype(
            jnp.float64)
        a = g @ g.T / n + jnp.eye(n, dtype=jnp.float64)
        b = jax.random.normal(jax.random.key(5), (n, 4), jnp.float32).astype(
            jnp.float64)
        from faer_tpu.linalg.cholesky import llt_factor, llt_solve

        def fs(a_, b_):
            l, info = llt_factor(a_)
            return llt_solve(l, b_)

        t, x = timed(jax.jit(fs), a, b)
        res = np.linalg.norm(np.asarray(a, np.float64) @ np.asarray(x)
                             - np.asarray(b, np.float64))
        print(f"llt+solve f64 {n}: {t*1e3:9.1f} ms   residual {res:.2e}",
              flush=True)

    if which in ("lstsq", "all", "spectral"):
        m, n = 8192, 2048
        g = jax.random.normal(jax.random.key(2), (m, n), jnp.float32)
        b = jax.random.normal(jax.random.key(3), (m, 4), jnp.float32)
        from faer_tpu.linalg.qr import qr_in_place, qr_solve_lstsq

        def lstsq(a_, b_):
            packed, ts, blk = qr_in_place(a_)
            return qr_solve_lstsq(packed, ts, blk, b_)

        t, x = timed(jax.jit(lstsq), g, b)
        flops = 2 * n * n * (m - n / 3)
        xn = np.asarray(x, np.float64)
        gn = np.asarray(g, np.float64)
        res = np.linalg.norm(gn.T @ (gn @ xn - np.asarray(b, np.float64)))
        print(f"lstsq {m}x{n}: {t*1e3:9.1f} ms   {flops/t/1e12:6.2f} TFLOP/s   "
              f"normal-eq resid {res:.2e}", flush=True)
        out_json["lstsq_8192x2048_ms"] = round(t * 1e3, 1)

    if as_json:
        import json

        print("JSON:" + json.dumps(out_json), flush=True)


if __name__ == "__main__":
    main()
