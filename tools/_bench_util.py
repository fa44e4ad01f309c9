"""Shared on-chip timing helper for the perf tools.

Tunnel gotchas this works around (v5e behind the axon RPC tunnel):
  * ~30 ms RTT with several ms jitter → every measurement chains enough
    device work behind one host read (>= ~120 ms) to bound the error;
  * the tunnel CACHES identical dispatch requests → each rep must use a
    *distinct* input value or later reps return at RTT (observed as negative
    per-op times after RTT subtraction).
"""
import time

import jax
import jax.numpy as jnp

REPS = 5
_RTT = None


def rtt():
    x = jnp.zeros(())
    f = jax.jit(lambda v: v + 1)
    float(f(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(step, x0, chain=None, label=None):
    global _RTT
    if _RTT is None:
        _RTT = rtt()
        print(f"rtt {_RTT*1e3:8.3f} ms", flush=True)

    def make(c):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, c, lambda i, v: step(v), x)
        return run

    # distinct inputs per rep defeat the tunnel's request cache
    xs = [x0 * (1.0 + 1e-6 * i) for i in range(REPS + 1)]
    if chain is None:
        probe = make(4)
        float(jnp.max(jnp.abs(probe(xs[0]))))
        est = 9e9
        for i in (1, 2):
            t0 = time.perf_counter()
            float(jnp.max(jnp.abs(probe(xs[i]))))
            est = min(est, max((time.perf_counter() - t0 - _RTT) / 4, 1e-6))
        chain = max(4, min(4096, int(0.12 / est)))
    run = make(chain)
    float(jnp.max(jnp.abs(run(xs[0]))))          # compile + warm
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(run(xs[i + 1]))))
        ts.append(time.perf_counter() - t0)
    t = (min(ts) - _RTT) / chain
    if label:
        print(f"  {label}: {t*1e6:9.1f} us", flush=True)
    return t


def dep(base, out):
    return base + jnp.max(jnp.abs(out)) * 1e-30
