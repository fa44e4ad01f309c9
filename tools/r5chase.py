"""Round-5: MEASURE the bulge-chase window step (two-stage go/no-go).

The round-3 ask (repeated in round 4) was a measured per-step latency for
the band→tridiagonal chase window kernel (``ops/pallas/band_chase.py``),
to decide whether a two-stage reduction can beat the one-stage blocked
tridiagonalization at n=4096.

Decision arithmetic (BENCH_NOTES round-3 analysis): one-stage 4096 EVD
reduction measured ~1.4 s wall (round-5 spectral: full EVD 1.50 s).  A
two-stage at band b needs ~n²/(2b) serial window steps; at n=4096, b=128
that is ~65k steps; with g window chains batched per step the wall is
(65k/g)·t_step.  Break-even vs the one-stage reduction (~1 s of the EVD
wall) needs t_step·65k/g ≲ 0.3-0.5 s, i.e. t_step ≲ 5-8 µs at g=1 or
≲ 20-30 µs at g=4.

Run: python tools/r5chase.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from faer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from _bench_util import rtt  # noqa: E402


def main():
    import time

    from faer_tpu.ops.pallas.band_chase import chase_probe

    t_rtt = rtt()
    print(f"rtt {t_rtt*1e3:8.3f} ms", flush=True)
    rng = np.random.default_rng(0)
    for b in (64, 128):
        for g in (1, 4, 8):
            r = 4 * b
            band = jnp.asarray(rng.standard_normal((g * r, 2 * b)),
                               jnp.float32)
            for steps in (256, 1024):
                f = lambda x, s=steps: chase_probe(x, b=b, steps=s, g=g)
                out = f(band)
                float(jnp.max(jnp.abs(out)))        # compile + warm
                best = 9e9
                for i in range(5):
                    x = band * (1.0 + 1e-6 * i)
                    t0 = time.perf_counter()
                    float(jnp.max(jnp.abs(f(x))))
                    best = min(best, time.perf_counter() - t0 - t_rtt)
                per = best / steps
                print(f"b={b:4d} g={g} steps={steps:5d}: "
                      f"{per*1e6:8.2f} us/step  "
                      f"({per/g*1e6:6.2f} us/window)", flush=True)


if __name__ == "__main__":
    main()
