import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = 4096
REPS = 5


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


RTT = None


def timeit(step, x0, chain):
    global RTT
    if RTT is None:
        RTT = rtt()
        print(f"rtt {RTT*1e3:8.3f} ms", flush=True)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, chain, lambda i, v: step(v), x)

    float(jnp.max(jnp.abs(run(x0))))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jnp.max(jnp.abs(run(x0))))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - RTT) / chain


def dep(base, out):
    return base + jnp.max(jnp.abs(out)) * 1e-30


def main():
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)

    from faer_tpu.linalg.lu import _panel_lu_blocked
    from faer_tpu.ops.matmul import matmul

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "gemm"):
        l21 = jax.random.normal(k1, (N - 512, 512), jnp.float32)
        u12 = jax.random.normal(k2, (512, N - 512), jnp.float32)
        t = timeit(lambda x: dep(u12, matmul(None, l21, x)), u12, 32)
        print(f"trail GEMM 3584x512x3584   {t*1e3:8.3f} ms ({2*3584*3584*512/t/1e12:6.1f} TF/s)", flush=True)
        sq = jax.random.normal(k1, (N, N), jnp.float32)
        t = timeit(lambda x: dep(sq, matmul(None, sq, x) * (1.0/N)), sq, 8)
        print(f"square GEMM 4096^3         {t*1e3:8.3f} ms ({2*N**3/t/1e12:6.1f} TF/s)", flush=True)

    if which in ("all", "panel"):
        for m, bw in ((4096, 512), (2048, 512), (1024, 512)):
            p = jax.random.normal(k2, (m, bw), jnp.float32)
            t = timeit(lambda x: dep(p, _panel_lu_blocked(x, 128)[0]), p, 16)
            print(f"panel ({m},{bw})           {t*1e3:8.3f} ms", flush=True)

    if which in ("all", "v2"):
        from faer_tpu.ops.pallas.lu_panel_v2 import lu_panel_v2_pallas
        for m in (4096, 2048, 1024):
            p = jax.random.normal(k2, (m, 128), jnp.float32)
            t = timeit(lambda x: dep(p, lu_panel_v2_pallas(x)[0]), p, 16)
            print(f"v2 kernel ({m},128)        {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
