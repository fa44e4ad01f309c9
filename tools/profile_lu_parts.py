"""Breakdown of lu_in_place time at 4096 f32 on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = 4096
CHAIN = 8
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


def timeit(step, x0, chain=CHAIN):
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
    a = jax.random.normal(k1, (N, N), jnp.float32)

    from faer_tpu.linalg.lu import _panel_lu_blocked, lu_in_place
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.triangular import invert_lower_triangular

    t = timeit(lambda x: dep(a, lu_in_place(x)[0]), a)
    print(f"lu_in_place total      {t*1e3:8.3f} ms", flush=True)

    for bw in (512, 256):
        p = jax.random.normal(k2, (N, bw), jnp.float32)
        t = timeit(lambda x: dep(p, _panel_lu_blocked(x, 128)[0]), p)
        print(f"panel ({N},{bw})        {t*1e3:8.3f} ms", flush=True)

    # one full-trail pivot gather
    perm = jax.random.permutation(k1, N).astype(jnp.int32)
    t = timeit(lambda x: dep(a, jnp.take(x, perm, axis=0)), a)
    print(f"gather (4096,4096)     {t*1e3:8.3f} ms", flush=True)

    # u12 = L11^-1 @ right (512, 3584)
    l = jnp.tril(jax.random.normal(k2, (512, 512), jnp.float32)) + 3 * jnp.eye(512, dtype=jnp.float32)
    r = jax.random.normal(k1, (512, N), jnp.float32)
    linv = invert_lower_triangular(l, unit=True, base=512)
    t = timeit(lambda x: dep(r, matmul(None, linv, x, precision=jax.lax.Precision.HIGHEST)), r)
    print(f"u12 GEMM HIGHEST       {t*1e3:8.3f} ms", flush=True)
    t = timeit(lambda x: dep(l, invert_lower_triangular(x, unit=True, base=512)), l)
    print(f"trtri(512)             {t*1e3:8.3f} ms", flush=True)

    # trailing GEMM (3584, 512) @ (512, 3584)
    l21 = jax.random.normal(k1, (N - 512, 512), jnp.float32)
    u12 = jax.random.normal(k2, (512, N - 512), jnp.float32)
    t = timeit(lambda x: dep(u12, matmul(None, l21, x)), u12)
    print(f"trail GEMM 3584x512^2  {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
