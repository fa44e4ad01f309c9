"""Breakdown of llt_factor time at 4096 f32 on the real TPU, plus
block-size sweeps for llt/lu (the trailing-GEMM vs panel-cost tradeoff
moved when the v3 leaf kernels landed)."""
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
    from faer_tpu.core.params import LltParams, PartialPivLuParams
    from faer_tpu.linalg.cholesky import llt_factor
    from faer_tpu.linalg.lu import lu_in_place
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.pallas.panel_kernels import llt_block_pallas
    from faer_tpu.ops.triangular import invert_lower_triangular

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    g = jax.random.normal(k1, (N, N), jnp.float32)
    spd = matmul(None, g / N, g.T / N) * N + 2 * jnp.eye(N, dtype=jnp.float32)

    for blk in (256, 512, 1024):
        p = LltParams(block_size=blk)
        t = timeit(lambda x: dep(spd, llt_factor(x, params=p)[0]), spd)
        print(f"llt_factor block={blk:4d}   {t*1e3:8.3f} ms  "
              f"{N**3/3/t/1e9:7.0f} GF/s", flush=True)

    for blk in (512, 1024):
        p = PartialPivLuParams(block_size=blk)
        t = timeit(lambda x: dep(g, lu_in_place(x, params=p)[0]), g)
        print(f"lu_in_place block={blk:4d}  {t*1e3:8.3f} ms  "
              f"{2*N**3/3/t/1e9:7.0f} GF/s", flush=True)

    # leaf + trtri costs at the llt panel sizes
    for b in (256, 512):
        gb = jax.random.normal(k2, (b, b), jnp.float32)
        blkm = matmul(None, gb, gb.T) / b + 2 * jnp.eye(b, dtype=jnp.float32)
        t = timeit(lambda x: dep(blkm, llt_block_pallas(x)[0]), blkm)
        print(f"llt leaf ({b})          {t*1e3:8.3f} ms", flush=True)
        l = jnp.tril(gb) + 3 * jnp.eye(b, dtype=jnp.float32)
        t = timeit(lambda x: dep(l, invert_lower_triangular(x, base=b)), l)
        print(f"trtri ({b})             {t*1e3:8.3f} ms", flush=True)

    # one llt trailing step at full size: l21 GEMM + syrk
    b = 256
    l21 = jax.random.normal(k1, (N - b, b), jnp.float32)
    t = timeit(lambda x: dep(l21, matmul(None, x, jnp.conj(x).T)), l21)
    print(f"syrk (3840,{b})         {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
