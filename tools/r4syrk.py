"""Round-4 SYRK lab: syrk_lower_sub vs full XLA GEMM on chip, and llt_factor
end-to-end with the syrk trailing update wired in."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from faer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from tools._bench_util import timeit, dep  # noqa: E402


def _spd(key, n):
    g = jax.random.normal(key, (n, n), jnp.float32)
    return (g @ g.T / n + 2 * jnp.eye(n, dtype=jnp.float32)).block_until_ready()


def main():
    from faer_tpu.ops.pallas.syrk_kernel import syrk_lower_sub
    from faer_tpu.ops.matmul import matmul

    key = jax.random.key(5)
    print("== syrk vs gemm (trail-update shapes) ==", flush=True)
    for m, k in ((3840, 256), (2048, 256), (3840, 128)):
        c = jax.random.normal(key, (m, m), jnp.float32)
        a = jax.random.normal(jax.random.key(1), (m, k), jnp.float32)
        got = syrk_lower_sub(c, a)
        want = c - matmul(None, a, a.T)
        err = float(jnp.abs(jnp.tril(got) - jnp.tril(want)).max())
        t_s = timeit(lambda x: dep(c, syrk_lower_sub(x, a)), c)
        t_g = timeit(lambda x: dep(c, x - matmul(None, a, a.T)), c)
        print(f"  m={m} k={k}: syrk {t_s*1e3:.3f} ms  gemm {t_g*1e3:.3f} ms"
              f"  err {err:.2e}", flush=True)

    print("== llt_factor end-to-end (syrk wired) ==", flush=True)
    from faer_tpu.linalg.cholesky import llt_factor
    for n in (2048, 4096):
        a = _spd(jax.random.key(2), n)
        l, _ = llt_factor(a)
        r = jnp.abs(jnp.tril(a) - jnp.tril(l @ jnp.conj(l).T)).max()
        t = timeit(lambda x: dep(a, llt_factor(x)[0]), a)
        gf = (n ** 3 / 3) / t / 1e9
        print(f"  n={n}: {t*1e3:.3f} ms  {gf:.0f} GF/s  resid {float(r):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
