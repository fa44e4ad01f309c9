"""Round-4 end-to-end block/leaf sweep for llt_factor and lu_in_place.

The trailing-update HBM traffic of a right-looking factorization scales as
n^3/block; the panel serial cost grows with block.  Sweep the library's own
params (no inline variants) to find the knee on v5e.
Usage: python tools/r4sweep.py [llt] [lu] [qr]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from faer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from tools._bench_util import timeit, dep  # noqa: E402

N = int(os.environ.get("N", "4096"))


def _spd(key, n):
    g = jax.random.normal(key, (n, n), jnp.float32)
    return (g @ g.T / n + 2 * jnp.eye(n, dtype=jnp.float32)).block_until_ready()


def sweep_llt():
    from faer_tpu.linalg.cholesky import llt_factor
    from faer_tpu.core.params import LltParams

    a = _spd(jax.random.key(2), N)
    print(f"== llt block/leaf sweep n={N} ==", flush=True)
    for block, leaf in ((256, 128), (512, 128), (512, 256), (1024, 128)):
        p = LltParams(block_size=block, kernel_leaf=leaf)
        l, _ = llt_factor(a, params=p)
        r = float(jnp.abs(jnp.tril(a) - jnp.tril(l @ l.T)).max())
        t = timeit(lambda x: dep(a, llt_factor(x, params=p)[0]), a)
        gf = (N ** 3 / 3) / t / 1e9
        print(f"  block={block} leaf={leaf}: {t*1e3:7.3f} ms {gf:7.0f} GF/s"
              f"  resid {r:.1e}", flush=True)


def sweep_lu():
    from faer_tpu.linalg.lu import lu_in_place
    from faer_tpu.core.params import PartialPivLuParams

    a = jax.random.normal(jax.random.key(3), (N, N), jnp.float32)
    a = a.block_until_ready()
    print(f"== lu block/leaf sweep n={N} ==", flush=True)
    for block, leaf in ((512, 256), (512, 128), (1024, 256), (1024, 128),
                        (256, 128)):
        p = PartialPivLuParams(block_size=block, kernel_leaf=leaf)
        lu, perm, info = lu_in_place(a, params=p)
        l = jnp.tril(lu, -1) + jnp.eye(N, dtype=lu.dtype)
        resid = float(jnp.abs(jnp.take(a, perm, axis=0)
                              - l @ jnp.triu(lu)).max())
        t = timeit(lambda x: dep(a, lu_in_place(x, params=p)[0]), a)
        gf = (2 * N ** 3 / 3) / t / 1e9
        print(f"  block={block} leaf={leaf}: {t*1e3:7.3f} ms {gf:7.0f} GF/s"
              f"  resid {resid:.1e}", flush=True)


def sweep_qr():
    from faer_tpu.linalg.qr import qr_in_place
    from faer_tpu.core.params import QrParams

    a = jax.random.normal(jax.random.key(4), (N, N), jnp.float32)
    a = a.block_until_ready()
    print(f"== qr block/leaf sweep n={N} ==", flush=True)
    for block, leaf in ((512, 128), (512, 256), (1024, 128)):
        p = QrParams(block_size=block, kernel_leaf=leaf)
        t = timeit(lambda x: dep(a, qr_in_place(x, params=p)[0]), a)
        gf = (4 * N ** 3 / 3) / t / 1e9
        print(f"  block={block} leaf={leaf}: {t*1e3:7.3f} ms {gf:7.0f} GF/s",
              flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["llt", "lu"]
    for s in args:
        {"llt": sweep_llt, "lu": sweep_lu, "qr": sweep_qr}[s]()
