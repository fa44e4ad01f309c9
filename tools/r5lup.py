"""Round-5 LU v5 parts breakdown + (ob, block) config sweep.

Attributes the 6.06 ms v5 wall at 4096² (7.6 TF/s, 12.6% roofline) to its
parts: panel kernels at each height, the outer TRTRI, the outer gathers and
GEMMs — then sweeps (ob, block) configs for the best total.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from faer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from _bench_util import timeit, dep  # noqa: E402

N = 4096


def main():
    from faer_tpu.linalg.lu import _lu_factor_v5
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.pallas.lu_panel_v5 import lu_panel_v5_pallas
    from faer_tpu.ops.triangular import invert_lower_triangular

    which = sys.argv[1:] or ["parts", "sweep"]
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.standard_normal((N, N)), jnp.float32).block_until_ready()

    if "parts" in which:
        for m in (4096, 2048, 1024, 512):
            for b in (256, 512):
                t = timeit(lambda x, _m=m, _b=b: dep(
                    x, lu_panel_v5_pallas(x[:_m, :_b])[0]), g,
                    label=f"v5 panel ({m},{b})")
        lref = jnp.tril(g[:1024, :1024], -1) + jnp.eye(1024, dtype=jnp.float32)
        timeit(lambda x: dep(x, invert_lower_triangular(
            x[:1024, :1024] * 0 + lref, unit=True, base=256)), g,
            label="trtri 1024 unit")
        perm = jnp.asarray(rng.permutation(3072).astype(np.int32))
        timeit(lambda x: dep(x, jnp.take(x[:3072, :3072], perm, axis=0)), g,
               label="gather (3072,3072)")
        timeit(lambda x: dep(x, matmul(None, x[:3072, :1024],
                                       x[:1024, :1024])),
               g, label="GEMM (3072,1024)@(1024,1024)")

    if "sweep" in which:
        for ob, blk in ((1024, 256), (512, 256), (1024, 512), (2048, 256),
                        (512, 512)):
            f = jax.jit(functools.partial(_lu_factor_v5, block=blk, ob=ob))
            lu, perm, info = f(g)
            rec_l = np.tril(np.asarray(lu, np.float64), -1) + np.eye(N)
            rec = np.abs(rec_l @ np.triu(np.asarray(lu, np.float64))
                         - np.asarray(g, np.float64)[np.asarray(perm)]).max()
            t = timeit(lambda x, _f=f: dep(x, _f(x)[0]), g,
                       label=f"v5 total ob={ob} blk={blk}")
            print(f"    -> {2*N**3/3/t/1e12:6.2f} TF/s  rec {rec:.1e}",
                  flush=True)


if __name__ == "__main__":
    main()
