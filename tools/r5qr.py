"""Round-5 QR panel v4 vs v5 + driver leaf/block sweep.

QR is 4n³/3 flops at 15.9 TF/s (26.6% roofline, r4 bench) — panel-bound like
LU but with NO pivot chain, so the v5 dot-policy lever (bf16x3 couplings +
sb=16) should transfer directly.  Measures panel kernels across shapes, then
the full driver with the winner wired.
"""
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
    from faer_tpu.core.params import QrParams
    from faer_tpu.linalg.qr import qr_in_place, qr_reconstruct
    from faer_tpu.ops.pallas.leaf_v4 import qr_panel_v4_pallas
    from faer_tpu.ops.pallas.qr_panel_v5 import qr_panel_v5_pallas

    which = sys.argv[1:] or ["panels", "total"]
    rng = np.random.default_rng(11)
    g = jnp.asarray(rng.standard_normal((N, N)), jnp.float32).block_until_ready()

    if "panels" in which:
        # correctness of v5 at (1024, 256)
        pan = g[:1024, :256]
        packed, taus = qr_panel_v5_pallas(pan)
        pk = np.asarray(packed, np.float64)
        v = np.tril(pk, -1)[:, :256] + np.eye(1024, 256)
        r = np.triu(pk[:256])
        q = np.eye(1024)
        tn = np.asarray(taus, np.float64)
        for j in range(255, -1, -1):
            vj = v[:, j]
            q = q - tn[j] * np.outer(vj, vj @ q)
        resid = np.abs(q @ np.vstack([r, np.zeros((768, 256))])
                       - np.asarray(pan, np.float64)).max()
        print(f"v5 qr panel resid (1024,256): {resid:.2e}", flush=True)

        for m in (4096, 2048, 1024):
            for b in (128, 256, 512):
                t4 = timeit(lambda x, _m=m, _b=b: dep(
                    x, qr_panel_v4_pallas(x[:_m, :_b])[0]), g,
                    label=f"v4 qr panel ({m},{b})")
                t5 = timeit(lambda x, _m=m, _b=b: dep(
                    x, qr_panel_v5_pallas(x[:_m, :_b])[0]), g,
                    label=f"v5 qr panel ({m},{b})")

    if "total" in which:
        for blk, leaf in ((512, 128), (512, 256), (512, 512), (256, 256)):
            p = QrParams(block_size=blk, kernel_leaf=leaf)
            packed, ts, b_ = qr_in_place(g, params=p)
            rec = np.abs(np.asarray(qr_reconstruct(packed, ts, b_), np.float64)
                         - np.asarray(g, np.float64)).max()
            t = timeit(lambda x, _p=p: dep(
                x, qr_in_place(x, params=_p)[0]), g,
                label=f"qr_in_place blk={blk} leaf={leaf}")
            print(f"    -> {4*N**3/3/t/1e12:6.2f} TF/s  rec {rec:.1e}",
                  flush=True)


if __name__ == "__main__":
    main()
