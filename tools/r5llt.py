"""Round-5 LLT v5 fused-panel sweep: (b, sb) grid + wired-driver total.

Measures the fused panel (factor + TRSM in one pallas_call) across panel
widths/sub-block sizes, verifies numerics, then times the full llt_factor
with the winning config wired (FAER_TPU_LLT_V5=1 enables the v5 route).
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
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.pallas.llt_panel_v5 import llt_panel_v5_pallas

    which = sys.argv[1:] or ["sweep"]
    key = jax.random.key(0)
    k1, _ = jax.random.split(key)
    g = jax.random.normal(k1, (N, N), jnp.float32)
    spd = matmul(None, g / N, g.T / N) * N + 2 * jnp.eye(N, dtype=jnp.float32)
    spd = spd.block_until_ready()

    if "sweep" in which:
        for b in (256, 512):
            slab = spd[:, :b]
            for sb in (8, 16, 32):
                try:
                    strip, cnt, ok = llt_panel_v5_pallas(slab, sb=sb)
                except Exception as e:  # noqa: BLE001
                    print(f"v5 b={b} sb={sb}: FAIL {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
                    continue
                l11 = np.asarray(strip[:b], np.float64)
                l21 = np.asarray(strip[b:], np.float64)
                a11 = np.asarray(slab[:b], np.float64)
                a11 = np.tril(a11) + np.tril(a11, -1).T
                r11 = np.abs(l11 @ l11.T - a11).max() / np.abs(a11).max()
                r21 = np.abs(l21 @ l11.T - np.asarray(slab[b:])).max() / max(
                    1e-30, np.abs(np.asarray(slab[b:])).max())
                t = timeit(lambda x, _b=b, _sb=sb: dep(
                    x, llt_panel_v5_pallas(x[:, :_b], sb=_sb)[0]), spd,
                    label=f"v5 panel (4096,{b}) sb={sb}")
                print(f"    resid L11 {r11:.1e} L21 {r21:.1e}", flush=True)

    if "total" in which:
        from faer_tpu.core.params import LltParams
        from faer_tpu.linalg.cholesky import llt_factor

        for blk in (256, 512):
            for leaf in (blk,):
                p = LltParams(block_size=blk, kernel_leaf=leaf)
                l, info = llt_factor(spd, params=p)
                ln = np.asarray(l, np.float64)
                an = np.asarray(spd, np.float64)
                rec = np.abs(ln @ ln.T - (np.tril(an) + np.tril(an, -1).T)
                             ).max() / np.abs(an).max()
                t = timeit(lambda x, _p=p: dep(x, llt_factor(x, params=_p)[0]),
                           spd, label=f"llt_factor blk={blk} leaf={leaf}")
                print(f"    -> {N**3/3/t/1e12:6.2f} TF/s  rec {rec:.1e}",
                      flush=True)


if __name__ == "__main__":
    main()
