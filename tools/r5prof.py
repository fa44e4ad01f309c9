"""Round-5 perf attribution + fused-panel kernel measurement (VERDICT #1).

Measures, on the real chip:
  1. current llt/lu/qr totals at 4096 f32;
  2. the per-panel part breakdown of the LLT driver (leaf, TRTRI, L21 GEMM,
     trailing GEMM, mirror) so the gap is attributable (BENCH_NOTES ask);
  3. the new fused v5 LLT panel kernel vs the v4 chain at the same shapes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit, dep

N = 4096


def main():
    from faer_tpu.core.params import LltParams, PartialPivLuParams
    from faer_tpu.linalg.cholesky import llt_factor, _llt_panel_recursive
    from faer_tpu.core.params import LltRegularization
    from faer_tpu.linalg.lu import lu_in_place
    from faer_tpu.linalg.qr import qr_in_place
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.pallas.leaf_v4 import llt_block_v4_pallas
    from faer_tpu.ops.pallas.llt_panel_v5 import llt_panel_v5_pallas
    from faer_tpu.ops.triangular import invert_lower_triangular

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    g = jax.random.normal(k1, (N, N), jnp.float32)
    spd = matmul(None, g / N, g.T / N) * N + 2 * jnp.eye(N, dtype=jnp.float32)

    # -- correctness of the fused panel kernel (CPU check via device) -------
    bw = 256
    slab = spd[:, :bw]
    strip, cnt, ok = llt_panel_v5_pallas(slab)
    l11 = np.asarray(strip[:bw])
    l21 = np.asarray(strip[bw:])
    a11 = np.asarray(slab[:bw])
    a11 = np.tril(a11) + np.tril(a11, -1).T
    r11 = np.abs(l11 @ l11.T - a11).max() / np.abs(a11).max()
    r21 = np.abs(l21 @ l11.T - np.asarray(slab[bw:])).max() / max(
        1e-30, np.abs(np.asarray(slab[bw:])).max())
    print(f"v5 fused panel resid: L11 {r11:.2e}  L21 {r21:.2e}", flush=True)

    # -- totals --------------------------------------------------------------
    for blk in (256, 512):
        p = LltParams(block_size=blk)
        t = timeit(lambda x: dep(x, llt_factor(x, params=p)[0]), spd,
                   label=f"llt_factor total blk={blk}")
        print(f"    -> {N**3/3/t/1e12:6.2f} TF/s", flush=True)
    t = timeit(lambda x: dep(x, lu_in_place(x)[0]), g, label="lu_in_place total")
    print(f"    -> {2*N**3/3/t/1e12:6.2f} TF/s", flush=True)
    t = timeit(lambda x: dep(x, qr_in_place(x)[0]), g, label="qr_in_place total")
    print(f"    -> {4*N**3/3/t/1e12:6.2f} TF/s", flush=True)

    # -- LLT parts at blk=256 ------------------------------------------------
    reg = LltRegularization()
    dblk = spd[:256, :256]
    dsym = jnp.tril(dblk) + jnp.tril(dblk, -1).T

    timeit(lambda x: dep(x, llt_block_v4_pallas(x)[0]), dsym[:128, :128],
           label="leaf v4 128")
    timeit(lambda x: dep(x, llt_block_v4_pallas(x)[0]), dsym,
           label="leaf v4 256")
    timeit(lambda x: dep(x, _llt_panel_recursive(x, reg, 128, True)[0]), dsym,
           label="panel recursive(256, base128)")
    lref = jnp.linalg.cholesky(dsym)
    timeit(lambda x: dep(x, invert_lower_triangular(x, base=256)), lref,
           label="trtri 256")
    a21 = spd[256:, :256]
    li = invert_lower_triangular(lref, base=256)
    timeit(lambda x: dep(x, matmul(None, x, li.T)), a21,
           label="L21 GEMM (3840,256)@(256,256)")
    l21 = matmul(None, a21, li.T)
    timeit(lambda x: dep(x, matmul(None, x, l21.T)), l21,
           label="trailing GEMM (3840,256)@(256,3840)")
    timeit(lambda x: dep(x, jnp.tril(x) + jnp.tril(x, -1).T), dblk,
           label="mirror 256")

    # -- fused v5 panel at full height -------------------------------------
    for sb in (8, 16):
        for b in (256, 512):
            t = timeit(lambda x: dep(x, llt_panel_v5_pallas(
                x[:, :b], sb=sb)[0]), spd,
                label=f"v5 fused panel (4096,{b}) sb={sb}")
    # v4-chain equivalent of one panel step (what the driver does today)
    def chain(x):
        d = jnp.tril(x[:256, :256])
        d = d + jnp.tril(d, -1).T
        l, c, o = _llt_panel_recursive(d, reg, 128, True)
        li = invert_lower_triangular(l, base=256)
        l21 = matmul(None, x[256:, :256], li.T)
        return jnp.concatenate([jnp.tril(l), l21], axis=0)
    timeit(lambda x: dep(x, chain(x)), spd, label="v4 chain panel (4096,256)")


if __name__ == "__main__":
    main()
