"""Round-5 LU wide-kernel experiment: one v5 kernel per ob-strip.

r5lu6 showed the v5 panel's serial pivot chain is the floor (~1 us/column,
nearly config-independent: 269.7 default vs 261.8 at sb=32/rch=512/win=False
at (4096,256)).  The remaining LU lever is GLUE: the two-level driver pays a
full-strip gather + TRTRI + two GEMMs + a strip concat per 256-panel.  The
v5 kernel's coupling loop already expresses the whole strip factorization:
calling it at width ow folds panel+TRSM+trailing-within-strip into ONE
pallas_call (couplings every ``sb`` columns via bf16x3 MXU dots).  The old
"512-wide kernel is slower" finding (1.55 ms) predates the bf16x3 coupling
policy; this measures v5 at widths 512/1024.

Run: python tools/r5lu7.py [widths ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from faer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from _bench_util import timeit, dep  # noqa: E402


def check(p, **cfg):
    from faer_tpu.ops.pallas.lu_panel_v5 import lu_panel_v5_pallas

    packed, perm, nt, ok = lu_panel_v5_pallas(p, **cfg)
    m, b = p.shape
    pn = np.asarray(packed, np.float64)
    l = np.tril(pn, -1)[:, :b] + np.eye(m, b)
    u = np.triu(pn)[:b]
    ref = np.asarray(p, np.float64)[np.asarray(perm)]
    return np.linalg.norm(l @ u - ref) / max(1.0, np.linalg.norm(ref))


def main():
    from faer_tpu.ops.pallas.lu_panel_v5 import lu_panel_v5_pallas

    widths = [int(x) for x in sys.argv[1:]] or [512, 1024]
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.standard_normal((4096, 4096)),
                    jnp.float32).block_until_ready()
    for b in widths:
        for c in (dict(sb=32, rch=512, win=False),
                  dict(sb=16, rch=512, win=False)):
            r = check(g[:2048, :b], **c)
            timeit(lambda x, _b=b, _c=c: dep(
                x, lu_panel_v5_pallas(x[:, :_b], **_c)[0]), g,
                label=f"lu v5 wide {c} (4096,{b})")
            print(f"    resid(2048,{b}) {r:.1e}", flush=True)


if __name__ == "__main__":
    main()
