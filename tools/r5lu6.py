"""Round-5 LU panel issue-bound experiments.

tools/r5lup.py parts showed the v5 panel cost is nearly m-INDEPENDENT
(176 µs at (512,256) vs 293 µs at (4096,256)): the serial chain and the
coupling rounds are op-ISSUE-bound, not data-bound.  Levers that cut issued
ops without touching flops:

  * rch 128 -> 256/512: 4x fewer coupling chunk dots per round
  * win=False at sb=16: the windowed pivot extract is 4 small issues vs
    2 wide ones
  * sb=32: half the coupling rounds (more in-sub rank-1 work, but that is
    cheap at these widths)

Run: python tools/r5lu6.py
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

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.standard_normal((4096, 4096)),
                    jnp.float32).block_until_ready()

    cfgs = [
        dict(sb=16, rch=128, win=True),    # current default
        dict(sb=16, rch=256, win=True),
        dict(sb=16, rch=512, win=True),
        dict(sb=16, rch=512, win=False),
        dict(sb=32, rch=512, win=True),
    ]
    for c in cfgs:
        r = check(g[:1024, :256], **c)
        for m in (4096, 512):
            timeit(lambda x, _m=m, _c=c: dep(
                x, lu_panel_v5_pallas(x[:_m, :256], **_c)[0]), g,
                label=f"lu v5 {c} ({m},256)")
        print(f"    resid(1024,256) {r:.1e}", flush=True)




def round2():
    """Second batch: sb=32+win=False, maxmin pivot reduce, 128-wide panels."""
    from faer_tpu.ops.pallas.lu_panel_v5 import lu_panel_v5_pallas

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.standard_normal((4096, 4096)),
                    jnp.float32).block_until_ready()
    cfgs = [
        dict(sb=32, rch=512, win=False),
        dict(sb=32, rch=512, win=False, maxmin=True),
        dict(sb=32, rch=512, win=True, maxmin=True),
        dict(sb=16, rch=512, win=False, maxmin=True),
    ]
    for c in cfgs:
        r = check(g[:1024, :256], **c)
        for m in (4096, 512):
            timeit(lambda x, _m=m, _c=c: dep(
                x, lu_panel_v5_pallas(x[:_m, :256], **_c)[0]), g,
                label=f"lu v5 {c} ({m},256)")
        print(f"    resid(1024,256) {r:.1e}", flush=True)
    # narrow panels for a blk=128 driver variant
    for c in (dict(sb=32, rch=512, win=False),):
        for m, b in ((4096, 128), (2048, 128), (1024, 128)):
            timeit(lambda x, _m=m, _b=b, _c=c: dep(
                x, lu_panel_v5_pallas(x[:_m, :_b], **_c)[0]), g,
                label=f"lu v5 {c} ({m},{b})")


if __name__ == "__main__":
    (round2 if "round2" in sys.argv[1:] else main)()
