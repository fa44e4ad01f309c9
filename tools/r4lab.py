"""v4 leaf kernel validation + tuning sweeps on the real chip.

Usage: python tools/r4lab.py [check sweep]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from faer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from tools._bench_util import timeit, dep  # noqa: E402
def section_check():
    from faer_tpu.ops.pallas.panel_kernels import llt_block_pallas
    from faer_tpu.ops.pallas.lu_panel_v3 import lu_panel_v3_pallas
    from faer_tpu.ops.pallas.qr_panel_v3 import qr_panel_v3_pallas
    from faer_tpu.ops.pallas.leaf_v4 import (
        llt_block_v4_pallas, lu_panel_v4_pallas, qr_panel_v4_pallas)

    key = jax.random.key(7)
    print("== v4 correctness vs v1/v3 ==", flush=True)
    for b in (128, 256):
        g = jax.random.normal(key, (b, b), jnp.float32)
        blk = g @ g.T / b + 2 * jnp.eye(b, dtype=jnp.float32)
        l1 = np.asarray(llt_block_pallas(blk)[0])
        for sb in (8, 16):
            l4 = np.asarray(llt_block_v4_pallas(blk, sb=sb)[0])
            err = np.max(np.abs(l4 - l1)) / np.max(np.abs(l1))
            print(f"  llt b={b} sb={sb}: rel diff vs v1 = {err:.2e}", flush=True)

    for (m, b) in ((512, 128), (2048, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        pk3, pm3, nt3, ok3 = lu_panel_v3_pallas(p)
        for sb in (8, 16):
            pk4, pm4, nt4, ok4 = lu_panel_v4_pallas(p, sb=sb)
            dpk = np.max(np.abs(np.asarray(pk4) - np.asarray(pk3)))
            dpm = np.max(np.abs(np.asarray(pm4) - np.asarray(pm3)))
            print(f"  lu ({m},{b}) sb={sb}: max|packed diff|={dpk:.2e} "
                  f"perm diff={dpm} nt {int(nt3)}=={int(nt4)} ok={bool(ok4)}",
                  flush=True)

    for (m, b) in ((512, 128), (2048, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        pk3, t3 = qr_panel_v3_pallas(p)
        for sb in (8, 16):
            pk4, t4 = qr_panel_v4_pallas(p, sb=sb)
            dpk = np.max(np.abs(np.asarray(pk4) - np.asarray(pk3)))
            dt = np.max(np.abs(np.asarray(t4) - np.asarray(t3)))
            print(f"  qr ({m},{b}) sb={sb}: max|packed diff|={dpk:.2e} "
                  f"|tau diff|={dt:.2e}", flush=True)


def section_sweep():
    from faer_tpu.ops.pallas.leaf_v4 import (
        llt_block_v4_pallas, lu_panel_v4_pallas, qr_panel_v4_pallas)

    key = jax.random.key(8)
    print("== llt v4 sweep ==", flush=True)
    for b in (256, 512):
        g = jax.random.normal(key, (b, b), jnp.float32)
        blk = g @ g.T / b + 2 * jnp.eye(b, dtype=jnp.float32)
        for sb in (8, 16):
            f = functools.partial(llt_block_v4_pallas, sb=sb, rch=256)
            t = timeit(lambda x: dep(blk, f(x)[0]), blk)
            print(f"  llt b={b} sb={sb}: {t*1e6:7.1f} us", flush=True)

    print("== lu v4 sweep ==", flush=True)
    for (m, b) in ((4096, 256), (2048, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        for sb in (8, 16):
            for rch in (64, 128):
                f = functools.partial(lu_panel_v4_pallas, sb=sb, rch=rch)
                t = timeit(lambda x: dep(p, f(x)[0]), p)
                print(f"  lu ({m},{b}) sb={sb} rch={rch}: {t*1e6:7.1f} us "
                      f"({t/b*1e9:6.0f} ns/step)", flush=True)

    print("== qr v4 sweep ==", flush=True)
    for (m, b) in ((4096, 128), (4096, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        for sb in (8, 16):
            f = functools.partial(qr_panel_v4_pallas, sb=sb, rch=128)
            t = timeit(lambda x: dep(p, f(x)[0]), p)
            print(f"  qr ({m},{b}) sb={sb}: {t*1e6:7.1f} us "
                  f"({t/b*1e9:6.0f} ns/step)", flush=True)


if __name__ == "__main__":
    secs = sys.argv[1:] or ["check", "sweep"]
    for s in secs:
        globals()[f"section_{s}"]()
