"""Round-4 pipeline part breakdown on the real chip.

Sections:
  llt   — leaf v1/v3 @256 (accurate), trtri 256/512 variants, llt_factor
          at block 256/512, assembly cost probe
  qr    — qr leaf, form_block_t(4096,512), apply_block_on_left, panel(4096,512),
          qr_in_place total
  lu    — lu leaf (4096,256) / (2048,256), panel blocked (4096,512),
          lu_in_place total
Usage: python tools/r4parts.py [llt qr lu]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from faer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from tools._bench_util import timeit, dep  # noqa: E402
def section_llt():
    from faer_tpu.core.params import LltParams
    from faer_tpu.linalg.cholesky import llt_factor, _llt_panel_recursive
    from faer_tpu.core.params import LltRegularization
    from faer_tpu.ops.pallas.panel_kernels import (
        llt_block_pallas, llt_block_v3_pallas, trtri_pallas)
    from faer_tpu.ops.triangular import invert_lower_triangular
    from faer_tpu.ops.matmul import matmul

    key = jax.random.key(1)
    print("== LLT parts ==", flush=True)
    for b in (256, 512):
        g = jax.random.normal(key, (b, b), jnp.float32)
        blk = g @ g.T / b + 2 * jnp.eye(b, dtype=jnp.float32)
        t1 = timeit(lambda x: dep(blk, llt_block_pallas(x)[0]), blk)
        t3 = timeit(lambda x: dep(blk, llt_block_v3_pallas(x)[0]), blk)
        reg = LltRegularization()
        rec = jax.jit(lambda x: _llt_panel_recursive(x, reg, 256)[0])
        tr = timeit(lambda x: dep(blk, rec(x)), blk)
        tt = timeit(lambda x: dep(blk, trtri_pallas(
            jnp.tril(x) + 3 * jnp.eye(b, dtype=jnp.float32))), blk)
        lw = jnp.tril(blk) + 3 * jnp.eye(b, dtype=jnp.float32)
        tx = timeit(lambda x: dep(blk, invert_lower_triangular(x, base=b)), lw)
        tx2 = timeit(lambda x: dep(blk, invert_lower_triangular(x, base=128)), lw)
        print(f"  b={b:4d} leaf_v1 {t1*1e6:7.1f}  leaf_v3 {t3*1e6:7.1f}  "
              f"recursive(256) {tr*1e6:7.1f}  trtri_pl {tt*1e6:7.1f}  "
              f"inv_xla(base=b) {tx*1e6:7.1f}  inv_xla(base=128) {tx2*1e6:7.1f} us",
              flush=True)

    n = 4096
    g = jax.random.normal(key, (n, n), jnp.float32)
    spd = (g @ g.T / n + jnp.eye(n, dtype=jnp.float32)).block_until_ready()
    for blk_sz in (256, 512):
        p = LltParams(block_size=blk_sz)
        t = timeit(lambda x: dep(spd, llt_factor(x, params=p)[0]), spd)
        print(f"  llt_factor 4096 block={blk_sz}: {t*1e3:7.3f} ms "
              f"({n**3/3/t/1e9:6.0f} GF/s)", flush=True)


def section_qr():
    from faer_tpu.core.params import QrParams
    from faer_tpu.linalg.qr import qr_in_place, _panel_qr_blocked_classic, _extract_v
    from faer_tpu.ops.householder import form_block_t, apply_block_on_left
    from faer_tpu.ops.pallas.qr_panel_v3 import qr_panel_v3_pallas

    key = jax.random.key(2)
    m = 4096
    print("== QR parts ==", flush=True)
    pan = jax.random.normal(key, (m, 512), jnp.float32)
    t = timeit(lambda x: dep(pan, qr_panel_v3_pallas(x[:, :128])[0]), pan)
    print(f"  leaf v3 (4096,128): {t*1e6:7.1f} us", flush=True)

    pb = jax.jit(lambda x: _panel_qr_blocked_classic(x, 128)[0])
    t = timeit(lambda x: dep(pan, pb(x)), pan)
    print(f"  panel classic (4096,512): {t*1e6:7.1f} us", flush=True)

    vfix = jnp.tril(pan, -1)[:, :512] + jnp.eye(m, 512, dtype=jnp.float32)
    taus = jnp.full((512,), 1.3, jnp.float32)
    fbt = jax.jit(form_block_t)
    t = timeit(lambda x: dep(pan, fbt(x, taus)), vfix)
    print(f"  form_block_t (4096,512): {t*1e6:7.1f} us", flush=True)

    tmat = fbt(vfix, taus)
    bmat = jax.random.normal(key, (m, 3584), jnp.float32)
    ab = jax.jit(functools.partial(apply_block_on_left, adjoint=True))
    t = timeit(lambda x: dep(bmat, ab(vfix, tmat, x)), bmat)
    print(f"  apply_block (4096,512)->3584: {t*1e6:7.1f} us", flush=True)

    a = jax.random.normal(key, (m, m), jnp.float32)
    t = timeit(lambda x: dep(a, qr_in_place(x)[0]), a)
    print(f"  qr_in_place 4096: {t*1e3:7.3f} ms ({4*m**3/3/t/1e9:6.0f} GF/s)",
          flush=True)


def section_lu():
    from faer_tpu.core.params import PartialPivLuParams
    from faer_tpu.linalg.lu import lu_in_place, _panel_lu_blocked
    from faer_tpu.ops.pallas.lu_panel_v3 import lu_panel_v3_pallas

    key = jax.random.key(3)
    m = 4096
    print("== LU parts ==", flush=True)
    for (mm_, b) in ((4096, 256), (2048, 256)):
        p = jax.random.normal(key, (mm_, b), jnp.float32)
        t = timeit(lambda x: dep(p, lu_panel_v3_pallas(x)[0]), p)
        print(f"  leaf v3 ({mm_},{b}): {t*1e6:7.1f} us ({t/b*1e9:6.0f} ns/step)",
              flush=True)

    pan = jax.random.normal(key, (m, 512), jnp.float32)
    pb = jax.jit(lambda x: _panel_lu_blocked(x, 256)[0])
    t = timeit(lambda x: dep(pan, pb(x)), pan)
    print(f"  panel blocked (4096,512): {t*1e6:7.1f} us", flush=True)

    a = jax.random.normal(key, (m, m), jnp.float32)
    t = timeit(lambda x: dep(a, lu_in_place(x)[0]), a)
    print(f"  lu_in_place 4096: {t*1e3:7.3f} ms ({2*m**3/3/t/1e9:6.0f} GF/s)",
          flush=True)


if __name__ == "__main__":
    secs = sys.argv[1:] or ["llt", "qr", "lu"]
    for s in secs:
        globals()[f"section_{s}"]()
