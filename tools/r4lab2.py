"""Round-4 main perf lab: leaf-kernel sweeps + end-to-end factor variants.

Sections (each standalone, run what the tunnel allows):
  lltleaf — v1 vs v4(sb sweep; sb=b is "v5": direct row addressing, no
            deferral dots) at b in {128, 256}
  lltfac  — llt_factor variants: leaf in {v1, v4-best, v5}, kernel_leaf in
            {128, 256}, block in {256, 512}  (inline loop, library untouched)
  luleaf  — lu v4 sb/rch sweep at (4096, 128/256)
  qrleaf  — qr v4 sb/rch sweep at (4096, 128/256)
  lufac/qrfac — end-to-end with current wiring for reference
Usage: python tools/r4lab2.py [sections...]
"""
import functools
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


def section_lltleaf():
    from faer_tpu.ops.pallas.panel_kernels import llt_block_pallas
    from faer_tpu.ops.pallas.leaf_v4 import llt_block_v4_pallas

    key = jax.random.key(11)
    print("== llt leaf sweep ==", flush=True)
    for b in (128, 256):
        blk = _spd(key, b)
        t = timeit(lambda x: dep(blk, llt_block_pallas(x)[0]), blk)
        print(f"  b={b} v1: {t*1e6:7.1f} us", flush=True)
        for sb in (8, 32, 64, b):
            f = functools.partial(llt_block_v4_pallas, sb=sb, rch=256)
            t = timeit(lambda x: dep(blk, f(x)[0]), blk)
            tag = "v5(no-defer)" if sb == b else f"v4 sb={sb}"
            print(f"  b={b} {tag}: {t*1e6:7.1f} us", flush=True)


def _llt_factor_variant(a, *, block, leaf, leaf_fn):
    """Inline copy of cholesky.llt_factor's loop with a pluggable leaf."""
    from faer_tpu.ops.matmul import matmul
    from faer_tpu.ops.triangular import invert_lower_triangular

    n = a.shape[0]

    def panel(dblk):
        b = dblk.shape[0]
        if b <= leaf:
            return leaf_fn(dblk)
        h = b // 2
        d1 = panel(dblk[:h, :h])
        l1inv = invert_lower_triangular(d1, base=h)
        l21 = matmul(None, dblk[h:, :h], l1inv.T)
        a22 = dblk[h:, h:] - matmul(None, l21, l21.T)
        d2 = panel(a22)
        out = jnp.zeros_like(dblk)
        return out.at[:h, :h].set(d1).at[h:, :h].set(l21).at[h:, h:].set(d2)

    trail = a
    strips = []
    for k in range(0, n, block):
        bw = min(block, n - k)
        dblk = jnp.tril(trail[:bw, :bw])
        dblk = dblk + jnp.tril(dblk, -1).T
        d = panel(dblk)
        if k + bw < n:
            linv = invert_lower_triangular(d, base=bw)
            l21 = matmul(None, trail[bw:, :bw], linv.T)
            trail = trail[bw:, bw:] - matmul(None, l21, l21.T)
            strip = jnp.concatenate([jnp.tril(d), l21], axis=0)
        else:
            strip = jnp.tril(d)
        if k > 0:
            strip = jnp.concatenate([jnp.zeros((k, bw), a.dtype), strip], axis=0)
        strips.append(strip)
    return strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=1)


def section_lltfac():
    from faer_tpu.ops.pallas.panel_kernels import llt_block_pallas
    from faer_tpu.ops.pallas.leaf_v4 import llt_block_v4_pallas

    key = jax.random.key(12)
    n = 4096
    spd = _spd(key, n)
    leafs = {
        "v1": lambda blk: llt_block_pallas(blk)[0],
        "v5": lambda blk: llt_block_v4_pallas(blk, sb=blk.shape[0])[0],
    }
    print("== llt_factor variants (4096) ==", flush=True)
    for lname, lfn in leafs.items():
        for leaf in (128, 256):
            for block in (256, 512):
                f = jax.jit(functools.partial(
                    _llt_factor_variant, block=block, leaf=leaf, leaf_fn=lfn))
                t = timeit(lambda x: dep(spd, f(x)), spd)
                print(f"  leaf={lname}@{leaf} block={block}: {t*1e3:7.3f} ms "
                      f"({n**3/3/t/1e9:6.0f} GF/s)", flush=True)


def section_luleaf():
    from faer_tpu.ops.pallas.leaf_v4 import lu_panel_v4_pallas

    key = jax.random.key(13)
    print("== lu leaf sweep (v4) ==", flush=True)
    for (m, b) in ((4096, 128), (4096, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        for sb in (8, 16, 32):
            for rch in (128, 256, 512):
                f = functools.partial(lu_panel_v4_pallas, sb=sb, rch=rch)
                t = timeit(lambda x: dep(p, f(x)[0]), p)
                print(f"  ({m},{b}) sb={sb} rch={rch}: {t*1e6:7.1f} us",
                      flush=True)


def section_qrleaf():
    from faer_tpu.ops.pallas.leaf_v4 import qr_panel_v4_pallas

    key = jax.random.key(14)
    print("== qr leaf sweep (v4) ==", flush=True)
    for (m, b) in ((4096, 128), (4096, 256)):
        p = jax.random.normal(key, (m, b), jnp.float32)
        for sb in (8, 16, 32):
            for rch in (128, 256, 512):
                f = functools.partial(qr_panel_v4_pallas, sb=sb, rch=rch)
                t = timeit(lambda x: dep(p, f(x)[0]), p)
                print(f"  ({m},{b}) sb={sb} rch={rch}: {t*1e6:7.1f} us",
                      flush=True)


def section_lufac():
    from faer_tpu.linalg.lu import lu_in_place

    key = jax.random.key(15)
    n = 4096
    a = jax.random.normal(key, (n, n), jnp.float32)
    t = timeit(lambda x: dep(a, lu_in_place(x)[0]), a)
    print(f"  lu_in_place 4096: {t*1e3:7.3f} ms ({2*n**3/3/t/1e9:6.0f} GF/s)",
          flush=True)


def section_qrfac():
    from faer_tpu.linalg.qr import qr_in_place

    key = jax.random.key(16)
    n = 4096
    a = jax.random.normal(key, (n, n), jnp.float32)
    t = timeit(lambda x: dep(a, qr_in_place(x)[0]), a)
    print(f"  qr_in_place 4096: {t*1e3:7.3f} ms ({4*n**3/3/t/1e9:6.0f} GF/s)",
          flush=True)


if __name__ == "__main__":
    secs = sys.argv[1:] or ["lltleaf", "lltfac", "luleaf", "qrleaf"]
    for s in secs:
        globals()[f"section_{s}"]()
