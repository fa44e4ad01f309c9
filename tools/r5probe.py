"""Mosaic capability probes for the round-5 packed-sublane panel kernels.

The v6 panel design packs the panel's m-axis as (8 sublanes, m/8 lanes) so
per-step row ops use full vregs (v4's (1, m) rows idle 7 of 8 sublanes).
Feasibility hinges on what Mosaic lowers:
  P1  dot_general contracting TWO dims ((1,2),(1,2)) on 3-D operands
  P2  dot_general with a batch dim (8 batched 2-D dots)
  P3  per-sublane lane argmax / max+iota-min trick on (8, mq)
  P4  free C-order reshape (b, m) <-> (b*8, m/8) at the XLA boundary
  P5  reduce over the middle axis of a (4, 2, mq) view (sublane pairs)
Each probe prints OK/FAIL + timing; failures pick the fallback design.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, check=None):
    try:
        out = jax.jit(fn)(*args)
        out = jax.tree.leaves(out)[0]
        np.asarray(out)
        ok = True if check is None else check(out)
        print(f"{name}: {'OK' if ok else 'WRONG-RESULT'}", flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return False


def main():
    cw, sb, mq = 128, 16, 512
    key = jax.random.key(0)
    a3 = jax.random.normal(key, (cw, 8, mq), jnp.float32)
    b3 = jax.random.normal(jax.random.key(1), (sb, 8, mq), jnp.float32)
    ref = np.einsum("csq,jsq->cj", np.asarray(a3), np.asarray(b3))

    # P1: two contracting dims
    def p1_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1, 2), (1, 2)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def p1(a, b):
        return pl.pallas_call(
            p1_kernel,
            out_shape=jax.ShapeDtypeStruct((cw, sb), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    run("P1 dot 2-contract", p1, a3, b3,
        check=lambda o: np.abs(np.asarray(o) - ref).max() < 1e-2)

    # P2: batch dim on axis 1
    def p2_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (2,)), ((1,), (1,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def p2(a, b):
        return pl.pallas_call(
            p2_kernel,
            out_shape=jax.ShapeDtypeStruct((8, cw, sb), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    run("P2 dot batched", p2, a3, b3,
        check=lambda o: np.abs(np.asarray(o).sum(0) - ref).max() < 1e-2)

    # P3: per-sublane argmax via max + iota-min (the packed pivot search)
    g = jax.random.normal(jax.random.key(2), (8, mq), jnp.float32)

    def p3_kernel(g_ref, o_ref, oh_ref):
        mag = jnp.abs(g_ref[:])
        gmax = jnp.max(mag)                               # global
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, mq), 1)
        subs = jax.lax.broadcasted_iota(jnp.int32, (8, mq), 0)
        gidx = subs * mq + lanes
        big = jnp.int32(8 * mq)
        cand = jnp.where(mag == gmax, gidx, big)
        p = jnp.min(cand)
        oh = (gidx == p).astype(jnp.float32)
        o_ref[0, 0] = p
        oh_ref[:] = oh

    def p3(gm):
        return pl.pallas_call(
            p3_kernel,
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.int32),
                       jax.ShapeDtypeStruct((8, mq), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(gm)

    gn = np.abs(np.asarray(g))
    run("P3 global argmax packed", p3, g,
        check=lambda o: int(np.asarray(o)) == int(gn.argmax()))

    # P4: packed reshape at the XLA boundary is cheap/correct
    def p4(x):
        return jnp.reshape(jnp.transpose(x), (mq, 8, 64)).sum(axis=1)

    run("P4 boundary reshape", p4,
        jax.random.normal(jax.random.key(3), (512, mq), jnp.float32))

    # P5: reduce over middle axis of (4, 2, mq) view
    def p5_kernel(g_ref, o_ref):
        v = g_ref[:].reshape(4, 2, mq)
        o_ref[:] = jnp.max(v, axis=1)

    def p5(gm):
        return pl.pallas_call(
            p5_kernel,
            out_shape=jax.ShapeDtypeStruct((4, mq), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(gm)

    run("P5 mid-axis reduce", p5, g,
        check=lambda o: np.abs(np.asarray(o) -
                               np.asarray(g).reshape(4, 2, mq).max(1)).max()
        == 0.0)

    # P6: per-sublane lane-argmax one-hot (independent groups)
    def p6_kernel(g_ref, oh_ref):
        mag = jnp.abs(g_ref[:])
        m1 = jnp.max(mag, axis=1, keepdims=True)          # (8, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, mq), 1)
        cand = jnp.where(mag == m1, lanes, jnp.int32(mq))
        q = jnp.min(cand, axis=1, keepdims=True)          # (8, 1)
        oh_ref[:] = (lanes == q).astype(jnp.float32)

    def p6(gm):
        return pl.pallas_call(
            p6_kernel,
            out_shape=jax.ShapeDtypeStruct((8, mq), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(gm)

    def chk6(o):
        on = np.asarray(o)
        return (on.argmax(1) == gn.argmax(1)).all() and (on.sum(1) == 1).all()

    run("P6 per-sublane argmax", p6, g, check=chk6)

    # P7: dynamic single-sublane slice read (natural-layout row extract)
    nat = jax.random.normal(jax.random.key(4), (4096, 256), jnp.float32)

    def p7_kernel(a_ref, i_ref, o_ref):
        i = i_ref[0]
        o_ref[:] = a_ref[pl.ds(i, 1), :]

    def p7(a, i):
        return pl.pallas_call(
            p7_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, i)

    run("P7 dynamic sublane slice", p7, nat, jnp.asarray([1337], jnp.int32),
        check=lambda o: np.allclose(np.asarray(o)[0], np.asarray(nat)[1337]))


if __name__ == "__main__":
    main()
