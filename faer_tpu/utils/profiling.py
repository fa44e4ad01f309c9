"""Profiling / tracing hooks (SURVEY §5.1).

The reference's only instrumentation is the once-only ``perf-warn`` layout
warning (``faer/src/lib.rs:256``), mirrored by ``faer_tpu.core.config.perf_warn``.
The TPU build adds the natural equivalents: a jax-profiler trace context and a
simple op timer that is safe under this environment's async tunnel (forces a
host read so the measured interval covers real execution).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace of the enclosed block (view with tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, reps: int = 9, **kwargs):
    """Median wall time of ``fn(*args)`` with forced host synchronization.

    On this environment's TPU tunnel ``block_until_ready`` returns before
    execution finishes, so the result is reduced to a scalar and fetched.
    """
    def scalarize(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) if x.dtype != jnp.bool_
                   else jnp.sum(x) for x in leaves)

    f = jax.jit(lambda *a: scalarize(fn(*a, **kwargs)))
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]
