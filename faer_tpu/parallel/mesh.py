"""Mesh layer: multi-chip sharded execution (SURVEY §5.8, §2.7).

The reference has no distributed code (rayon fork-join only, ``lib.rs:929``);
the TPU-native analogue of its parallelism model is:
* ``Par::Rayon`` → implicit on-chip parallelism (Pallas grids / XLA fusion);
* cross-chip   → ``jax.sharding.Mesh`` + sharding constraints, with XLA
  inserting ICI collectives (the scaling-book recipe), plus explicit
  ``shard_map`` kernels where the communication pattern must be pinned.

Single-chip kernels stay mesh-agnostic; this module composes them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faer_tpu.ops.matmul import matmul


def make_mesh(shape: dict[str, int] | None = None, *, devices=None) -> Mesh:
    """Create a named device mesh. Default: 1-D data axis over all devices."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = {"dp": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    arr = np.array(devices[: int(np.prod(dims))]).reshape(dims)
    return Mesh(arr, names)


def shard_batched(x, mesh: Mesh, axis: str = "dp"):
    """Shard the leading (batch) dimension across a mesh axis (DP analogue)."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_cols(x, mesh: Mesh, axis: str = "tp"):
    """Shard the last dimension (TP analogue for weight-like operands)."""
    spec = P(*([None] * (x.ndim - 1)), axis)
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_rows(x, mesh: Mesh, axis: str = "tp"):
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def sharded_matmul(a, b, mesh: Mesh, *, contract_axis: str = "tp"):
    """C = A @ B with A column-sharded / B row-sharded over ``contract_axis``.

    The contraction is expressed with ``shard_map`` + ``psum`` so the collective
    rides ICI explicitly (ring all-reduce), matching the scaling-book recipe
    for contracting over a sharded dimension.
    """
    from jax.experimental.shard_map import shard_map

    def local_mm(a_blk, b_blk):
        part = matmul(None, a_blk, b_blk)
        return jax.lax.psum(part, axis_name=contract_axis)

    fn = shard_map(
        local_mm, mesh=mesh,
        in_specs=(P(None, contract_axis), P(contract_axis, None)),
        out_specs=P(None, None),
    )
    return fn(a, b)


def batched_llt_solve(a_batch, b_batch):
    """vmap-batched LLT factor+solve — shard the batch axis over 'dp' for the
    distributed many-problems regime (§2.7: vmap batching is a first-class
    parallel dimension for a linalg library)."""
    from faer_tpu.linalg.cholesky import llt_factor, llt_solve

    def one(a, b):
        l, _ = llt_factor(a)
        return llt_solve(l, b)

    return jax.vmap(one)(a_batch, b_batch)


def block_cyclic_spec(mesh: Mesh, row_axis: str = "dp", col_axis: str = "tp"):
    """PartitionSpec for a 2-D block layout of a matrix over the mesh."""
    return P(row_axis, col_axis)


@functools.partial(jax.jit, static_argnames=("mesh_axes",))
def _solver_step_impl(a_batch, b_batch, w_cols, x_rows, mesh_axes):
    # dp part: batched factor+solve; tp part: sharded contraction feeding it
    y = batched_llt_solve(a_batch, b_batch)
    z = matmul(None, x_rows, w_cols)  # XLA inserts the tp collectives
    corr = jnp.mean(z) * 0 + jnp.mean(jnp.abs(y))
    return y, z, corr


def solver_step(a_batch, b_batch, w_cols, x_rows, mesh: Mesh):
    """The flagship composite step used by the multichip dry-run: a
    dp-sharded batch of SPD factor+solves plus a tp-sharded GEMM, jitted as
    one program over the mesh (XLA chooses ICI collectives from shardings).
    """
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        return _solver_step_impl(a_batch, b_batch, w_cols, x_rows,
                                 mesh_axes=tuple(mesh.axis_names))
