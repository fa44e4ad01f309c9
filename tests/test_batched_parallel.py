"""Batched (vmap) decompositions + mesh-layer tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu import stats
from faer_tpu.linalg import batched
from faer_tpu.utils.approx import assert_approx_eq, size_scale


def _batch_spd(key, bsz, n, dtype=jnp.float64):
    g = stats.standard_normal_mat(key, bsz * n, n, dtype).reshape(bsz, n, n)
    return g @ g.mT / n + jnp.eye(n, dtype=dtype)


def test_batched_llt():
    a = _batch_spd(jax.random.key(80), 6, 24)
    b = stats.standard_normal_mat(jax.random.key(81), 6 * 24, 2, jnp.float64).reshape(6, 24, 2)
    x, info = batched.llt_solve_batched(a, b)
    assert_approx_eq(np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(x)), b,
                     scale=size_scale(24) * 32)
    assert bool(jnp.all(info.success))


def test_batched_lu_and_qr():
    bsz, n = 4, 20
    a = stats.standard_normal_mat(jax.random.key(82), bsz * n, n, jnp.float64).reshape(bsz, n, n)
    lu, perm, info = batched.lu_factor(a)
    assert lu.shape == (bsz, n, n) and perm.shape == (bsz, n)
    b = stats.standard_normal_mat(jax.random.key(83), bsz * n, 1, jnp.float64).reshape(bsz, n, 1)
    x = batched.lu_solve(lu, perm, b)
    assert_approx_eq(np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(x)), b,
                     scale=size_scale(n) * 64)

    xq = batched.qr_solve_lstsq_batched(a, b)
    assert_approx_eq(np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(xq)), b,
                     scale=size_scale(n) * 64)


@pytest.mark.slow
def test_batched_svd_evd():
    bsz, m, n = 3, 16, 10
    a = stats.standard_normal_mat(jax.random.key(84), bsz * m, n, jnp.float64).reshape(bsz, m, n)
    u, s, v, info = batched.svd(a)
    rec = np.einsum("bik,bk,bjk->bij", np.asarray(u), np.asarray(s), np.asarray(v))
    assert_approx_eq(rec, a, scale=size_scale(m) * 32)

    h = _batch_spd(jax.random.key(85), 3, 12)
    w, z, info = batched.self_adjoint_evd(h)
    rec = np.einsum("bik,bk,bjk->bij", np.asarray(z), np.asarray(w), np.asarray(z))
    assert_approx_eq(rec, h, scale=size_scale(12) * 32)


def test_mesh_sharded_matmul_and_solve():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from faer_tpu.parallel import mesh as pmesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("dp", "tp"))

    d = 64
    x = stats.standard_normal_mat(jax.random.key(86), d, d, jnp.float32)
    w = stats.standard_normal_mat(jax.random.key(87), d, d, jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("tp", None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    # note the shard_map contraction: x column-sharded × w row-sharded over tp
    xs2 = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
    ws2 = jax.device_put(w, NamedSharding(mesh, P("tp", None)))
    z = pmesh.sharded_matmul(xs2, ws2, mesh)
    assert_approx_eq(z, np.asarray(x) @ np.asarray(w), scale=size_scale(d) * 8,
                     tol_dtype=jnp.float32)

    a = _batch_spd(jax.random.key(88), 8, 16, jnp.float32)
    b = stats.standard_normal_mat(jax.random.key(89), 8 * 16, 2, jnp.float32).reshape(8, 16, 2)
    ab = pmesh.shard_batched(a, mesh, "dp")
    bb = pmesh.shard_batched(b, mesh, "dp")
    y = pmesh.batched_llt_solve(ab, bb)
    assert_approx_eq(np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(y)), b,
                     scale=size_scale(16) * 64, tol_dtype=jnp.float32)


@pytest.mark.slow
def test_block_cyclic_distributed_llt():
    from jax.sharding import Mesh

    from faer_tpu.parallel.distributed import block_cyclic_llt, block_cyclic_llt_solve

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("p",))
    n = 128
    a = stats.spd_mat(jax.random.key(100), n, jnp.float64)
    l = block_cyclic_llt(a, mesh, block=16)
    ln = np.asarray(l)
    assert_approx_eq(ln @ ln.T, np.asarray(a), scale=size_scale(n) * 16)
    b = stats.standard_normal_mat(jax.random.key(101), n, 2, jnp.float64)
    x = block_cyclic_llt_solve(l, b)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 64)


@pytest.mark.slow
def test_block_cyclic_distributed_lu():
    from jax.sharding import Mesh

    from faer_tpu.parallel.distributed import block_cyclic_lu, block_cyclic_lu_solve

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("p",))
    n = 64
    a = stats.standard_normal_mat(jax.random.key(5), n, n, jnp.float64)
    lu, perm, ok = block_cyclic_lu(a, mesh, block=16)
    assert bool(ok)
    pn = np.asarray(lu)
    l = np.tril(pn, -1) + np.eye(n)
    u = np.triu(pn)
    an = np.asarray(a)[np.asarray(perm)]
    assert_approx_eq(l @ u, an, scale=size_scale(n) * 16)
    # tournament (CALU) pivoting: multipliers bounded by 2^levels, not 1
    assert np.abs(np.tril(pn, -1)).max() <= 8.0
    b = stats.standard_normal_mat(jax.random.key(6), n, 3, jnp.float64)
    x = block_cyclic_lu_solve(lu, perm, b, mesh, block=16)
    assert_approx_eq(np.asarray(a) @ np.asarray(x), b, scale=size_scale(n) * 64)


def test_block_cyclic_distributed_qr():
    from jax.sharding import Mesh

    from faer_tpu.parallel.distributed import block_cyclic_qr, block_cyclic_qr_lstsq

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("p",))
    m, n = 96, 64
    a = stats.standard_normal_mat(jax.random.key(7), m, n, jnp.float64)
    packed, t_stack = block_cyclic_qr(a, mesh, block=16)
    # R upper-triangular; reconstruct via the single-chip helpers (contract
    # compatibility with linalg.qr's packed format)
    from faer_tpu.linalg.qr import qr_reconstruct

    rec = qr_reconstruct(packed, t_stack, 16)
    assert_approx_eq(np.asarray(rec), np.asarray(a), scale=size_scale(m) * 16)
    b = stats.standard_normal_mat(jax.random.key(8), m, 2, jnp.float64)
    x = block_cyclic_qr_lstsq(packed, t_stack, b, mesh, block=16)
    xr = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)[0]
    assert_approx_eq(np.asarray(x), xr, scale=size_scale(m) * 256)


def test_block_cyclic_llt_2d():
    """2-D block-cyclic LLT (pdpotrf structure) on a 2x4 CPU mesh."""
    import numpy as np
    from jax.sharding import Mesh

    from faer_tpu.parallel.distributed import block_cyclic_llt_2d

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("pr", "pc"))
    n = 128
    g = jax.random.normal(jax.random.key(9), (n, n), jnp.float32)
    a = g @ g.T / n + jnp.eye(n, dtype=jnp.float32)
    l = block_cyclic_llt_2d(a, mesh, block=16)
    ln = np.asarray(l, np.float64)
    rec = np.abs(ln @ ln.T - np.asarray(a, np.float64)).max()
    assert rec < 1e-4, rec


def test_block_cyclic_lu_2d():
    """2-D block-cyclic tournament LU (pdgetrf structure) on a 2x4 CPU mesh."""
    import numpy as np
    from jax.sharding import Mesh

    from faer_tpu.parallel.distributed import block_cyclic_lu_2d

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("pr", "pc"))
    n = 128
    a = jax.random.normal(jax.random.key(10), (n, n), jnp.float32)
    lu, perm, ok = block_cyclic_lu_2d(a, mesh, block=16)
    assert bool(ok)
    lun = np.asarray(lu, np.float64)
    an = np.asarray(a, np.float64)
    l = np.tril(lun, -1) + np.eye(n)
    rec = np.abs(l @ np.triu(lun) - an[np.asarray(perm)]).max()
    assert rec < 1e-4, rec


def test_block_cyclic_qr_2d():
    """2-D block-cyclic QR (pdgeqrf structure) on a 2x4 CPU mesh."""
    import numpy as np
    from jax.sharding import Mesh

    from faer_tpu.linalg.qr import qr_reconstruct
    from faer_tpu.parallel.distributed import (
        block_cyclic_qr_2d,
        block_cyclic_qr_lstsq,
    )

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("pr", "pc"))
    m, n = 96, 64
    a = stats.standard_normal_mat(jax.random.key(11), m, n, jnp.float64)
    packed, t_stack = block_cyclic_qr_2d(a, mesh, block=16)
    rec = qr_reconstruct(packed, t_stack, 16)
    assert_approx_eq(np.asarray(rec), np.asarray(a), scale=size_scale(m) * 16)
    # packed/T contract matches the 1-D layout's lstsq consumer
    mesh1 = Mesh(np.array(jax.devices()[:4]), ("p",))
    b = stats.standard_normal_mat(jax.random.key(12), m, 2, jnp.float64)
    packed1 = jnp.asarray(np.asarray(packed))
    t1 = jnp.asarray(np.asarray(t_stack))
    x = block_cyclic_qr_lstsq(packed1, t1, b, mesh1, block=16)
    xr = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)[0]
    assert_approx_eq(np.asarray(x), xr, scale=size_scale(m) * 256)
