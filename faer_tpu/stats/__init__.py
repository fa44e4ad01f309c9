"""Stats / RNG module.

Reference parity: ``faer/src/stats`` — matrix distributions
(``CwiseMatDistribution`` ``stats/mod.rs:47``, ``UnitaryMat`` Haar ``:63``,
``ComplexDistribution`` ``:18``) and column/row mean/var with NaN handling
(``stats/meanvar.rs:687-727``). Built on ``jax.random`` (threadable PRNG keys
replace faer's ``StdRng`` seeds).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from faer_tpu.core import dtypes
from faer_tpu.core.flags import NanHandling


def standard_normal_mat(key, nrows: int, ncols: int, dtype=jnp.float32):
    """N(0,1) iid matrix; complex dtypes get CN(0,1) (unit-variance complex)."""
    if dtypes.is_complex(dtype):
        rdt = dtypes.real_dtype_of(dtype)
        kr, ki = jax.random.split(key)
        scale = jnp.sqrt(jnp.asarray(0.5, rdt))
        return (jax.random.normal(kr, (nrows, ncols), rdt) * scale
                + 1j * jax.random.normal(ki, (nrows, ncols), rdt) * scale).astype(dtype)
    return jax.random.normal(key, (nrows, ncols), dtype)


def uniform_mat(key, nrows: int, ncols: int, dtype=jnp.float32, minval=0.0, maxval=1.0):
    if dtypes.is_complex(dtype):
        rdt = dtypes.real_dtype_of(dtype)
        kr, ki = jax.random.split(key)
        return (jax.random.uniform(kr, (nrows, ncols), rdt, minval, maxval)
                + 1j * jax.random.uniform(ki, (nrows, ncols), rdt, minval, maxval)).astype(dtype)
    return jax.random.uniform(key, (nrows, ncols), dtype, minval, maxval)


def unitary_mat(key, n: int, dtype=jnp.float32):
    """Haar-distributed orthogonal/unitary matrix (faer ``UnitaryMat``).

    QR of a Gaussian matrix with the phase fix of Mezzadri (2006): Q·sign(diag R).
    """
    g = standard_normal_mat(key, n, n, dtype)
    q, r = jnp.linalg.qr(g)
    d = jnp.diagonal(r)
    ph = d / jnp.abs(d)
    return q * jnp.conj(ph)[None, :]


def spd_mat(key, n: int, dtype=jnp.float32, *, cond: float | None = None):
    """Random symmetric/hermitian positive-definite matrix (test helper)."""
    if cond is None:
        g = standard_normal_mat(key, n, n, dtype)
        a = g @ jnp.conj(g).T / n + jnp.eye(n, dtype=dtype)
        return 0.5 * (a + jnp.conj(a).T)
    q = unitary_mat(key, n, dtype)
    rdt = dtypes.real_dtype_of(dtype)
    lam = jnp.logspace(0.0, -jnp.log10(jnp.asarray(cond, rdt)), n, dtype=rdt)
    return (q * lam[None, :].astype(dtype)) @ jnp.conj(q).T


def self_adjoint_mat(key, n: int, dtype=jnp.float32):
    g = standard_normal_mat(key, n, n, dtype)
    return 0.5 * (g + jnp.conj(g).T)


# ---------------------------------------------------------------------------
# mean / var (faer stats/meanvar.rs)
# ---------------------------------------------------------------------------

def _nan_mean(x, axis, nan: NanHandling):
    if nan is NanHandling.IGNORE:
        return jnp.nanmean(x, axis=axis)
    return jnp.mean(x, axis=axis)


def col_mean(a, *, nan: NanHandling = NanHandling.PROPAGATE):
    """Mean over rows → one value per column-position? faer's col_mean returns
    a column holding the mean of each *row* across columns (``meanvar.rs:687``):
    the output has nrows entries. We follow faer: reduce across columns."""
    return _nan_mean(a, 1, nan)


def row_mean(a, *, nan: NanHandling = NanHandling.PROPAGATE):
    return _nan_mean(a, 0, nan)


def _nan_var(x, mean, axis, nan: NanHandling):
    if nan is NanHandling.IGNORE:
        d = jnp.abs(x - jnp.expand_dims(mean, axis)) ** 2
        cnt = jnp.sum(~jnp.isnan(x), axis=axis)
        return jnp.nansum(d, axis=axis) / jnp.maximum(cnt - 1, 1)
    d = jnp.abs(x - jnp.expand_dims(mean, axis)) ** 2
    n = x.shape[axis]
    return jnp.sum(d, axis=axis) / max(n - 1, 1)


def col_varm(a, mean=None, *, nan: NanHandling = NanHandling.PROPAGATE):
    """Sample variance of each row across columns, given (or computing) means."""
    m = col_mean(a, nan=nan) if mean is None else mean
    return _nan_var(a, m, 1, nan)


def row_varm(a, mean=None, *, nan: NanHandling = NanHandling.PROPAGATE):
    m = row_mean(a, nan=nan) if mean is None else mean
    return _nan_var(a, m, 0, nan)
