"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by bench.py and the verify drives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faer_tpu.utils.approx import assert_approx_eq, size_scale


@pytest.mark.parametrize("shape", [(256, 128, 256), (300, 200, 260)])
def test_pallas_matmul_interpret(shape, monkeypatch):
    from jax.experimental import pallas as pl

    # route pallas_call through the interpreter on CPU
    import faer_tpu.ops.pallas.matmul_kernel as mk

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(mk.pl, "pallas_call", interp_call)
    mk._mm_padded.clear_cache()

    m, k, n = shape
    key = jax.random.key(0)
    a = jax.random.normal(key, (m, k), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (k, n), jnp.float32)
    got = mk.pallas_matmul(a, b, bm=128, bn=128, bk=128)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    assert_approx_eq(got, want, scale=size_scale(k) * 8, tol_dtype=jnp.float32)
    mk._mm_padded.clear_cache()
