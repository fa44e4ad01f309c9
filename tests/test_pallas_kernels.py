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


def _interp(monkeypatch, module):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(module.pl, "pallas_call", interp_call)


def test_tridiag_sweep_kernel_interpret(monkeypatch):
    import faer_tpu.ops.pallas.panel_kernels as pk

    _interp(monkeypatch, pk)
    pk.tridiag_sweep_pallas.clear_cache()
    rng = np.random.default_rng(3)
    n = 32
    d0 = rng.standard_normal(n).astype(np.float32)
    e0 = rng.standard_normal(n - 1).astype(np.float32)
    l, m = 2, 20
    # numpy reference recurrence
    d, e = d0.copy(), e0.copy()
    delta = (d[m - 1] - d[m]) / 2
    sq = np.sqrt(delta * delta + e[m - 1] ** 2)
    mu = d[m] - e[m - 1] ** 2 / (delta + np.sign(delta or 1) * sq)
    x, bz = np.float32(d[l] - mu), e[l]
    for i in range(l, m):
        r = np.float32(np.hypot(x, bz))
        c, s = (np.float32(1), np.float32(0)) if r == 0 else (x / r, bz / r)
        if i > l:
            e[i - 1] = r
        di, dip1, ei = d[i], d[i + 1], e[i]
        d[i] = c * c * di + 2 * c * s * ei + s * s * dip1
        d[i + 1] = s * s * di - 2 * c * s * ei + c * c * dip1
        e[i] = c * s * (dip1 - di) + (c * c - s * s) * ei
        b = np.float32(0)
        if i + 1 < m:
            b = s * e[i + 1]
            e[i + 1] = c * e[i + 1]
        x, bz = e[i], b
    d2, e2, c_arr, s_arr = pk.tridiag_sweep_pallas(
        jnp.asarray(d0), jnp.asarray(e0), jnp.asarray(l, jnp.int32),
        jnp.asarray(m, jnp.int32), jnp.asarray(mu, jnp.float32))
    np.testing.assert_allclose(np.asarray(d2), d, atol=2e-5)
    np.testing.assert_allclose(np.asarray(e2), e, atol=2e-5)
    pk.tridiag_sweep_pallas.clear_cache()


def test_bidiag_sweep_kernel_interpret(monkeypatch):
    import faer_tpu.ops.pallas.panel_kernels as pk

    _interp(monkeypatch, pk)
    pk.bidiag_sweep_pallas.clear_cache()
    rng = np.random.default_rng(4)
    n = 24
    d0 = (rng.standard_normal(n) + 2).astype(np.float32)
    e0 = rng.standard_normal(n - 1).astype(np.float32)
    l, m = 1, 18
    d, e = d0.copy(), e0.copy()
    em2 = e[m - 2] if m >= 2 else np.float32(0)
    t11 = d[m - 1] ** 2 + em2 ** 2
    t22 = d[m] ** 2 + e[m - 1] ** 2
    t12 = d[m - 1] * e[m - 1]
    delta = (t11 - t22) / 2
    sq = np.sqrt(delta * delta + t12 ** 2)
    mu = t22 - t12 ** 2 / (delta + np.sign(delta or 1) * sq)
    x, bz = np.float32(d[l] ** 2 - mu), np.float32(d[l] * e[l])
    for i in range(l, m):
        r1 = np.float32(np.hypot(x, bz))
        c1, s1 = (np.float32(1), np.float32(0)) if r1 == 0 else (x / r1, bz / r1)
        if i > l:
            e[i - 1] = r1
        di, dip1, ei = d[i], d[i + 1], e[i]
        ndi = c1 * di + s1 * ei
        nei = -s1 * di + c1 * ei
        bulge = s1 * dip1
        ndip1 = c1 * dip1
        r2 = np.float32(np.hypot(ndi, bulge))
        c2, s2 = (np.float32(1), np.float32(0)) if r2 == 0 else (ndi / r2, bulge / r2)
        d[i] = r2
        e[i] = c2 * nei + s2 * ndip1
        d[i + 1] = -s2 * nei + c2 * ndip1
        b = np.float32(0)
        if i + 1 < m:
            b = s2 * e[i + 1]
            e[i + 1] = c2 * e[i + 1]
        x, bz = e[i], b
    d2, e2, *_ = pk.bidiag_sweep_pallas(
        jnp.asarray(d0), jnp.asarray(e0), jnp.asarray(l, jnp.int32),
        jnp.asarray(m, jnp.int32), jnp.asarray(mu, jnp.float32))
    np.testing.assert_allclose(np.asarray(d2), d, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e2), e, atol=2e-4)
    pk.bidiag_sweep_pallas.clear_cache()


def test_apply_rotation_chain_matches_sequential():
    from faer_tpu.linalg.tridiag_evd import _apply_rotation_chain

    rng = np.random.default_rng(5)
    n = 50
    z = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    theta = rng.uniform(-1, 1, n - 1).astype(np.float32)
    c = jnp.asarray(np.cos(theta))
    s = jnp.asarray(np.sin(theta))
    got = np.asarray(_apply_rotation_chain(z, c, s, chunk=8))
    ref = np.asarray(z).copy()
    for i in range(n - 1):
        zi, zi1 = ref[:, i].copy(), ref[:, i + 1].copy()
        ref[:, i] = float(c[i]) * zi + float(s[i]) * zi1
        ref[:, i + 1] = -float(s[i]) * zi + float(c[i]) * zi1
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_lu_panel_v2_interpret(monkeypatch):
    # covers the transposed virtual-pivot kernel incl. the VMEM-chunked
    # deferred rank-8 update (row-group loop)
    import faer_tpu.ops.pallas.lu_panel_v2 as lpv2

    _interp(monkeypatch, lpv2)
    lpv2.lu_panel_v2_pallas._clear_cache()
    m, b = 96, 24
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((m, b)), jnp.float32)
    packed, perm, nt, ok = lpv2.lu_panel_v2_pallas(p)
    assert bool(ok)
    pn = np.asarray(packed, np.float64)
    l = np.tril(pn, -1)[:, :b] + np.eye(m, b)
    u = np.triu(pn)[:b]
    ref = np.asarray(p, np.float64)[np.asarray(perm)]
    assert np.linalg.norm(l @ u - ref) <= 1e-4 * max(1.0, np.linalg.norm(ref))
    # partial pivoting: multipliers bounded by 1
    assert np.abs(np.tril(pn, -1)).max() <= 1.0 + 1e-6
    lpv2.lu_panel_v2_pallas._clear_cache()


@pytest.mark.parametrize("m,k", [(256, 128), (300, 200), (512, 512)])
def test_syrk_lower_sub_interpret(m, k, monkeypatch):
    # lower tiles must equal C - A@A.T; strict upper is unspecified
    import faer_tpu.ops.pallas.syrk_kernel as sk

    _interp(monkeypatch, sk)
    sk._syrk_padded.clear_cache()
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    got = np.asarray(sk.syrk_lower_sub(c, a, bm=128, bk=128))
    want = np.asarray(c, np.float64) - (
        np.asarray(a, np.float64) @ np.asarray(a, np.float64).T)
    assert_approx_eq(np.tril(got), np.tril(want),
                     scale=size_scale(k) * 8, tol_dtype=jnp.float32)
    sk._syrk_padded.clear_cache()


def test_lu_panel_v5_interpret(monkeypatch):
    # v5 = v4 virtual-pivot structure + bf16x3 coupling dots (+ optional
    # windowed extraction); both win variants share the kernel body
    import faer_tpu.ops.pallas.lu_panel_v5 as lpv5

    _interp(monkeypatch, lpv5)
    lpv5.lu_panel_v5_pallas._clear_cache()
    m, b = 160, 32
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((m, b)), jnp.float32)
    for win in (True, False):
        packed, perm, nt, ok = lpv5.lu_panel_v5_pallas(p, sb=16, win=win)
        assert bool(ok)
        pn = np.asarray(packed, np.float64)
        l = np.tril(pn, -1)[:, :b] + np.eye(m, b)
        u = np.triu(pn)[:b]
        ref = np.asarray(p, np.float64)[np.asarray(perm)]
        assert np.linalg.norm(l @ u - ref) <= 2e-3 * max(
            1.0, np.linalg.norm(ref)), win
        assert np.abs(np.tril(pn, -1)).max() <= 1.0 + 1e-6
    lpv5.lu_panel_v5_pallas._clear_cache()


def test_qr_panel_v5_interpret(monkeypatch):
    import faer_tpu.ops.pallas.qr_panel_v5 as qpv5

    _interp(monkeypatch, qpv5)
    qpv5.qr_panel_v5_pallas._clear_cache()
    m, b = 160, 32
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal((m, b)), jnp.float32)
    packed, taus = qpv5.qr_panel_v5_pallas(p, sb=16)
    pn = np.asarray(packed, np.float64)
    tn = np.asarray(taus, np.float64)
    v = np.tril(pn, -1)[:, :b] + np.eye(m, b)
    r = np.triu(pn[:b])
    q = np.eye(m)
    for j in range(b - 1, -1, -1):
        vj = v[:, j]
        q = q - tn[j] * np.outer(vj, vj @ q)
    resid = np.abs(q @ np.vstack([r, np.zeros((m - b, b))])
                   - np.asarray(p, np.float64)).max()
    assert resid < 2e-4
    # Q orthonormal
    assert np.abs(q.T @ q - np.eye(m)).max() < 1e-5
    qpv5.qr_panel_v5_pallas._clear_cache()


def test_llt_panel_v5_interpret(monkeypatch):
    import faer_tpu.ops.pallas.llt_panel_v5 as lltv5

    _interp(monkeypatch, lltv5)
    lltv5.llt_panel_v5_pallas._clear_cache()
    m, b = 160, 32
    rng = np.random.default_rng(3)
    g = rng.standard_normal((m, m))
    spd = (g @ g.T / m + 2 * np.eye(m)).astype(np.float32)
    slab = jnp.asarray(spd[:, :b])
    strip, cnt, ok = lltv5.llt_panel_v5_pallas(slab, sb=16)
    assert bool(ok)
    l11 = np.asarray(strip[:b], np.float64)
    l21 = np.asarray(strip[b:], np.float64)
    a11 = np.asarray(spd[:b, :b], np.float64)
    assert np.abs(l11 @ l11.T - a11).max() < 1e-4 * np.abs(a11).max()
    assert np.abs(l21 @ l11.T - spd[b:, :b]).max() < 1e-3 * np.abs(spd).max()
    lltv5.llt_panel_v5_pallas._clear_cache()
