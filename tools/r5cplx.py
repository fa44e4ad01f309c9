"""Round-5: complex multishift EVD @ n=1024 and multishift QZ @ n=512 walls.

Round-3 ask #7's done criterion ("complex EVD at n=1024 on-chip in seconds")
was never measured; round-4 verdict ask #4 sets the same bar for the new
multishift QZ at n=512.  Both run over (re, im) pairs on the complex-free
TPU runtime; correctness is checked via the Schur/GEVD invariants on host.

Run: python tools/r5cplx.py [evd] [qz]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from faer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    which = sys.argv[1:] or ["evd", "qz"]

    if "evd" in which:
        from faer_tpu.linalg.evd_cpair import evd_cpair

        n = 1024
        rng = np.random.default_rng(0)
        a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        ar = jnp.asarray(a.real, jnp.float32)
        ai = jnp.asarray(a.imag, jnp.float32)
        t0 = time.perf_counter()
        (wr, wi), (vr, vi), info = evd_cpair(ar, ai)
        jax.block_until_ready((wr, wi, vr, vi))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        (wr, wi), (vr, vi), info = evd_cpair(ar * (1 + 1e-6), ai)
        jax.block_until_ready((wr, wi))
        t_warm = time.perf_counter() - t0
        w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
        v = np.asarray(vr, np.float64) + 1j * np.asarray(vi, np.float64)
        vn = np.linalg.norm(v, axis=0)
        vn[vn == 0] = 1
        resid = np.abs(a @ v - v * w[None, :]).max() / (np.abs(a).max() * vn.max())
        wref = np.sort_complex(np.linalg.eigvals(a))
        werr = np.abs(np.sort_complex(w) - wref).max() / np.abs(wref).max()
        print(f"complex EVD n={n}: compile+run {t_first:7.1f} s, warm "
              f"{t_warm:7.2f} s, eig-vs-ref {werr:.2e}, resid {resid:.2e}, "
              f"converged={bool(info.converged)}", flush=True)

    if "qz" in which:
        from faer_tpu.linalg.qz_cpair import qz_pair

        n = 512
        rng = np.random.default_rng(1)
        a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        b = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        args = [jnp.asarray(x, jnp.float32)
                for x in (a.real, a.imag, b.real, b.imag)]
        t0 = time.perf_counter()
        s_, t_, q, z, info = qz_pair(*args)
        jax.block_until_ready((s_, t_, q, z))
        t_first = time.perf_counter() - t0
        args[0] = args[0] * (1 + 1e-6)
        t0 = time.perf_counter()
        s_, t_, q, z, info = qz_pair(*args)
        jax.block_until_ready((s_, t_))
        t_warm = time.perf_counter() - t0
        S = np.asarray(s_[0], np.float64) + 1j * np.asarray(s_[1], np.float64)
        T = np.asarray(t_[0], np.float64) + 1j * np.asarray(t_[1], np.float64)
        Q = np.asarray(q[0], np.float64) + 1j * np.asarray(q[1], np.float64)
        Z = np.asarray(z[0], np.float64) + 1j * np.asarray(z[1], np.float64)
        an = a * (1 + 1e-6)
        recA = np.abs(Q @ S @ Z.conj().T - an).max() / np.abs(an).max()
        recB = np.abs(Q @ T @ Z.conj().T - b).max() / np.abs(b).max()
        orthQ = np.abs(Q.conj().T @ Q - np.eye(n)).max()
        print(f"complex QZ n={n}: compile+run {t_first:7.1f} s, warm "
              f"{t_warm:7.2f} s, recA {recA:.2e}, recB {recB:.2e}, "
              f"orthQ {orthQ:.2e}, converged={bool(info.converged)}",
              flush=True)


if __name__ == "__main__":
    main()
