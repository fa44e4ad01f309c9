import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import time
import jax.numpy as jnp
import numpy as np

from faer_tpu.linalg.evd import hessenberg_in_place
from faer_tpu.linalg.schur_multishift import multishift_real_schur
from faer_tpu.linalg.real_schur import schur_eigenvalues_pair

def check(n, dtype=jnp.float32, seed=0, ns=None, w=None):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((n, n)), dtype)
    t0 = time.time()
    h, q = hessenberg_in_place(a)
    kw = {}
    if ns: kw["ns"] = ns
    if w: kw["w"] = w
    t, qs, info = multishift_real_schur(h, q, **kw)
    t1 = time.time()
    an = np.asarray(a, np.float64); tn = np.asarray(t, np.float64); qn = np.asarray(qs, np.float64)
    resid = np.linalg.norm(qn @ tn @ qn.T - an) / max(1.0, np.linalg.norm(an))
    orth = np.linalg.norm(qn.T @ qn - np.eye(n)) / n
    quasi = np.all(np.abs(np.tril(tn, -2)) == 0)
    sd = np.abs(np.diag(tn, -1)) > 0
    blocks_ok = not np.any(sd[:-1] & sd[1:]) if n > 2 else True
    wr, wi = schur_eigenvalues_pair(t)
    wv = np.sort_complex(np.asarray(wr, np.float64) + 1j*np.asarray(wi, np.float64))
    wref = np.sort_complex(np.linalg.eigvals(an))
    werr = np.max(np.abs(wv - wref)) / max(1.0, np.max(np.abs(wref)))
    print(f"n={n} {np.dtype(np.asarray(a).dtype).name} conv={bool(info.converged)} "
          f"rounds={int(info.iterations)} resid={resid:.2e} orth={orth:.2e} "
          f"quasi={quasi} blocks={blocks_ok} werr={werr:.2e} wall={t1-t0:.1f}s")
    return resid, orth, werr, bool(info.converged)

if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    dt = jnp.float64 if (len(sys.argv) > 2 and sys.argv[2] == "f64") else jnp.float32
    check(n, dt)
