"""Round-5: distributed scaling datapoints beyond the 256² dryrun.

VERDICT r4 weak #7: distributed evidence frozen at 256²/8 CPU devices.
Runs the 2-D block-cyclic LLT/LU/QR at 256² (block 32) and 1024² (block 64)
on an 8-virtual-CPU-device mesh and records compile + run walls, so there is
a two-point scaling note in BENCH_NOTES.  (The CPU mesh measures the SPMD
program structure, not chip performance — walls are dominated by the
single-core host executing 8 device programs serially.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def main():
    from faer_tpu.core.config import platform_scope
    from faer_tpu.linalg.qr import qr_reconstruct
    from faer_tpu.parallel.distributed import (
        block_cyclic_llt_2d,
        block_cyclic_lu_2d,
        block_cyclic_qr_2d,
    )

    devices = jax.devices("cpu")[:8]
    mesh2d = Mesh(np.array(devices).reshape(2, 4), ("pr", "pc"))
    with platform_scope("cpu"), jax.default_device(devices[0]):
        for nd, block in ((256, 32), (1024, 64)):
            gd = jax.random.normal(jax.random.key(5), (nd, nd), jnp.float32)
            a = gd @ gd.T / nd + jnp.eye(nd, dtype=jnp.float32)
            for name, run, check in (
                ("llt2d", lambda: block_cyclic_llt_2d(a, mesh2d, block=block),
                 "llt"),
                ("lu2d", lambda: block_cyclic_lu_2d(gd, mesh2d, block=block),
                 "lu"),
                ("qr2d", lambda: block_cyclic_qr_2d(gd, mesh2d, block=block),
                 "qr"),
            ):
                t0 = time.perf_counter()
                out = run()
                jax.block_until_ready(out)
                t_first = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = run()
                jax.block_until_ready(out)
                t_warm = time.perf_counter() - t0
                if check == "llt":
                    ln = np.asarray(jax.device_get(out), np.float64)
                    err = np.abs(ln @ ln.T - np.asarray(a)).max()
                elif check == "lu":
                    lun = np.asarray(jax.device_get(out[0]), np.float64)
                    pn = np.asarray(jax.device_get(out[1]))
                    l = np.tril(lun, -1) + np.eye(nd)
                    err = np.abs(l @ np.triu(lun)
                                 - np.asarray(gd, np.float64)[pn]).max()
                else:
                    ph = jnp.asarray(np.asarray(jax.device_get(out[0])))
                    th = jnp.asarray(np.asarray(jax.device_get(out[1])))
                    err = np.abs(np.asarray(jax.device_get(
                        qr_reconstruct(ph, th, block)), np.float64)
                        - np.asarray(gd, np.float64)).max()
                print(f"{name} {nd}^2 block={block}: compile+run "
                      f"{t_first:7.1f} s, warm {t_warm:7.2f} s, "
                      f"rec err {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
