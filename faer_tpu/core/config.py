"""Global configuration (reference parity: SURVEY §5.6 mechanism 2/3).

faer has an atomic global parallelism setting (``lib.rs:1123-1140``) and cargo
features. The TPU analogue: a module-level config controlling

* whether Pallas kernels are used (default: only on TPU backends — the jnp
  paths are mathematically identical and faster on CPU, and CI runs on a
  virtual CPU mesh);
* default blocking parameters;
* a ``perf-warn`` analogue: warn once when an op falls off the fast path.
"""
from __future__ import annotations

import contextlib
import logging
import os
import threading

import jax

_log = logging.getLogger("faer_tpu")

_state = threading.local()


def _default_use_pallas() -> bool:
    env = os.environ.get("FAER_TPU_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False", "")
    # Measured on TPU v5e: XLA's own dot at Precision.HIGH beats the Pallas
    # tile GEMM at every shape (88 vs 62 TF/s at 4096³), so plain GEMMs route
    # to XLA by default. Pallas remains the vehicle for *fused* kernels
    # (panel factorizations, update+argmax) where XLA has no primitive.
    return False


class _Config:
    def __init__(self):
        self.use_pallas: bool | None = None  # None = auto (TPU only)
        self.perf_warn: bool = os.environ.get("FAER_TPU_PERF_WARN", "0") not in ("0", "")
        # default panel width for blocked factorizations; multiples of the
        # 128-wide MXU tile keep every GEMM on the fast path
        self.default_block_size: int = 256
        # below this dimension product, skip Pallas and use plain jnp.dot —
        # mirrors faer's nano-gemm dispatch threshold (matmul/mod.rs:16)
        self.small_matmul_threshold: int = 128 ** 3
        # f32 MXU precision: "high" = bf16x3 passes (error ≈ 1e-5 rel, well
        # inside faer's 8n·eps test tolerance, ~2.5× faster than bf16x6);
        # "highest" = full f32 emulation for strict parity runs
        self.f32_precision: str = os.environ.get("FAER_TPU_F32_PRECISION", "high")
        # Pallas panel-factor kernels (VMEM-resident sequential cores): on for
        # TPU f32 paths; the XLA fori reference remains for other dtypes/CPU
        self.use_pallas_panels: bool = os.environ.get(
            "FAER_TPU_PALLAS_PANELS", "1") not in ("0", "false", "False")

    def pallas_enabled(self) -> bool:
        if self.use_pallas is None:
            return _default_use_pallas()
        return self.use_pallas


config = _Config()

_warned: set[str] = set()


def effective_platform() -> str:
    """Platform whose code path should be traced right now.

    ``jax.default_backend()`` is wrong when arrays live on a non-default
    backend (e.g. a virtual CPU mesh on a TPU host — the driver's
    ``dryrun_multichip`` environment). Mesh-level entry points set an explicit
    override via :func:`platform_scope`; this consults it first.
    """
    override = getattr(_state, "platform", None)
    if override is not None:
        return override
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


@contextlib.contextmanager
def platform_scope(platform: str):
    """Pin the platform used for fast-path (Pallas) gating during tracing.

    Used by the mesh layer and driver entry points so that code traced for
    CPU shards never tries to lower Mosaic kernels on a TPU-default host.
    """
    prev = getattr(_state, "platform", None)
    _state.platform = platform
    try:
        yield
    finally:
        _state.platform = prev


def panel_kernels_enabled(dtype) -> bool:
    """True when the Pallas panel kernels should run (TPU platform + f32)."""
    import jax.numpy as jnp

    if not config.use_pallas_panels:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    return effective_platform() == "tpu"


def perf_warn(key: str, msg: str) -> None:
    """faer's ``__perf_warn!`` analogue (``lib.rs:256-280``): warn once per site."""
    if config.perf_warn and key not in _warned:
        _warned.add(key)
        _log.warning("faer_tpu perf: %s", msg)


def set_global_parallelism(par) -> None:
    """API parity with faer ``set_global_parallelism`` (``lib.rs:1123``)."""
    _state.par = par


def get_global_parallelism():
    from faer_tpu.core.flags import Par

    return getattr(_state, "par", Par.AUTO)
