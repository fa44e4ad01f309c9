"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY §4: multi-chip tests use fake
meshes; the driver validates real-TPU paths separately). f64 is enabled for
numerical-parity tests against faer's f64 suite.
"""
import os

# Force the virtual CPU mesh even when a real TPU is attached (the launcher
# pre-sets JAX_PLATFORMS=axon, which wins over the env var — override via
# jax.config instead); FAER_TPU_TEST_TPU=1 opts out to run on the real chip.
_use_tpu = os.environ.get("FAER_TPU_TEST_TPU", "0") == "1"
if not _use_tpu:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _use_tpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules: the XLA:CPU JIT has
    segfaulted in `backend_compile_and_load` late in the full suite (~400
    tests' worth of accumulated compilations); the same tests pass in
    isolation.  Bounding the live-executable count avoids the crash at the
    cost of cross-module recompiles (which are disjoint anyway)."""
    yield
    import jax

    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "tpu: requires a real TPU")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (skipped by default)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
