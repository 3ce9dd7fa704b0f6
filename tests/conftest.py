"""Test configuration: run everything on an 8-device virtual CPU mesh.

This exercises the real ppermute halo-exchange path without TPU hardware
(SURVEY.md section 4 "Implication for the new framework"). The environment
pre-imports jax via sitecustomize, so the platform must be flipped with
jax.config (XLA_FLAGS is still read lazily at first CPU-client creation).
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " " + _FLAG).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/repo/data"
GOLDEN = "/root/repo/tests/goldens"

# Interpret-mode Pallas differentials execute the kernels' DMA/semaphore
# programs on the CPU interpreter at ~10-100x real cost, and this host has
# ONE core — the full kernel matrix takes ~45 min serial. Policy: every test
# in these modules is `slow` (run `make test-all` / nightly) unless
# explicitly marked `smoke` (the cheap per-kernel differentials kept in the
# default <10-min gate, `make test`). Non-kernel modules are unaffected.
_INTERPRET_KERNEL_MODULES = {
    "test_strips",
    "test_xpad",
    "test_torus_kstep",
    "test_padded_kstep",
    "test_scale",
}
# Future kernel-test modules are caught by prefix so a new one cannot
# silently land in the default <10-min gate and blow its budget on the
# 1-core host; modules whose names don't fit a prefix go in the set above
# (test_torus itself is the cheap jnp path and stays in the default gate).
_INTERPRET_KERNEL_PREFIXES = ("test_pallas", "test_kernel")


def _is_interpret_kernel_module(mod: str) -> bool:
    return mod in _INTERPRET_KERNEL_MODULES or mod.startswith(
        _INTERPRET_KERNEL_PREFIXES
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if mod.endswith(".py"):
            mod = mod[:-3]
        if _is_interpret_kernel_module(mod) and "smoke" not in item.keywords:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def params_128():
    from tpulbm.io.params_file import read_params
    from tpulbm.io.obstacles import read_obstacles

    params = read_params(os.path.join(REFERENCE, "input_128x128.params"))
    mask, num_free = read_obstacles(
        os.path.join(REFERENCE, "obstacles_128x128.dat"), params.nx, params.ny
    )
    return params.with_free_cells(num_free), mask


@pytest.fixture(scope="session")
def golden_av_vels_128():
    return np.loadtxt(
        os.path.join(GOLDEN, "128x128.av_vels.dat"), usecols=[1], max_rows=512
    )
