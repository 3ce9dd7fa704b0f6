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
