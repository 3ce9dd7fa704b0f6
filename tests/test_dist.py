"""Distributed runner: device-count invariance and decomposition parity.

The reference could only test its MPI build by running the real binary and
re-checking goldens (SURVEY.md section 4). Here the ppermute halo path runs on
an 8-device virtual CPU mesh and must reproduce the single-device oracle
bitwise."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import make_runner
from tpulbm.dist.sharding import decompose_rows, validate_even_split
from tpulbm.ops.step_jnp import run_steps

N_STEPS = 50


@pytest.fixture(scope="module")
def oracle(params_128):
    params, mask = params_128
    f, av = run_steps(initial_state(params), jnp.asarray(mask), params, N_STEPS)
    return np.asarray(f), np.asarray(av)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_device_count_invariance(params_128, oracle, n_dev):
    params, mask = params_128
    f_ref, av_ref = oracle
    mesh = get_mesh(n_devices=n_dev)
    runner = make_runner(params, N_STEPS, mesh=mesh, backend="jnp")
    f, av = runner(initial_state(params), jnp.asarray(mask))
    assert np.array_equal(np.asarray(f), f_ref), "state must be bitwise equal"
    np.testing.assert_allclose(np.asarray(av), av_ref, rtol=2e-5)


def test_halo_ring_periodicity(params_128):
    """y-periodicity must come out of the ring wrap-around: a moving blob
    crossing the top boundary reappears at the bottom identically for any
    device count."""
    params, mask = params_128
    f0 = np.array(initial_state(params))
    f0[2, -1, :] *= 2.0  # extra north-moving mass on the last row
    outs = []
    for n_dev in (1, 8):
        runner = make_runner(params, 3, mesh=get_mesh(n_devices=n_dev),
                             backend="jnp")
        f, _ = runner(jnp.asarray(f0), jnp.asarray(mask))
        outs.append(np.asarray(f))
    assert np.array_equal(outs[0], outs[1])
    # the extra north-moving mass wrapped through the periodic boundary into
    # the bottom rows (row 0 is a wall, so it shows up bounced into other
    # channels there)
    assert not np.array_equal(outs[0][:, :2], f0[:, :2])


def test_decompose_rows_reference_parity():
    """The remainder-balanced split matches the reference's rules
    (d2q9-bgk.c:834-862), including last-rank >= 3 rows."""
    for ny, n in [(128, 64), (128, 5), (256, 64), (1024, 64), (128, 1)]:
        ny_local, displs = decompose_rows(ny, n)
        assert sum(ny_local) == ny
        assert displs[0] == 0
        for i in range(1, n):
            assert displs[i] == displs[i - 1] + ny_local[i - 1]
        assert ny_local[-1] >= 3
    # 128 rows over 64 ranks: base=2 (<3) forces the borrow rule.
    ny_local, _ = decompose_rows(128, 64)
    assert ny_local[-1] == 3 and ny_local[-2] == 1


def test_validate_even_split():
    assert validate_even_split(128, 8) == 16
    with pytest.raises(ValueError):
        validate_even_split(130, 8)
    with pytest.raises(ValueError):
        validate_even_split(16, 8)  # 2 rows/device < 3
