"""Pallas K-step compute on the 2-D torus mesh (VERDICT r1 item 5).

The torus runner exchanges corner-carrying K-deep slabs (two-phase: x ring
then y ring of the x-extended block) every K steps and advances K fused steps
with the kstep window kernel over a lane-aligned x-extended local array. The
jnp per-step torus path remains the oracle-adjacent fallback.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh_2d
from tpulbm.dist.runner import (
    _make_runner_2d_kstep,
    make_runner,
    supported_2d_kstep,
)
from tpulbm.dist.sharding import shard_arrays
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _box_problem(ny, nx, iters=100):
    from tpulbm.core.params import LBMParams
    from tpulbm.tools.make_deck import box_obstacles

    params = LBMParams(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    mask = box_obstacles(nx, ny)
    return params.with_free_cells(ny * nx - int(mask.sum())), mask


@pytest.mark.parametrize("dy,dx", [(2, 4), (4, 2), (2, 2)])
@pytest.mark.parametrize("n", [16, 19])  # chunk-aligned and remainder
def test_torus_kstep_matches_oracle(dy, dx, n):
    params, mask = _box_problem(128, 512)
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    mesh = get_mesh_2d(dy, dx)
    assert supported_2d_kstep(params, mesh, 8)
    runner = _make_runner_2d_kstep(params, n, mesh, k=min(8, n))
    f0, o0 = shard_arrays(mesh, initial_state(params), obst)
    f, av = runner(f0, o0)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)
    assert av.shape == (n,)


def test_torus_routing():
    """make_runner on a 2-D mesh routes pallas to the kstep torus tier, jnp
    to the per-step path, and rejects pallas-rdma."""
    params, mask = _box_problem(128, 256)
    mesh = get_mesh_2d(2, 2)
    r = make_runner(params, 8, mesh=mesh, backend="pallas")
    f0, o0 = shard_arrays(mesh, initial_state(params), jnp.asarray(mask))
    f, av = r(f0, o0)
    assert av.shape == (8,)
    with pytest.raises(ValueError, match="pallas-rdma"):
        make_runner(params, 8, mesh=mesh, backend="pallas-rdma")


def test_torus_unsupported_width_falls_back_or_raises():
    """w < 128 columns per shard: auto falls back to the jnp torus path;
    explicit pallas raises."""
    from tpulbm.core.params import LBMParams

    params = LBMParams(nx=256, ny=128, max_iters=4, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85).with_free_cells(1)
    mesh = get_mesh_2d(2, 4)  # w = 64
    assert not supported_2d_kstep(params, mesh, 8)
    with pytest.raises(ValueError, match="torus shard shape"):
        make_runner(params, 4, mesh=mesh, backend="pallas")
    # jnp explicitly and via auto (CPU) still build
    make_runner(params, 4, mesh=mesh, backend="jnp")
    make_runner(params, 4, mesh=mesh, backend="auto")
