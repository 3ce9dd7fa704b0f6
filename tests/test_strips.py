"""Column-strips runner (wide grids on one device, 1-D x-halo kernel per
strip): differential tests vs the jnp oracle.

Load-bearing cases: the strip-ring x margins (modular), corner-carrying
self-wrap y slabs, remainder chunks, and multi-strip counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_kstep_strips_runner, supported_strips
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _case(ny, nx):
    p = LBMParams(nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(1)
    mask = rng.rand(ny, nx) < 0.1
    p = p.with_free_cells(ny * nx - int(mask.sum()))
    return p, jnp.asarray(mask)


@pytest.mark.smoke
def test_supported_gate():
    p, _ = _case(64, 256)
    assert supported_strips(p, 1, 8, bx=128, by=16)
    assert not supported_strips(p, 2, 8, bx=128, by=16)  # single-device only
    assert not supported_strips(p, 1, 8, bx=256, by=16)  # needs >= 2 strips


@pytest.mark.parametrize("ny,nx,n", [(64, 256, 16), (64, 384, 19), (48, 256, 8)])
def test_strips_match_oracle(ny, nx, n):
    params, obst = _case(ny, nx)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_kstep_strips_runner(
        params, n, get_mesh(n_devices=1), k=8, bx=128, by=16
    )
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
