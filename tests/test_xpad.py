"""Periodic x-extension (lane padding for nx % 128 != 0): differentials vs
the jnp oracle.

Load-bearing cases:
- the lane-roll wrap patch (window_step.x_wrap_patch) keeps mirror columns
  bitwise-equal to their canonicals, so the cropped result is EXACT (no
  tolerance) — single device and across the shard ring;
- mirror columns are excluded from the per-step |u| series;
- the x extension composes with the periodic row extension (uneven
  (ny, n_devices)) and with remainder chunks;
- make_runner routes unaligned-nx shapes to the x-extended Pallas tier
  instead of the jnp cliff (VERDICT r2 item 6).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_xpad_runner, make_runner
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _random_case(ny, nx, seed=5, p_block=0.12):
    p = LBMParams(nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < p_block
    p = p.with_free_cells(ny * nx - int(mask.sum()))
    return p, jnp.asarray(mask)


@pytest.mark.parametrize("ny,nx,n,n_dev", [
    (128, 100, 16, 1),    # skew tier, two ping-pong chunks
    (128, 250, 8, 1),     # padx=6, single chunk
    (96, 200, 19, 2),     # ring + classic-kstep remainder chunk (rem=3)
    (100, 200, 16, 2),    # row extension (ny=100 over 2) + column extension
    (128, 200, 16, 8),    # 8-shard ring, rows=16 -> classic kstep tier
])
def test_xpad_matches_oracle(ny, nx, n, n_dev):
    p, obst = _random_case(ny, nx)
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = _make_xpad_runner(p, n, get_mesh(n_devices=n_dev))
    assert r is not None, "xpad runner rejected a shape it should take"
    f, av = r(initial_state(p), obst)
    assert f.shape == (9, ny, nx)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n,)


@pytest.mark.smoke
@pytest.mark.parametrize("mode", ["where", "at_set", "dus"])
def test_x_patch_mode_is_bitwise_identical(monkeypatch, mode):
    """Every formulation of x_wrap_patch (A/B knob window_step.X_PATCH_MODE)
    is the same one-lane substitution as the production concat default
    (which every other xpad test exercises) — the extension must stay EXACT
    under any of them. (at_set/dus are interpret-only: hardware Mosaic
    rejects their scatter/dynamic_update_slice lowerings, measured r4.)"""
    from tpulbm.ops import window_step

    p, obst = _random_case(128, 250, seed=7)
    n = 8
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    monkeypatch.setattr(window_step, "X_PATCH_MODE", mode)
    r = _make_xpad_runner(p, n, get_mesh(n_devices=1))
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_make_runner_routes_unaligned_nx():
    """backend='pallas' must take nx % 128 != 0 via the x extension (the
    reference runs any nx at full speed, d2q9-bgk.c:834-862)."""
    p, obst = _random_case(128, 200, seed=9)
    n = 10
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    runner = make_runner(p, n, mesh=get_mesh(n_devices=2), backend="pallas")
    f, av = runner(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.smoke
def test_xpad_rejects_tiny_nx():
    """padx >= nx (mirror would wrap twice) stays on the jnp path."""
    p, _ = _random_case(128, 60)
    assert _make_xpad_runner(p, 8, get_mesh(n_devices=1)) is None
