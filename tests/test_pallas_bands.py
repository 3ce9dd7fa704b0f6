"""Band-major K-step kernel: differential tests vs the jnp oracle.

The band layout makes the main window DMA contiguous on wide grids; the band
ring IS the x torus. Load-bearing cases: multi-band wrap (modular band
indexing), multi-rowblock shards, ring sharding, remainder chunks, and the
to_bands/from_bands round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpulbm.ops.pallas_kstep_bands as pkb
from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_kstep_bands_runner
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _box_problem(ny, nx):
    from tpulbm.tools.make_deck import box_obstacles

    params = LBMParams(nx=nx, ny=ny, max_iters=100, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    mask = box_obstacles(nx, ny)
    return params.with_free_cells(ny * nx - int(mask.sum())), mask


@pytest.mark.smoke
def test_band_round_trip():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(9, 64, 512).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pkb.from_bands(pkb.to_bands(f, 128))), np.asarray(f)
    )


@pytest.mark.smoke
def test_pick_bands():
    assert pkb.pick_bands(4096, 4096) == (32, 1024)
    assert pkb.pick_bands(4096, 4096, narrow_cols=True) == (64, 512)
    assert pkb.pick_bands(128, 128) is None  # needs >= 2 bands
    assert pkb.supported(4096, 4096, 8)
    assert not pkb.supported(128, 100, 8)


@pytest.mark.parametrize("n_dev,n", [(1, 16), (2, 19), (4, 16)])
def test_bands_matches_oracle(n_dev, n):
    params, mask = _box_problem(128, 512)
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_kstep_bands_runner(
        params, n, get_mesh(n_devices=n_dev), k=8
    )
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)
    assert av.shape == (n,)


def test_bands_many_bands_and_blocks():
    """4 bands x multiple row blocks: the modular band ring and row-case DMA
    predicates together."""
    params, mask = _box_problem(64, 512)
    obst = jnp.asarray(mask)
    n = 16
    f_ref, _ = run_steps(initial_state(params), obst, params, n)
    runner = _make_kstep_bands_runner(
        params, n, get_mesh(n_devices=1), k=8, tile=(8, 128)
    )
    f, _ = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))


def test_runner_falls_back_to_bands(monkeypatch):
    """make_runner routes wide grids to the band tier when the 1-D kstep
    and row-major 2-D tilings are unsupported (pallas backend)."""
    import tpulbm.ops.pallas_kstep as pk
    import tpulbm.ops.pallas_kstep2d as pk2
    from tpulbm.dist.runner import make_runner
    import tpulbm.ops.pallas_resident as pr

    monkeypatch.setattr(pk, "_BLOCK_BUDGET", 100)   # 1-D kstep unsupported
    monkeypatch.setattr(pk2, "supported", lambda *a, **k: False)
    monkeypatch.setattr(pr, "supported", lambda *a: False)
    params, mask = _box_problem(64, 512)
    obst = jnp.asarray(mask)
    n = 10
    f_ref, _ = run_steps(initial_state(params), obst, params, n)
    runner = make_runner(params, n, get_mesh(n_devices=1), backend="pallas")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    assert av.shape == (n,)


def test_bands_full_width_compute_matches_oracle():
    """narrow_cols=False computes the full loaded window (no lane relayout);
    must be bitwise the same physics."""
    params, mask = _box_problem(64, 512)
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, 16)
    runner = _make_kstep_bands_runner(
        params, 16, get_mesh(n_devices=1), k=8, narrow_cols=False
    )
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
