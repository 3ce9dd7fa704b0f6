"""Periodic-extension padded K-step runner: any (ny, n_devices) on the fast
Pallas kernel.

Padding rows mirror rows 0..pad-1, which makes the padded grid an exact
invariant of the torus evolution — the final crop must be BITWISE equal to
the unpadded oracle, and mirror rows must be excluded from the |u| series
(canon_ny mask). Load-bearing cases: single device (self-wrap at shifted
offsets), multi-device (shifted wrap slabs through the ring), a shard count
where pad spans several row blocks, and backend='pallas' dispatch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import (
    _make_kstep_runner,
    make_runner,
    supported_padded_kstep,
)
from tpulbm.dist.sharding import padded_split_aligned
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _problem(ny, nx, seed=7):
    params = LBMParams(nx=nx, ny=ny, max_iters=100, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < 0.06
    return params.with_free_cells(ny * nx - int(mask.sum())), mask


@pytest.mark.smoke
def test_padded_split_aligned_policy():
    assert padded_split_aligned(19, 1) == (24, 24)
    assert padded_split_aligned(30, 2) == (16, 32)
    assert padded_split_aligned(130, 3) == (48, 144)
    assert padded_split_aligned(128, 8) == (16, 128)  # aligned: no padding


@pytest.mark.smoke
def test_supported_gate():
    p19, _ = _problem(19, 128)
    assert supported_padded_kstep(p19, 1, 8)
    p130_8, _ = _problem(130, 128)
    # pad=62 > rows-8=16: wrap slab sources leave the edge shards — the
    # general multi-hop slab form now takes it (round-3; formerly excluded)
    assert supported_padded_kstep(p130_8, 8, 8)
    p_nx, _ = _problem(19, 100)
    assert not supported_padded_kstep(p_nx, 1, 8)  # nx % 128 != 0


@pytest.mark.parametrize(
    "ny,nx,n_dev,n",
    [
        (19, 128, 1, 20),    # single device, pad=5, remainder chunk (n%8!=0)
        (30, 128, 2, 24),    # ring with shifted wrap slabs
        (130, 128, 3, 16),   # pad=14 spans > 1 row block of 8
        (100, 128, 8, 16),   # pad=28 > rows=16: multi-hop wrap slabs, both
                             # wrap sources spanning two interior shards
        (130, 128, 8, 16),   # pad=62: wrap sources deep inside the ring
    ],
)
def test_padded_kstep_matches_oracle(ny, nx, n_dev, n):
    params, mask = _problem(ny, nx)
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_kstep_runner(
        params, n, get_mesh(n_devices=n_dev), k=8, padded=True
    )
    f, av = runner(initial_state(params), obst)
    assert f.shape == (9, ny, nx)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)


def test_padded_kstep_alias_donor_matches_oracle():
    params, mask = _problem(30, 128)
    obst = jnp.asarray(mask)
    f_ref, _ = run_steps(initial_state(params), obst, params, 32)
    runner = _make_kstep_runner(
        params, 32, get_mesh(n_devices=2), k=8, padded=True, alias_donor=True
    )
    f, _ = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))


def test_make_runner_dispatches_padded_pallas():
    """backend='pallas' on an unaligned (ny, n_dev) routes to the padded
    K-step runner instead of raising (and matches the oracle)."""
    params, mask = _problem(30, 128)
    obst = jnp.asarray(mask)
    f_ref, _ = run_steps(initial_state(params), obst, params, 16)
    runner = make_runner(params, 16, mesh=get_mesh(n_devices=2),
                         backend="pallas")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    assert av.shape == (16,)


def test_make_runner_padded_when_rows_unaligned_even_split():
    """ny divides n_dev but rows aren't 8-aligned (ny=36 over 2 = 18 rows):
    the padded tier takes it on backend='pallas'."""
    params, mask = _problem(36, 128)
    obst = jnp.asarray(mask)
    f_ref, _ = run_steps(initial_state(params), obst, params, 16)
    runner = make_runner(params, 16, mesh=get_mesh(n_devices=2),
                         backend="pallas")
    f, _ = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
