"""Seeded randomized differential stress: random shapes, physics parameters,
and obstacle densities through the auto-tiered pallas runner vs the jnp
oracle. Complements the targeted kernel tests with coverage of
shape/parameter combinations nobody thought to write down.

Tolerance note: the canonical-shape kernel tests assert BITWISE equality,
which holds because jit-XLA and pallas-interpret happen to compile the
physics identically there. For arbitrary shapes (e.g. nx=384) XLA's CPU
codegen contracts mul+add into FMA differently and the paths drift by a few
ULP (~1e-8) while remaining numerically identical programs. Data-movement
bugs (races, bad indexing) produce errors many orders larger, so this fuzz
asserts a tight-but-not-bitwise tolerance."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import make_runner
from tpulbm.ops.step_jnp import run_steps

# (seed, ny, nx, n_dev) — shapes chosen to hit resident/kstep tiers and
# remainder paths; all satisfy the divisibility rules.
CASES = [
    (0, 64, 128, 1),     # resident
    (1, 96, 256, 1),     # resident, non-square
    (2, 320, 384, 1),    # kstep (122K cells > resident cap)
    (3, 64, 128, 2),     # kstep over a ring
    (4, 128, 384, 4),    # kstep, wider lanes, 4 shards
    (5, 48, 128, 2),     # 24-row shards, kstep with K=8 and remainder
]


@pytest.mark.parametrize("seed,ny,nx,n_dev", CASES)
def test_random_configs_match_oracle(seed, ny, nx, n_dev):
    rng = np.random.RandomState(seed)
    params = LBMParams(
        nx=nx, ny=ny, max_iters=1, reynolds_dim=int(rng.randint(1, 50)),
        density=float(np.float32(0.05 + 0.2 * rng.rand())),
        accel=float(np.float32(0.002 + 0.01 * rng.rand())),
        omega=float(np.float32(0.8 + 0.9 * rng.rand())),
    )
    mask = rng.rand(ny, nx) < rng.uniform(0.0, 0.25)
    mask[params.accel_row, rng.randint(0, nx, size=nx // 7)] = True
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    # random initial state: equilibrium plus noise (positive populations)
    f0 = np.asarray(initial_state(params))
    f0 = f0 * (1.0 + 0.1 * rng.rand(*f0.shape).astype(np.float32))
    n = int(rng.randint(9, 22))  # crosses the K=8 boundary with remainders

    f_ref, av_ref = run_steps(jnp.asarray(f0), obst, params, n)
    runner = make_runner(params, n, get_mesh(n_devices=n_dev),
                         backend="pallas")
    f, av = runner(jnp.asarray(f0), obst)
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), rtol=0, atol=1e-6,
        err_msg=str((seed, ny, nx)),
    )
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)


def test_random_config_kstep2d_tier(monkeypatch):
    """Force the 2-D tiled tier (normally nx >= 4096) at a small shape so
    the fuzz covers it too."""
    import tpulbm.ops.pallas_kstep as pk
    import tpulbm.ops.pallas_kstep2d as pk2
    import tpulbm.ops.pallas_kstep_skew as pks
    import tpulbm.ops.pallas_kstep_skew2d as pks2
    import tpulbm.ops.pallas_resident as pr

    monkeypatch.setattr(pr, "supported", lambda ny, nx: False)
    monkeypatch.setattr(pk, "supported", lambda h, nx, k: False)
    monkeypatch.setattr(pks, "supported", lambda h, nx, k: False)
    monkeypatch.setattr(pks2, "supported", lambda h, nx, k: False)
    monkeypatch.setattr(pk2, "_WINDOW_BUDGET", 12000)  # (8,128) tiles

    seed, ny, nx, n_dev = 7, 64, 256, 1
    rng = np.random.RandomState(seed)
    params = LBMParams(
        nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
        density=float(np.float32(0.05 + 0.2 * rng.rand())),
        accel=float(np.float32(0.002 + 0.01 * rng.rand())),
        omega=float(np.float32(0.8 + 0.9 * rng.rand())),
    )
    mask = rng.rand(ny, nx) < 0.15
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    f0 = np.asarray(initial_state(params))
    f0 = f0 * (1.0 + 0.1 * rng.rand(*f0.shape).astype(np.float32))
    n = 19

    f_ref, av_ref = run_steps(jnp.asarray(f0), obst, params, n)
    runner = make_runner(params, n, get_mesh(n_devices=n_dev),
                         backend="pallas")
    assert pk2.pick_tile(ny, nx) == (8, 128)
    f, av = runner(jnp.asarray(f0), obst)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)


# (seed, ny, nx, n_dev) — unaligned rows: the periodic-extension padded
# K-step tier (backend='pallas' dispatch, dist/runner padded=True).
PADDED_CASES = [
    (10, 19, 128, 1),    # pad=5, single device
    (11, 37, 256, 2),    # pad=11 over a 2-ring
    (12, 121, 128, 3),   # pad spans >1 row block
]


@pytest.mark.parametrize("seed,ny,nx,n_dev", PADDED_CASES)
def test_random_padded_configs_match_oracle(seed, ny, nx, n_dev):
    rng = np.random.RandomState(seed)
    params = LBMParams(
        nx=nx, ny=ny, max_iters=1, reynolds_dim=int(rng.randint(1, 50)),
        density=float(np.float32(0.05 + 0.2 * rng.rand())),
        accel=float(np.float32(0.002 + 0.01 * rng.rand())),
        omega=float(np.float32(0.8 + 0.9 * rng.rand())),
    )
    mask = rng.rand(ny, nx) < rng.uniform(0.0, 0.25)
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    f0 = np.asarray(initial_state(params))
    f0 = f0 * (1.0 + 0.1 * rng.rand(*f0.shape).astype(np.float32))
    n = int(rng.randint(9, 22))

    from tpulbm.dist.runner import supported_padded_kstep

    assert supported_padded_kstep(params, n_dev, 8)
    f_ref, av_ref = run_steps(jnp.asarray(f0), obst, params, n)
    runner = make_runner(params, n, get_mesh(n_devices=n_dev),
                         backend="pallas")
    f, av = runner(jnp.asarray(f0), obst)
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), rtol=0, atol=1e-6,
        err_msg=str((seed, ny, nx, n_dev)),
    )
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)


@pytest.mark.parametrize("seed,dy,dx", [(20, 2, 4), (21, 4, 2)])
def test_random_torus_xhalo_matches_oracle(seed, dy, dx):
    """The x_halo torus kstep tier under random physics/obstacles."""
    from tpulbm.dist.mesh import get_mesh_2d
    from tpulbm.dist.sharding import shard_arrays

    rng = np.random.RandomState(seed)
    ny, nx = 64, 512
    params = LBMParams(
        nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
        density=float(np.float32(0.05 + 0.2 * rng.rand())),
        accel=float(np.float32(0.002 + 0.01 * rng.rand())),
        omega=float(np.float32(0.8 + 0.9 * rng.rand())),
    )
    mask = rng.rand(ny, nx) < 0.12
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    f0 = np.asarray(initial_state(params))
    f0 = f0 * (1.0 + 0.1 * rng.rand(*f0.shape).astype(np.float32))
    n = int(rng.randint(9, 22))

    f_ref, av_ref = run_steps(jnp.asarray(f0), obst, params, n)
    mesh = get_mesh_2d(dy, dx)
    runner = make_runner(params, n, mesh=mesh, backend="pallas")
    fs, os_ = shard_arrays(mesh, jnp.asarray(f0), obst)
    f, av = runner(fs, os_)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=3e-5)


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    """Bitwise kernel-vs-oracle differentials run the canonical equilibrium
    form; the production pair-symmetric config is tolerance-gated in
    test_pair_symmetric.py (see core/physics.equilibrium)."""
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)
