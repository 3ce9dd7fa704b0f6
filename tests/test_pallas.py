"""Differential tests: fused Pallas kernel (interpret mode) vs the jnp oracle.

The kernel is the hot path on TPU; on the CPU test platform it runs in
interpreter mode, which executes the same DMA/semaphore program. The
multi-block cases are load-bearing: the quad-buffer slot rotation once raced
block i+2's prefetch DMA against block i-1's neighbour-row read."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpulbm.ops.pallas_step as ps
from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import make_runner
from tpulbm.ops import step_local
from tpulbm.ops.step_jnp import run_steps


def _rand_case(h, nx, seed=0, obst_frac=0.1):
    rng = np.random.RandomState(seed)
    f = jnp.asarray((0.1 + 0.01 * rng.rand(9, h, nx)).astype(np.float32))
    obst = jnp.asarray(rng.rand(h, nx) < obst_frac)
    return f, obst


@pytest.mark.smoke
@pytest.mark.parametrize(
    "h,nx,budget",
    [
        (64, 128, None),      # single block
        (64, 128, 8 * 128),   # 8 blocks of 8 rows (exercises slot rotation)
        (64, 128, 16 * 128),  # 4 blocks
        (32, 256, 8 * 256),   # 4 blocks, wider lanes
    ],
)
def test_kernel_matches_jnp_oracle(h, nx, budget, monkeypatch):
    if budget is not None:
        monkeypatch.setattr(ps, "_BLOCK_BUDGET", budget)
    p = LBMParams(nx=nx, ny=h, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    f, obst = _rand_case(h, nx)
    accel_row = jnp.int32(h - 2)
    omega, w1, w2 = p.omega, p.accel_w1, p.accel_w2

    prepare, step = ps.make_local_step(h, nx, omega, w1, w2)
    lo, hi = f[:, -1, :], f[:, 0, :]
    aux = prepare(obst, accel_row)
    fp, totp = jax.jit(step)(f, lo, hi, aux, accel_row)
    fj, totj = jax.jit(
        lambda *a: step_local.local_step_jnp(*a, omega, w1, w2)
    )(f, lo, hi, obst, accel_row)
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fj))
    np.testing.assert_allclose(float(totp), float(totj), rtol=1e-6)


@pytest.mark.smoke
def test_kernel_accel_row_on_block_boundary(monkeypatch):
    """The accelerated row handling when the row is a neighbour row of an
    adjacent block (the a_lo / a_hi code paths)."""
    monkeypatch.setattr(ps, "_BLOCK_BUDGET", 8 * 128)
    h, nx = 32, 128
    p = LBMParams(nx=nx, ny=h, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    omega, w1, w2 = p.omega, p.accel_w1, p.accel_w2
    prepare, step = ps.make_local_step(h, nx, omega, w1, w2)
    f, obst = _rand_case(h, nx, seed=2)
    for row in (7, 8, 9, 15, 16, 23, 24, 30):  # boundaries of 8-row blocks
        accel_row = jnp.int32(row)
        lo, hi = f[:, -1, :], f[:, 0, :]
        aux = prepare(obst, accel_row)
        fp, _ = jax.jit(step)(f, lo, hi, aux, accel_row)
        fj, _ = jax.jit(
            lambda *a: step_local.local_step_jnp(*a, omega, w1, w2)
        )(f, lo, hi, obst, accel_row)
        assert np.array_equal(np.asarray(fp), np.asarray(fj)), f"row {row}"


@pytest.mark.smoke
def test_non_owner_device_applies_no_accel(monkeypatch):
    """accel_row == -1 (non-owner shard) must leave the state untouched by
    the acceleration — including the block-0 lo-row edge case."""
    monkeypatch.setattr(ps, "_BLOCK_BUDGET", 8 * 128)
    h, nx = 32, 128
    p = LBMParams(nx=nx, ny=h, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    prepare, step = ps.make_local_step(h, nx, p.omega, p.accel_w1, p.accel_w2)
    f, obst = _rand_case(h, nx, seed=3)
    lo, hi = f[:, -1, :], f[:, 0, :]
    none = jnp.int32(-1)
    aux = prepare(obst, none)
    fp, _ = jax.jit(step)(f, lo, hi, aux, none)
    fj, _ = jax.jit(
        lambda *a: step_local.local_step_jnp(*a, p.omega, p.accel_w1, p.accel_w2)
    )(f, lo, hi, obst, none)
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fj))


def test_runner_pallas_multi_device_matches_oracle(params_128):
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 20
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    for n_dev in (1, 4, 8):
        runner = make_runner(params, n, mesh=get_mesh(n_devices=n_dev),
                             backend="pallas")
        f, av = runner(initial_state(params), obst)
        assert np.array_equal(np.asarray(f), np.asarray(f_ref)), n_dev
        np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref),
                                   rtol=2e-5)


@pytest.mark.smoke
def test_supported_predicate():
    assert ps.supported(128, 128)
    assert ps.supported(1024, 1024)
    assert not ps.supported(100, 128)   # rows not divisible by 8-multiples
    assert not ps.supported(128, 100)   # lanes not a multiple of 128


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    """Bitwise kernel-vs-oracle differentials run the canonical equilibrium
    form; the production pair-symmetric config is tolerance-gated in
    test_pair_symmetric.py (see core/physics.equilibrium)."""
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)
