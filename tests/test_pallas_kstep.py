"""K-step temporal-blocking kernel: differential tests vs the jnp oracle.

Load-bearing cases:
- the window-exceeds-torus case (single device, win > ny) where the
  accelerated global row appears TWICE in a window — both copies must be
  accelerated (caught a real bug: modular row selection);
- multi-block shards (DMA case analysis incl. clamped inactive cases);
- K-slab halos over the ppermute ring on 2/8 devices;
- remainder chunks (n_steps % K != 0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpulbm.ops.pallas_kstep as pk
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_kstep_runner, make_runner
from tpulbm.ops.step_jnp import run_steps


@pytest.mark.smoke
@pytest.mark.parametrize("n_dev,k", [
    (1, 8), (1, 3), (2, 8), (8, 8), (8, 5),
])
def test_kstep_matches_oracle(params_128, n_dev, k):
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 19  # exercises remainder path for every k
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_kstep_runner(params, n, get_mesh(n_devices=n_dev), k)
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n,)


@pytest.mark.parametrize("n_dev,n", [
    (1, 16),  # one ping-pong pair
    (1, 24),  # odd chunk count: plain head + one pair
    (4, 43),  # pairs + plain head + remainder chunk, over the ring
])
def test_kstep_alias_donor_matches_oracle(params_128, n_dev, n):
    """The donor-aliased stationary ping-pong (production default: removes
    the scan-carry copy) is bitwise-equal to the oracle."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_kstep_runner(params, n, get_mesh(n_devices=n_dev), 8,
                                alias_donor=True)
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n,)


def test_kstep_multiblock_shard(params_128, monkeypatch):
    """Force several blocks per shard (small BY) to hit every DMA case."""
    monkeypatch.setattr(pk, "_BLOCK_BUDGET", 24 * 128)  # BY=8 -> win=24
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 16
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    for n_dev in (1, 2):
        runner = _make_kstep_runner(params, n, get_mesh(n_devices=n_dev), 8)
        f, av = runner(initial_state(params), obst)
        assert np.array_equal(np.asarray(f), np.asarray(f_ref)), n_dev
        np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref),
                                   rtol=2e-5)


@pytest.mark.smoke
def test_runner_prefers_resident_then_kstep(params_128):
    """Backend selection: small grids -> resident; larger/streamed local
    shapes -> kstep (verified indirectly by equality either way)."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 10
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    # multi-device forces the kstep path (resident is single-device only)
    runner = make_runner(params, n, mesh=get_mesh(n_devices=4),
                         backend="pallas")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.smoke
def test_supported_predicate():
    assert pk.supported(128, 128, 8)
    assert pk.supported(1024, 1024, 8)
    assert not pk.supported(128, 128, 9)   # K bounded by the 8-row margin
    assert not pk.supported(4, 128, 8)     # shard shorter than the halo slab
    assert not pk.supported(128, 100, 8)   # lane misaligned


def test_alias_donor_variant_matches(params_128):
    """The donor-aliased ping-pong chunk (output written into a donated
    buffer via input_output_aliases) is bitwise-equal to the oracle."""
    import functools

    import tpulbm.ops.pallas_kstep as pk
    from tpulbm.core.state import initial_state
    from tpulbm.ops.step_jnp import run_steps

    params, mask = params_128
    obst = jnp.asarray(mask)
    h = nx_ = params.ny
    prep, chunk = pk.make_kstep(
        h, params.nx, 8, ny_global=params.ny, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2, alias_donor=True,
    )
    free_inv = jnp.float32(params.free_cells_inv)

    @jax.jit
    def run24(f):
        obst_f = obst.astype(jnp.float32)
        aux = (obst_f, obst_f[-8:], obst_f[:8])
        scal = jnp.array([[params.accel_row, 0]], dtype=jnp.int32)

        def body(carry, _):
            a, b = carry
            c, av = chunk(b, b[:, -8:, :], b[:, :8, :], aux, scal, donor=a)
            return (b, c), av * free_inv

        (_, out), avs = jax.lax.scan(
            body, (jnp.zeros_like(f), f), None, length=3
        )
        return out, avs.reshape(-1)

    f, av = run24(initial_state(params))
    f_ref, av_ref = run_steps(initial_state(params), obst, params, 24)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-6)


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    """Bitwise kernel-vs-oracle differentials run the canonical equilibrium
    form; the production pair-symmetric config is tolerance-gated in
    test_pair_symmetric.py (see core/physics.equilibrium)."""
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def test_exact_all_composite_matches_oracle():
    """exact_all (single-body kernel + classic fix pass over block 0's
    first K rows) through make_runner, at a shape with >= 2 row blocks so
    the gate activates (ny=512 -> BY=256, 2 blocks)."""
    import tpulbm.dist.runner as R
    from tpulbm.core.params import LBMParams

    ny, nx = 512, 128
    p = LBMParams(nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(3)
    mask = rng.rand(ny, nx) < 0.1
    p = p.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    n = 19
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    runner = R._make_kstep_runner(p, n, get_mesh(n_devices=1), k=8,
                                  alias_donor=True, exact_all=True)
    f, av = runner(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)

    # and over the ring (2 devices, h=256 -> BY=128, 2 blocks per shard)
    runner2 = R._make_kstep_runner(p, n, get_mesh(n_devices=2), k=8,
                                   alias_donor=True, exact_all=True)
    f2, av2 = runner2(initial_state(p), obst)
    assert np.array_equal(np.asarray(f2), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av2), np.asarray(av_ref), rtol=2e-5)
