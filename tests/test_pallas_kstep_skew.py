"""Skewed zero-recompute K-step kernel: differentials vs the jnp oracle.

Load-bearing cases:
- the seam contract: block 0's slab reads are garbage and its 2K seam rows
  (values AND per-step sums) come from the fix kernel — single device the
  splice wraps the torus, multi-device it crosses the shard ring (the
  K-row output slab travels one shard down);
- donor-aliased ping-pong (production default) and the plain head chunk;
- remainder chunks fall back to the classic kstep kernel mid-runner;
- multi-block shards (slab handoff chains through every block).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpulbm.ops.pallas_kstep_skew as pks
from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_skew_runner, make_runner
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _random_case(ny, nx, seed=3, p_block=0.1):
    p = LBMParams(nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < p_block
    p = p.with_free_cells(ny * nx - int(mask.sum()))
    return p, jnp.asarray(mask)


@pytest.mark.parametrize("n,n_dev,donor", [
    # single chunk, plain — kept in the default gate (smoke)
    pytest.param(8, 1, False, marks=pytest.mark.smoke),
    (16, 1, True),    # one ping-pong pair
    (19, 1, True),    # odd head + remainder chunk (classic fallback)
    (24, 2, True),    # ring: fix band and output slab cross shards
    # 8-shard ring (ny=512 below) — smoke: the multi-device skew exchange
    pytest.param(24, 8, True, marks=pytest.mark.smoke),
])
def test_skew_matches_oracle(n, n_dev, donor):
    ny = 512 if n_dev == 8 else 128
    p, obst = _random_case(ny, 128)
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = _make_skew_runner(p, n, get_mesh(n_devices=n_dev),
                          alias_donor=donor)
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n,)


def test_skew_absorb_shift_matches_oracle():
    """absorb_shift replaces the per-step realignment rolls with static
    sublane-offset slices — the same index algebra, so bitwise-equal
    (ROADMAP 1024^2 lever; A/B knob)."""
    p, obst = _random_case(128, 128)
    n = 16
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = _make_skew_runner(p, n, get_mesh(n_devices=1), alias_donor=True,
                          kernel_kw=dict(absorb_shift=True))
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_skew_multiblock_shard(monkeypatch):
    """Small BY forces >= 4 blocks/shard: the slab handoff chains through
    interior blocks and the collide_split path stays bitwise."""
    monkeypatch.setattr(pks, "_BLOCK_BUDGET", 40 * 128)  # BY=32 at nx=128
    p, obst = _random_case(256, 128)
    n = 16
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    for n_dev, split in [(1, 1), (2, 2)]:
        r = _make_skew_runner(p, n, get_mesh(n_devices=n_dev),
                              collide_split=split)
        f, av = r(initial_state(p), obst)
        assert np.array_equal(np.asarray(f), np.asarray(f_ref)), n_dev
        np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref),
                                   rtol=2e-5)


def test_skew_accel_row_in_seam_band():
    """The accelerated row (ny-2) sits inside the shard-top/seam region for
    the LAST shard — the fix band and the sliding accel selection must agree
    there (ny=128, 4 shards -> h=32 unsupported; use 2 shards)."""
    p, obst = _random_case(128, 256, seed=11)
    n = 16
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = _make_skew_runner(p, n, get_mesh(n_devices=2))
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.smoke
def test_supported_predicate():
    assert pks.supported(128, 128, 8)
    assert pks.supported(1024, 1024, 8)
    assert not pks.supported(128, 128, 4)   # skew requires K == 8 (alignment)
    assert not pks.supported(32, 128, 8)    # no BY >= 24 with 2 blocks
    assert not pks.supported(128, 100, 8)   # lane misaligned


def test_runner_routes_to_skew():
    """make_runner's pallas tier picks the skew kernel for shapes it
    supports (and the result still matches the oracle)."""
    p, obst = _random_case(256, 128)
    n = 10
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    runner = make_runner(p, n, mesh=get_mesh(n_devices=2), backend="pallas")
    f, av = runner(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.smoke
def test_block_budget_pins_the_measured_picks():
    """The r4 block budget (61440 = (40+8)*1280, the largest window compiled
    and measured on hardware) must keep the measured tier routing: nx=1280
    joins the ratio-1.0 skew tier at BY=40 (+30% over the skew2d tile it
    fell to at the r3 48K budget); the 1024/1536 picks stay at their
    measured-best (scripts/ab_skew_budget_1280.py)."""
    assert pks._BLOCK_BUDGET == 61440
    assert pks.pick_block_rows(1280, 1280) == 40
    assert pks.pick_block_rows(1024, 1024) == 32
    assert pks.pick_block_rows(1536, 1536) == 32  # measured == BY=24
    assert pks.supported(1280, 1280, pks.SKEW_K)
    # wider grids still fall through to the 2-D tiled skew
    assert not pks.supported(2048, 2048, pks.SKEW_K)
    assert not pks.supported(4096, 4096, pks.SKEW_K)


@pytest.mark.smoke
def test_tiled_fix_matches_monolithic_bitwise():
    """The x-tiled seam fix (make_skew_fix_tiled, for nx past the monolithic
    kernel's VMEM envelope) produces BITWISE the monolithic fix's values on
    a 4-tile band; the |u| series differs only in tile addition order."""
    nx, ny, k = 512, 64, pks.SKEW_K
    rng = np.random.RandomState(11)
    band = jnp.asarray(
        0.05 + 0.01 * rng.rand(9, 4 * k, nx).astype(np.float32))
    oband = jnp.asarray((rng.rand(4 * k, nx) < 0.15).astype(np.float32))
    scal = jnp.asarray([[2, (ny - 2 * k) % ny]], dtype=jnp.int32)
    mono = pks.make_skew_fix(nx, ny, 1.85, 0.0000555, 0.0000139, k)
    tiled = pks.make_skew_fix_tiled(
        nx, ny, 1.85, 0.0000555, 0.0000139, k, bx=128)
    vals_m, av_m = mono(band, oband, scal)
    vals_t, av_t = tiled(band, oband, scal)
    assert np.array_equal(np.asarray(vals_t), np.asarray(vals_m))
    np.testing.assert_allclose(
        np.asarray(av_t), np.asarray(av_m), rtol=1e-6)


@pytest.mark.smoke
def test_skew2d_runner_with_tiled_fix_matches_oracle(monkeypatch):
    """End-to-end: the skew2d runner with the x-tiled fix (envelope forced
    below nx so the tiled path is selected, as for nx > 4096 in production)
    stays bitwise vs the jnp oracle."""
    from tpulbm.ops import pallas_kstep_skew2d as sk2

    monkeypatch.setattr(pks, "MONO_FIX_NX_MAX", 128)
    p, obst = _random_case(64, 512)
    n = 16
    p = type(p)(**{**p.__dict__, "max_iters": n})
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = _make_skew_runner(
        p, n, get_mesh(n_devices=1), maker=sk2.make_skew2d)
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.smoke
def test_wide_grids_supported_via_tiled_fix():
    """8192^2 must route to the skew2d tier (r4: previously supported()
    said yes but the monolithic fix OOMed VMEM at hardware compile; now the
    tiled fix covers it)."""
    from tpulbm.ops import pallas_kstep_skew2d as sk2

    assert sk2.supported(8192, 8192, pks.SKEW_K)
    assert pks.pick_fix_bx(8192) == 1024
    assert pks.pick_fix_bx(4224) == 384   # non-power-of-two widths too
    assert not pks.supported(8192, 8192, pks.SKEW_K)  # 1-D stays out


def test_skew2d_ring_with_tiled_fix_matches_oracle(monkeypatch):
    """Multi-device: the x-tiled fix composes with the shard ring (the fix
    band crosses shards via the 2K-row slab exactly as the monolithic one)."""
    from tpulbm.ops import pallas_kstep_skew2d as sk2

    monkeypatch.setattr(pks, "MONO_FIX_NX_MAX", 128)
    p, obst = _random_case(128, 512)
    n = 8
    p = type(p)(**{**p.__dict__, "max_iters": n})
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = _make_skew_runner(
        p, n, get_mesh(n_devices=2), maker=sk2.make_skew2d)
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
