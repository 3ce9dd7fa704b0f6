"""2-D tiled skew kernel: differentials vs the jnp oracle.

Covers the skew2d-specific machinery the 1-D tests can't: the three-piece
modular column DMA (real x wrap), the per-strip slab lanes, the full-window
vs narrow-window compute (``mnx``), and the cross-strip/cross-shard seam fix
over column tiles. Production default is full-window (mnx=_MX), measured
7.5% faster at 4096^2 (docs/measurements/round3.md); the narrow window stays
as an A/B variant and both must be bitwise vs the oracle.
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_skew_runner
from tpulbm.ops import pallas_kstep_skew2d as sk2
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


def _case(ny, nx, seed=3, p_block=0.1):
    p = LBMParams(nx=nx, ny=ny, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < p_block
    p = p.with_free_cells(ny * nx - int(mask.sum()))
    return p, jnp.asarray(mask)


def _run(p, obst, n, n_dev=1, tile=(24, 256), mnx=None, donor=True,
         reuse=False, merged=False, in_slots=None, absorb=False):
    maker = functools.partial(sk2.make_skew2d, mnx=mnx, local_reuse=reuse,
                              merged_fetch=merged, in_slots=in_slots,
                              absorb_shift=absorb)
    r = _make_skew_runner(p, n, get_mesh(n_devices=n_dev), maker=maker,
                          tile=tile, alias_donor=donor)
    return r(initial_state(p), obst)


@pytest.mark.smoke
def test_skew2d_single_chunk_matches_oracle():
    """One 8-step chunk over 4x4 tiles (column wrap + slab handoff +
    full-width fix) — the cheapest true skew2d differential, kept in the
    default gate."""
    p, obst = _case(96, 1024)
    n = 8
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    f, av = _run(p, obst, n, donor=False)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_skew2d_absorb_shift_matches_oracle():
    """Static sublane-offset slices instead of the per-step realignment
    rolls — same index algebra, bitwise-equal (A/B knob)."""
    p, obst = _case(96, 1024, seed=9)
    n = 16
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    f, av = _run(p, obst, n, absorb=True)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.parametrize("merged,in_slots", [(True, None), (False, 3),
                                             (True, 3), (False, 4)])
def test_skew2d_fetch_pipeline_variants_match_oracle(merged, in_slots):
    """The merged contiguous window fetch (1 DMA per non-wrapping strip
    instead of 3) and the depth-(in_slots-1) input prefetch pipeline are
    pure data-movement reorganizations — bitwise the same physics. Two
    chunks so every slot rotation and the edge/interior fetch predicates
    all fire."""
    p, obst = _case(96, 1024, seed=5)
    n = 16
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    f, av = _run(p, obst, n, merged=merged, in_slots=in_slots)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref)), (merged, in_slots)
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_skew2d_pipeline_validation():
    p, obst = _case(96, 1024)
    with pytest.raises(ValueError):
        _run(p, obst, 8, in_slots=1)                 # in_slots < slots
    with pytest.raises(ValueError):
        _run(p, obst, 8, reuse=True, in_slots=3)     # reuse needs depth 1


@pytest.mark.parametrize("mnx", [None, 64, 128])
def test_skew2d_mnx_variants_match_oracle(mnx):
    """Full-window (default/128) and narrow-window (64) compute are bitwise
    the same physics — the K-column edge analysis holds for any margin."""
    p, obst = _case(96, 1024, seed=7)
    n = 16  # one donor ping-pong pair
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    f, av = _run(p, obst, n, mnx=mnx)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref)), mnx
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.parametrize("reuse", [True, False])
def test_skew2d_ring_and_remainder_matches_oracle(reuse):
    """2-shard ring (fix band + output slab cross shards) plus a sub-K
    remainder chunk falling back to the classic 2-D kernel; with and
    without the left-margin VMEM reuse / merged main+right fetch."""
    p, obst = _case(96, 2048, seed=11)
    n = 19
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    f, av = _run(p, obst, n, n_dev=2, tile=(24, 512), reuse=reuse)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_mnx_validation():
    with pytest.raises(ValueError):
        sk2.make_skew2d(96, 1024, 8, ny_global=96, omega=1.85,
                        accel_w1=0.1, accel_w2=0.1, tile=(24, 256), mnx=63)
    with pytest.raises(ValueError):
        sk2.make_skew2d(96, 1024, 8, ny_global=96, omega=1.85,
                        accel_w1=0.1, accel_w2=0.1, tile=(24, 256), mnx=256)


def test_production_default_is_full_window():
    """Pin the measured-fastest configuration (docs/measurements/round3.md):
    full-window compute, no margin reuse — a silent default flip would
    regress 4096^2 by ~7.5%."""
    import inspect

    sig = inspect.signature(sk2.make_skew2d)
    assert sig.parameters["mnx"].default is None  # None -> _MX in the body
    assert sig.parameters["local_reuse"].default is False
    # the body's None resolution: building with defaults must produce the
    # full-window kernel — assert the resolved width directly via the
    # attributes make_skew2d pins on the chunk
    prepare, chunk = sk2.make_skew2d(
        96, 1024, 8, ny_global=96, omega=1.85,
        accel_w1=0.000055, accel_w2=0.000014, tile=(24, 256))
    assert chunk.mnx == sk2._MX
    assert chunk.sxw == 256 + 2 * sk2._MX
    assert chunk.local_reuse is False
    # _kernel itself must not carry a (stale-able) mnx default
    assert inspect.signature(sk2._kernel).parameters["mnx"].default \
        is inspect.Parameter.empty
