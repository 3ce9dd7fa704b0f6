"""Row-merged skewed K-step runner (ops/pallas_kstep_merge.py):
differentials vs the production jnp oracle — the PHYSICAL evolution
(round-5 verdict item 6, the unaligned-deck layout escape).

Load-bearing cases:
- the merged stencil's three pieces per channel (combined lane roll,
  boundary-block row carry, per-block x-wrap lane patches) under the
  skew schedule's +1 realignment AND the classic in-kernel seam fix;
- the accelerated row's block-column restriction (global row ny-2 is one
  nx-wide block range of one merged row — the rest of that merged row
  must NOT accelerate);
- donor-aliased ping-pong, the odd head chunk, and the jnp-merged
  remainder;
- G in {2, 4, 8} incl. the 320-lane class the tier exists for.

State is gated BITWISE (the merge is pure data movement; hardware gate:
scripts/tpu_smoke.py merge configs); the |u| series reduces in merged
shape (same multiset, different f32 addition order) at the tiled rtol.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.ops import pallas_kstep_merge as pkm
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


def _run_and_compare(p, obst, n, **kw):
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = pkm.make_merge_runner(p, n, **kw)
    f, av = r(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n,)


@pytest.mark.parametrize("ny,nx,G,n", [
    # G=2 ping-pong pair — kept in the default gate (smoke)
    pytest.param(96, 192, 2, 16, marks=pytest.mark.smoke),
    (96, 192, 2, 27),    # odd head + ping-pong + jnp-merged remainder
    (96, 320, 2, 16),    # the 320-lane class: (48, 640) merged
    (192, 96, 4, 16),    # G=4: four-block patches, accel block 2
    (384, 48, 8, 16),    # G=8: deepest merge, W=384
])
def test_merge_matches_oracle(ny, nx, G, n):
    p, obst = _random_case(ny, nx)
    _run_and_compare(p, obst, n, G=G)


def test_merge_multiblock():
    """by=24 forces 4 blocks at h=96: the slab handoff chains through
    interior blocks and collide_split stays bitwise."""
    p, obst = _random_case(192, 192, seed=11)
    _run_and_compare(p, obst, 16, G=2, by=24, collide_split=2)


@pytest.mark.smoke
def test_supported_predicate():
    # the tier's targets: the 128-multiple-offset classes
    assert pkm.pick_merge(320, 320) == 2
    assert pkm.pick_merge(448, 448) == 2
    assert pkm.pick_merge(384, 160) == 4    # nx % 32 == 0 class
    assert pkm.pick_merge(160, 160) is None  # merged h=40 < the skew's
    # minimum block range (by >= 24, h//by >= 2)
    assert pkm.pick_merge(128, 128) is None  # aligned: plain tiers win
    assert pkm.pick_merge(1024, 1024) is None
    assert pkm.pick_merge(50, 64) is None   # ny too short for the skew
    assert not pkm.supported(320, 320, 3)   # 960 lanes misaligned
    assert not pkm.supported(96, 100, 2)    # 200 lanes misaligned
