"""Lane-folded skewed K-step kernel (ops/pallas_kstep_skew_fold.py):
differentials vs the production jnp oracle — the UNFOLDED evolution
(round-5 verdict item 2).

Load-bearing cases:
- the fold seam: folded rows [-E, E) (block 0's missing-predecessor
  contamination AND the unwritten output tail) come from the unfolded-space
  fix kernel, spliced on both sides of the folded torus;
- the accelerated row ny-2 lies INSIDE the seam for every F > 1 (its folded
  band [hf-2F, hf-F) sits in [hf-E, hf)), so every case exercises the fix's
  accel path; the main kernel's valid region never reads the accel rows'
  intermediate values at F >= 2 (dependence cone grows F rows/step upward,
  E - 8F = 8F - 8 >= 8 rows short);
- donor-aliased ping-pong, the odd head chunk, and the jnp-folded remainder;
- multi-block slab handoff with the strip-carry x-wrap re-aims (F > 1).

State is gated BITWISE on hardware (scripts/tpu_smoke.py fold configs); on
the CPU interpreter it is gated at a few-ULP absolute tolerance — the
interpreter's XLA:CPU lowering of the fix band's fused accel+collide chain
rounds isolated accel-row cells one ULP off the oracle while the compiled
Mosaic kernel is bitwise (measured r5: (96,256) F=2 n=16, ONE cell,
channels 1/3, |d| = 2^-30; docs/VALIDATION.md §4 divergence registry).
The |u| series reduces in folded shape + block order (same multiset,
different f32 addition order) and is gated at the same rtol as every
tiled kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.ops import pallas_kstep_skew_fold as pkf
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
    r = pkf.make_fold_runner(p, n, **kw)
    f, av = r(initial_state(p), obst)
    if jax.devices()[0].platform == "cpu":
        # interpreter-lowering ULP tolerance (module docstring / VALIDATION
        # §4); hardware stays bitwise via make tpu-smoke
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(f_ref), rtol=0, atol=4e-9)
    else:
        assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n,)


@pytest.mark.parametrize("ny,nx,F,n", [
    # F=2 single chunk, plain — kept in the default gate (smoke)
    pytest.param(48, 256, 2, 8, marks=pytest.mark.smoke),
    (48, 256, 2, 16),    # one ping-pong pair
    (48, 256, 2, 27),    # odd head + ping-pong + jnp-folded remainder
    (64, 512, 4, 16),    # F=4: deeper slide/slab, wider strip carries
    (64, 128, 1, 16),    # F=1 replica of the skew schedule (no strip carry)
])
def test_fold_matches_oracle(ny, nx, F, n):
    p, obst = _random_case(ny, nx)
    _run_and_compare(p, obst, n, F=F)


def test_fold_multiblock():
    """Small explicit BY forces 8 blocks: the slab handoff chains through
    interior blocks and collide_split stays bitwise."""
    p, obst = _random_case(96, 256, seed=11)
    _run_and_compare(p, obst, 16, F=2, by=24, collide_split=2)


@pytest.mark.parametrize("ny,nx,F,n,n_dev", [
    pytest.param(96, 256, None, 16, 2, marks=pytest.mark.smoke),
    (192, 256, None, 16, 4),  # band slabs chain through interior shards
    (96, 256, None, 24, 2),   # odd head chunk + ping-pong
    (128, 512, 4, 16, 2),     # F=4: deeper slabs/splices across the ring
])
def test_fold_ring_matches_oracle(ny, nx, F, n, n_dev):
    """Multi-device fold: each shard's seam fix doubles as the shard
    boundary (band slab forward, fix-output slab backward); the global
    accel row resolves through any shard via hf_global wrap arithmetic."""
    from tpulbm.dist import runner as runner_mod
    from tpulbm.dist.mesh import get_mesh

    p, obst = _random_case(ny, nx)
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    r = runner_mod._make_fold_ring_runner(
        p, n, get_mesh(n_devices=n_dev), F=F)
    f, av = r(initial_state(p), obst)
    if jax.devices()[0].platform == "cpu":
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(f_ref), rtol=0, atol=4e-9)
    else:
        assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_fold_ring_routing(monkeypatch):
    """make_runner routes a multi-device foldable grid with K-multiple
    steps to the fold ring; a sub-K-multiple step count falls through
    (the folded jnp remainder is single-device-only)."""
    from tpulbm.dist import runner as runner_mod
    from tpulbm.dist.mesh import get_mesh

    built = []
    monkeypatch.setattr(
        runner_mod, "_make_fold_ring_runner",
        lambda *a, **k: built.append(True) or (lambda f, o: (f, None)),
    )
    p, _ = _random_case(96, 2048)  # folds to (96, 1024) per shard at F=2
    import tpulbm.ops.pallas_kstep_skew_fold as pkf

    assert pkf.pick_fold_ring(96, 2048, 2) == 2
    runner_mod.make_runner(p, 16, get_mesh(n_devices=2), backend="pallas")
    assert built == [True]
    built.clear()
    runner_mod.make_runner(p, 20, get_mesh(n_devices=2), backend="pallas")
    assert built == []


@pytest.mark.smoke
def test_remainder_keeps_chunk_formulation(monkeypatch):
    """The sub-K jnp remainder must use the SAME equilibrium formulation as
    the kernel chunks (production = pair-symmetric), never mixing forms
    step-to-step within one run (r5 review finding)."""
    from tpulbm.ops import fold as fold_mod
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", True)
    p, obst = _random_case(48, 256)
    r = pkf.make_fold_runner(p, 3, F=2)   # n < K: pure jnp remainder
    f, av = r(initial_state(p), obst)

    def ref(ps):
        # identically-structured jitted scan (compilation context changes
        # f32 rounding, so an eager loop is NOT bitwise against the scan)
        import jax

        @jax.jit
        def run(g, og):
            def body(gc, _):
                g2, av1 = fold_mod.lbm_step_folded(
                    gc, og, p, 2, pair_symmetric=ps)
                return g2, av1

            g_out, _ = jax.lax.scan(body, g, None, length=3)
            return fold_mod.unfold(g_out, 2)

        return np.asarray(
            run(fold_mod.fold(initial_state(p), 2), fold_mod.fold(obst, 2)))

    assert np.array_equal(np.asarray(f), ref(True))
    assert not np.array_equal(np.asarray(f), ref(False))


@pytest.mark.smoke
def test_supported_predicate():
    # the A/B targets: wide decks fold onto the 1-D window budget
    assert pkf.supported(2048, 2048, 2)
    assert pkf.supported(4096, 4096, 4)
    # 8192^2 cannot fold: F=8's 30-row slab exceeds any admissible BY
    # inside the 61440 budget (module docstring)
    assert pkf.pick_fold(8192, 8192) is None
    assert not pkf.supported(2048, 2048, 3)   # F must divide 8 (m integer)
    assert not pkf.supported(2048, 2000, 2)   # folded width lane-misaligned
    assert not pkf.supported(16, 256, 2)      # fix band can't fit the torus
    assert pkf.pick_fold(2048, 2048) == 2
    assert pkf.pick_fold(4096, 4096) == 4


@pytest.mark.smoke
def test_fold_fix_geometry():
    # folded seam [-E, E) is exactly unfolded [-m, m): E = K*(2F-1) = m*F
    for F in (1, 2, 4, 8):
        assert pkf.fix_band_half(F) * F == pkf.FOLD_K * pkf.slide(F)
