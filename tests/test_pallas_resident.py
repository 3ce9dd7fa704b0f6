"""VMEM-resident multi-step kernel: differential tests vs the jnp oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_resident_runner, make_runner
from tpulbm.ops import pallas_resident
from tpulbm.ops.step_jnp import run_steps


@pytest.mark.parametrize("k_chunk", [23, 8, 5])
def test_resident_matches_oracle_bitwise(params_128, k_chunk):
    """Whole-grid-in-VMEM stepping (incl. scan-of-chunks + remainder call)
    reproduces the oracle bitwise."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 23
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_resident_runner(params, n, k_chunk=k_chunk)
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-6)
    assert av.shape == (n,)


@pytest.mark.smoke
def test_runner_auto_selects_resident_for_small_grids(params_128):
    """backend='pallas' on a 1-device mesh routes small grids through the
    resident kernel and still matches the oracle."""
    params, mask = params_128
    assert pallas_resident.supported(params.ny, params.nx)
    obst = jnp.asarray(mask)
    n = 12
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = make_runner(params, n, mesh=get_mesh(n_devices=1),
                         backend="pallas")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-6)


def test_resident_hbm_matches_oracle_bitwise():
    """The HBM-edge variant (supported_hbm: ping-pong pair only in VMEM —
    raises the resident ceiling past the 4-copy gate, e.g. 256x512) is
    bitwise vs the oracle, incl. the odd remainder chunk."""
    from tpulbm.core.params import LBMParams

    p = LBMParams(nx=512, ny=256, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(7)
    mask = rng.rand(256, 512) < 0.1
    p = p.with_free_cells(256 * 512 - int(mask.sum()))
    assert pallas_resident.supported_hbm(p.ny, p.nx)
    obst = jnp.asarray(mask)
    n = 13
    f_ref, av_ref = run_steps(initial_state(p), obst, p, n)
    runner = _make_resident_runner(p, n, k_chunk=5)
    f, av = runner(initial_state(p), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-6)


@pytest.mark.smoke
def test_supported_predicate():
    assert pallas_resident.supported(128, 128)
    assert pallas_resident.supported(256, 256)
    # 256x512 = 131K cells needs 4 state copies = ~19 MB VMEM — must be
    # routed past the 4-copy kernel (regression: OOM'd at the old 160K cap);
    # the HBM-edge variant takes it instead
    assert not pallas_resident.supported(256, 512)
    assert pallas_resident.supported_hbm(256, 512)
    assert not pallas_resident.supported_hbm(256, 256)   # 4-copy tier's
    assert not pallas_resident.supported_hbm(512, 512)   # past ~180K cells
    assert not pallas_resident.supported(1024, 1024)  # too big for VMEM
    assert not pallas_resident.supported(128, 100)    # lane misaligned
    assert not pallas_resident.supported(100, 128)    # sublane misaligned


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    """Bitwise kernel-vs-oracle differentials run the canonical equilibrium
    form; the production pair-symmetric config is tolerance-gated in
    test_pair_symmetric.py (see core/physics.equilibrium)."""
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)
