"""In-kernel RDMA halo-exchange kernel: differential tests vs the oracle.

The kernel exchanges 8-row halo slabs with make_async_remote_copy inside the
step kernel (interior blocks compute while slabs are in flight; edge blocks
wait on receive semaphores), with parity-slotted landing buffers across outer
iterations. Interpret mode emulates the remote copies on the virtual CPU
mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpulbm.ops.pallas_kstep_rdma as pkr
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import make_runner
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _pin_kstep_rdma_tier(monkeypatch):
    """These shapes now prefer the VMEM-resident RDMA tier
    (test_pallas_resident_rdma.py); pin the kstep-RDMA kernel under test."""
    from tpulbm.ops import pallas_resident_rdma

    monkeypatch.setattr(pallas_resident_rdma, "supported",
                        lambda *a, **k: False)


@pytest.mark.parametrize("n_dev,n_steps", [
    (2, 16),   # exact outer chunks
    (8, 19),   # remainder path (ppermute fallback for the tail)
    (8, 35),   # several outer iterations -> parity slot rotation
])
def test_rdma_runner_matches_oracle(params_128, n_dev, n_steps):
    params, mask = params_128
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n_steps)
    runner = make_runner(params, n_steps, get_mesh(n_devices=n_dev),
                         backend="pallas-rdma")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.smoke
def test_rdma_single_device_falls_back(params_128, capsys):
    """Unsupported rdma shapes fall back to the ppermute runner with a
    warning instead of raising (r1 review item 8)."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 10
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = make_runner(params, n, get_mesh(n_devices=1),
                         backend="pallas-rdma")
    err = capsys.readouterr().err
    assert "falling back" in err
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


@pytest.mark.parametrize("n_steps", [5, 8])
def test_rdma_short_runs_native(params_128, n_steps):
    """n_steps <= 8 runs the rdma kernel natively with K = n_steps (the RDMA
    slab stays the aligned 8-row margin; the kernel value-slices the needed
    K halo rows)."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n_steps)
    runner = make_runner(params, n_steps, get_mesh(n_devices=2),
                         backend="pallas-rdma")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
    assert av.shape == (n_steps,)


@pytest.mark.smoke
def test_supported_predicate():
    assert pkr.supported(128, 128, 8, 2)
    assert pkr.supported(128, 128, 4, 2)       # variable K <= margin
    assert not pkr.supported(128, 128, 9, 2)
    assert not pkr.supported(128, 128, 8, 1)   # needs a ring
    assert not pkr.supported(128, 100, 8, 2)
    assert not pkr.supported(20, 128, 8, 2)    # h must be 8-row aligned


def test_rdma_reordered_multiblock_schedule(params_128, monkeypatch):
    """Shards with >= 3 blocks take the interior-first reordered grid (edge
    blocks processed last so RDMA slabs hide behind interior compute) —
    single-block shards never exercise block_of()."""
    import tpulbm.ops.pallas_kstep as pk

    monkeypatch.setattr(pk, "_BLOCK_BUDGET", 24 * 128)  # 8-row blocks
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 16
    from tpulbm.core.state import initial_state as init
    from tpulbm.ops.step_jnp import run_steps as rs

    f_ref, av_ref = rs(init(params), obst, params, n)
    for n_dev in (2, 4):
        runner = make_runner(params, n, get_mesh(n_devices=n_dev),
                             backend="pallas-rdma")
        f, av = runner(init(params), obst)
        assert np.array_equal(np.asarray(f), np.asarray(f_ref)), n_dev
        np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref),
                                   rtol=2e-5)


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    """Bitwise kernel-vs-oracle differentials run the canonical equilibrium
    form; the production pair-symmetric config is tolerance-gated in
    test_pair_symmetric.py (see core/physics.equilibrium)."""
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)
