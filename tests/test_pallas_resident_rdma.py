"""Multi-device VMEM-resident kernel: differential tests vs the oracle.

The shard stays in VMEM across many K-step iterations inside one kernel
call, with in-kernel RDMA edge-slab exchange per iteration (parity-slotted
landing buffers, continued across kernel calls via a base-parity scalar).
Load-bearing cases: multiple calls with odd per-call outer counts (the
cross-call parity handoff), remainder steps through the ppermute kstep
kernel, and the pallas-rdma dispatch preferring this tier for
VMEM-resident shards."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpulbm.ops.pallas_resident_rdma as prr
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import _make_resident_rdma_runner, make_runner
from tpulbm.ops.step_jnp import run_steps


@pytest.fixture(autouse=True)
def _canonical_feq(monkeypatch):
    from tpulbm.ops import window_step

    monkeypatch.setattr(window_step, "PAIR_SYMMETRIC_DEFAULT", False)


@pytest.mark.smoke
def test_supported_gate(params_128):
    params, _ = params_128
    assert prr.supported(64, 128, 8, 2)
    assert not prr.supported(64, 128, 8, 1)     # needs a ring
    assert not prr.supported(512, 512, 8, 2)    # shard too big for VMEM
    assert not prr.supported(60, 128, 8, 2)     # h % 8 != 0


@pytest.mark.parametrize("n_dev,n_steps", [
    (2, 16),    # two outer iterations in one call
    (4, 40),    # five outer iterations
    (8, 19),    # remainder tail through the ppermute kstep kernel
])
def test_resident_rdma_matches_oracle(params_128, n_dev, n_steps):
    params, mask = params_128
    obst = jnp.asarray(mask)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n_steps)
    runner = make_runner(params, n_steps, get_mesh(n_devices=n_dev),
                         backend="pallas-rdma")
    f, av = runner(initial_state(params), obst)
    assert np.array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_cross_call_parity_handoff(params_128):
    """Odd outer count per call: the base-parity scalar must continue the
    landing-slot alternation across kernel calls (5 calls x 3 outer)."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 8 * 15  # 15 outer iterations = 5 calls of 3 (odd -> parity flips)
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_resident_rdma_runner(
        params, n, get_mesh(n_devices=2), max_outer_per_call=3
    )
    f, av = runner(initial_state(params), obst)
    # Tolerance, not bitwise: the n_outer=3 instance is its own XLA-CPU
    # compilation and contracts FMAs differently from the oracle's (see the
    # test_kernel_fuzz docstring) — observed drift is ~1 ULP; a landing-slot
    # parity bug would deliver whole-step-stale halos, errors many orders
    # larger than this gate.
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)


def test_rem_outer_instance(params_128):
    """A trailing smaller-n_outer kernel instance (16 = 5x3 + 1) — a
    differently-shaped compilation, so XLA-CPU FMA contraction may drift a
    ULP (see test_kernel_fuzz docstring); tolerance-gated."""
    params, mask = params_128
    obst = jnp.asarray(mask)
    n = 8 * 16
    f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
    runner = _make_resident_rdma_runner(
        params, n, get_mesh(n_devices=2), max_outer_per_call=3
    )
    f, av = runner(initial_state(params), obst)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=2e-5)
