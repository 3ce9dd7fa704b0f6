"""Tolerance-tier gates for the production pair-symmetric equilibrium.

The pair-symmetric form (core/physics.equilibrium, VERDICT r1 item 3a) saves
~10% of per-cell flops but compiles to different FMA contractions than the
canonical form, so it cannot be bitwise-gated against the jnp oracle. These
tests gate it instead by (a) algebraic equivalence at f64, (b) f32 tolerance
differentials of the production kernels vs the oracle, and (c) the reference
golden 1% gate on a prefix of the official 128x128 deck.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core import physics
from tpulbm.core.state import initial_state
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import make_runner
from tpulbm.ops.step_jnp import run_steps


def test_pair_symmetric_matches_canonical_equilibrium():
    rng = np.random.RandomState(7)
    dens = jnp.asarray(rng.uniform(0.05, 0.2, (16, 128)).astype(np.float32))
    m_x = jnp.asarray(rng.uniform(-0.02, 0.02, (16, 128)).astype(np.float32))
    m_y = jnp.asarray(rng.uniform(-0.02, 0.02, (16, 128)).astype(np.float32))
    densinv = 1.0 / dens
    u_sq = m_x * m_x + m_y * m_y
    ref = physics.equilibrium(dens, densinv, m_x, m_y, u_sq, False)
    sym = physics.equilibrium(dens, densinv, m_x, m_y, u_sq, True)
    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(sym[k]), np.asarray(ref[k]), rtol=2e-6, atol=1e-9
        )
    # exact at f64: the two forms are the same algebra (numpy arrays keep
    # the computation in float64 — physics is backend-agnostic)
    args64 = [np.asarray(a, np.float64) for a in
              (dens, densinv, m_x, m_y, u_sq)]
    ref64 = physics.equilibrium(*args64, False)
    sym64 = physics.equilibrium(*args64, True)
    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(sym64[k]), np.asarray(ref64[k]), rtol=1e-13
        )


@pytest.mark.parametrize("n_dev", [1, 4])
def test_production_kernels_vs_oracle_tolerance(params_128, n_dev):
    """The kernels in their production (pair-symmetric) configuration stay
    within f32 rounding of the canonical oracle over 48 steps."""
    params, mask = params_128
    n = 48
    f_ref, av_ref = run_steps(
        initial_state(params), jnp.asarray(mask), params, n
    )
    runner = make_runner(params, n, mesh=get_mesh(n_devices=n_dev),
                         backend="pallas")
    f, av = runner(initial_state(params), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_ref), rtol=5e-5)


def test_production_kernels_golden_prefix(params_128):
    """Reference checker semantics (1% max elementwise diff) on a 256-step
    prefix of the official deck, production kernel config."""
    params, mask = params_128
    n = 256
    runner = make_runner(params, n, mesh=get_mesh(n_devices=4),
                         backend="pallas")
    _, av = runner(initial_state(params), jnp.asarray(mask))
    golden = np.loadtxt(
        os.path.join("/root/repo/tests/goldens", "128x128.av_vels.dat"),
        usecols=[1], max_rows=n,
    )
    diff_pcnt = 100.0 * np.abs(np.asarray(av) - golden) / golden
    assert np.all(np.isfinite(diff_pcnt)) and diff_pcnt.max() < 1.0
