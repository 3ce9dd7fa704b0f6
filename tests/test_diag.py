import jax.numpy as jnp
import numpy as np

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.diag.observables import (
    av_velocity,
    calc_reynolds,
    output_fields,
    total_density,
)
from tpulbm.io.writers import final_state_fields
from tpulbm.ops.step_jnp import run_steps


def _case():
    p = LBMParams(nx=128, ny=32, max_iters=50, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(7)
    mask = rng.rand(32, 128) < 0.1
    p = p.with_free_cells(32 * 128 - int(mask.sum()))
    f, _ = run_steps(initial_state(p), jnp.asarray(mask), p, 50)
    return p, f, jnp.asarray(mask)


def test_output_fields_match_numpy_writer_path():
    p, f, obst = _case()
    dev = [np.asarray(a) for a in output_fields(f, obst, p.density)]
    host = final_state_fields(np.asarray(f), np.asarray(obst), p)
    for d, h in zip(dev, host):
        np.testing.assert_allclose(d, h, rtol=1e-6, atol=1e-7)


def test_reynolds_consistent_with_av_velocity():
    p, f, obst = _case()
    av = float(av_velocity(f, obst, p))
    re = float(calc_reynolds(f, obst, p))
    np.testing.assert_allclose(re, av * p.reynolds_dim / p.viscosity, rtol=1e-6)


def test_total_density_equals_mass():
    p, f, obst = _case()
    np.testing.assert_allclose(
        float(total_density(f)), 0.1 * 32 * 128, rtol=1e-4
    )
