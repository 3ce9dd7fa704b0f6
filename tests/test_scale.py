"""Scale demonstration: the SURVEY north-star configuration — a 4096x4096
grid sharded over an 8-device mesh — compiles and steps correctly (virtual
CPU mesh; the real-chip numbers live in BENCHMARKS.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.diag.observables import total_density
from tpulbm.dist.mesh import get_mesh
from tpulbm.dist.runner import make_runner
from tpulbm.dist.sharding import shard_arrays
from tpulbm.tools.make_deck import box_obstacles


def test_4096_sharded_over_8_devices():
    ny = nx = 4096
    params = LBMParams(nx=nx, ny=ny, max_iters=2, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = box_obstacles(ny, nx)
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    mesh = get_mesh(n_devices=8)
    runner = make_runner(params, 2, mesh=mesh, backend="jnp")
    f, obst = shard_arrays(mesh, initial_state(params), jnp.asarray(mask))
    # state is genuinely sharded across the mesh
    assert len(f.sharding.device_set) == 8
    m0 = float(total_density(f))
    f, av = runner(f, obst)
    jax.block_until_ready(f)
    assert av.shape == (2,)
    assert np.all(np.isfinite(np.asarray(av))) and np.asarray(av)[0] > 0
    np.testing.assert_allclose(float(total_density(f)), m0, rtol=1e-4)
    assert len(f.sharding.device_set) == 8
