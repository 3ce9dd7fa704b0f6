import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.io.writers import write_final_state
from tpulbm.viz import load_final_state, plot_speed


def test_load_final_state_roundtrip(tmp_path):
    p = LBMParams(nx=8, ny=4, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85).with_free_cells(30)
    rng = np.random.RandomState(0)
    f = (0.1 + 0.01 * rng.rand(9, 4, 8)).astype(np.float32)
    obst = rng.rand(4, 8) < 0.2
    path = tmp_path / "final_state.dat"
    write_final_state(path, f, obst, p)
    u_x, u_y, u, pressure, o = load_final_state(str(path))
    assert u.shape == (4, 8)
    assert np.array_equal(o.astype(bool), obst)
    np.testing.assert_allclose(np.sqrt(u_x**2 + u_y**2), u, atol=1e-6)
    assert np.all(u[obst] == 0)


def test_plot_speed(tmp_path):
    pytest.importorskip("matplotlib")
    u = np.random.RandomState(1).rand(16, 32)
    out = plot_speed(u, str(tmp_path / "v.png"))
    import os
    assert os.path.getsize(out) > 1000
