import numpy as np

from tpulbm.core import lattice
from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state


def test_lattice_invariants():
    assert lattice.NSPEEDS == 9
    for k in range(9):
        o = lattice.OPP[k]
        assert lattice.CX[o] == -lattice.CX[k]
        assert lattice.CY[o] == -lattice.CY[k]
    assert abs(float(lattice.WEIGHTS.sum()) - 1.0) < 1e-6


def test_initial_state_equilibrium_at_rest():
    p = LBMParams(nx=16, ny=8, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    f = np.asarray(initial_state(p))
    assert f.shape == (9, 8, 16)
    assert f.dtype == np.float32
    w0 = np.float32(0.1) * np.float32(4.0) / np.float32(9.0)
    w1 = np.float32(0.1) / np.float32(9.0)
    w2 = np.float32(0.1) / np.float32(36.0)
    assert np.all(f[0] == w0)
    for k in (1, 2, 3, 4):
        assert np.all(f[k] == w1)
    for k in (5, 6, 7, 8):
        assert np.all(f[k] == w2)
    # Total mass is ny*nx*density.
    np.testing.assert_allclose(f.sum(), 0.1 * 8 * 16, rtol=1e-5)


def test_params_derived():
    p = LBMParams(nx=128, ny=128, max_iters=40000, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    # viscosity = (2/omega - 1)/6 (d2q9-bgk.c:1005)
    assert abs(p.viscosity - (2.0 / 1.85 - 1.0) / 6.0) < 1e-6
    assert p.accel_row == 126
    assert abs(p.accel_w1 - 0.1 * 0.005 / 9.0) < 1e-9
    assert abs(p.accel_w2 - 0.1 * 0.005 / 36.0) < 1e-9
    p2 = p.with_free_cells(15876)
    assert abs(p2.free_cells_inv - 1.0 / 15876) < 1e-9


def test_fully_blocked_grid_rejected():
    import pytest

    p = LBMParams(nx=8, ny=8, max_iters=1, reynolds_dim=10,
                  density=0.1, accel=0.005, omega=1.85)
    with pytest.raises(ValueError, match="blocks every cell"):
        p.with_free_cells(0)
