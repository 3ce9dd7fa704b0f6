"""Hand-rolled fuzzing of the deck parsers: every malformed input must raise
the framework's typed errors (never crash with an unrelated exception or
silently succeed), and every valid input must round-trip."""

import numpy as np
import pytest

from tpulbm.io.obstacles import ObstacleFileError, read_obstacles, write_obstacles
from tpulbm.io.params_file import ParamFileError, read_params, write_params
from tpulbm.core.params import LBMParams


BAD_PARAM_DECKS = [
    "",                                  # empty
    "128\n",                             # too few values
    "a b c d e f g\n",                   # non-numeric
    "128 128 10 10 0.1 0.005\n",         # six values
    "12.5\n128\n10\n10\n0.1\n0.005\n1.85\n",  # float where int expected
]


@pytest.mark.parametrize("content", BAD_PARAM_DECKS)
def test_param_parser_rejects_garbage(tmp_path, content):
    p = tmp_path / "deck.params"
    p.write_text(content)
    with pytest.raises(ParamFileError):
        read_params(p)


def test_param_parser_tolerates_extra_whitespace(tmp_path):
    p = tmp_path / "deck.params"
    p.write_text("  128\t128\n\n40000 10\n0.1   0.005\n1.85  \n")
    params = read_params(p)
    assert (params.nx, params.ny, params.omega) == (128, 128, 1.85)


BAD_OBSTACLE_FILES = [
    "1 2\n",            # two values on a line
    "1 2 3 4\n",        # four values (reflows to wrong triple count)
    "x y 1\n",          # non-numeric
    "-1 0 1\n",         # negative x
    "0 -1 1\n",         # negative y
    "99 0 1\n",         # x out of range for an 8-wide grid
    "0 99 1\n",         # y out of range
    "0 0 0\n",          # blocked must be 1
    "0 0 2\n",
]


@pytest.mark.parametrize("content", BAD_OBSTACLE_FILES)
def test_obstacle_parser_rejects_garbage(tmp_path, content):
    p = tmp_path / "obst.dat"
    p.write_text(content)
    with pytest.raises((ObstacleFileError, ValueError)):
        read_obstacles(p, 8, 8)


def test_random_roundtrips(tmp_path):
    rng = np.random.RandomState(42)
    for trial in range(20):
        nx = int(rng.choice([1, 7, 16, 33]))
        ny = int(rng.choice([1, 5, 24]))
        mask = rng.rand(ny, nx) < rng.rand()
        opath = tmp_path / f"o{trial}.dat"
        write_obstacles(opath, mask)
        mask2, num_free = read_obstacles(opath, nx, ny)
        assert np.array_equal(mask, mask2)
        assert num_free == mask.size - mask.sum()

        params = LBMParams(
            nx=nx, ny=ny, max_iters=int(rng.randint(1, 99999)),
            reynolds_dim=int(rng.randint(1, 100)),
            density=float(np.float32(rng.rand() + 0.01)),
            accel=float(np.float32(rng.rand() * 0.1)),
            omega=float(np.float32(rng.rand() + 0.5)),
        )
        ppath = tmp_path / f"p{trial}.params"
        write_params(ppath, params)
        p2 = read_params(ppath)
        assert (p2.nx, p2.ny, p2.max_iters, p2.reynolds_dim) == (
            params.nx, params.ny, params.max_iters, params.reynolds_dim
        )
        assert abs(p2.omega - params.omega) < 1e-9
