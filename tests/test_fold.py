"""Lane-fold layout (ops/fold.py): folded evolution is bitwise the unfolded
one. The fold is a free reshape; these tests pin the index algebra (strip
carries on the x-wrap lanes, the F-row accel band) against the production
jnp oracle before any kernel uses it (round-5 verdict item 2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulbm.core.params import LBMParams
from tpulbm.ops import fold, step_jnp


def _problem(ny, nx, seed=0):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < 0.1
    # keep the accelerated row's knife-edge guard exercised but not empty
    mask[params.accel_row, :: 7] = True
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    f = jnp.asarray(
        rng.uniform(0.01, 0.2, size=(9, ny, nx)).astype(np.float32))
    return params, f, jnp.asarray(mask)


def test_fold_unfold_roundtrip():
    _, f, _ = _problem(16, 256)
    g = fold.fold(f, 2)
    assert g.shape == (9, 32, 128)
    np.testing.assert_array_equal(np.asarray(fold.unfold(g, 2)), np.asarray(f))
    # the fold is the identity on the raw buffer (row-major): strips of one
    # row are contiguous
    np.testing.assert_array_equal(
        np.asarray(f).reshape(9, 32, 128), np.asarray(g))


@pytest.mark.parametrize("ny,nx,F", [(16, 256, 2), (8, 512, 4), (8, 1024, 8),
                                     (12, 384, 3)])
def test_folded_step_bitwise(ny, nx, F):
    params, f, mask = _problem(ny, nx)
    g = fold.fold(f, F)
    mask_g = fold.fold(mask, F)

    f_ref, av_ref = f, []
    g_out, av_fold = g, []
    for _ in range(8):
        f_ref, av = step_jnp.lbm_step(f_ref, mask, params)
        av_ref.append(float(av))
        g_out, avf = fold.lbm_step_folded(g_out, mask_g, params, F)
        av_fold.append(float(avf))

    np.testing.assert_array_equal(
        np.asarray(fold.unfold(g_out, F)), np.asarray(f_ref))
    # the |u| SUM reduces in a different shape ((ny*F, W) vs (ny, nx)) —
    # same multiset of values, different f32 addition order
    np.testing.assert_allclose(
        np.float32(av_fold), np.float32(av_ref), rtol=1e-5)


def test_folded_step_f1_is_plain_step():
    params, f, mask = _problem(16, 128)
    a, av_a = step_jnp.lbm_step(f, mask, params)
    b, av_b = fold.lbm_step_folded(f, mask, params, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(av_a) == float(av_b)
