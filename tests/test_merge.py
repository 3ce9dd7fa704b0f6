"""Row-merge layout (ops/fold.py merge family): merged evolution is bitwise
the physical one. The merge is a free reshape; these tests pin the index
algebra (the combined CY*nx + CX lane roll, the boundary-block row select,
the per-block x-wrap lane patches, the one-block accel range) against the
production jnp oracle before any kernel uses it (round-5 verdict item 6 —
the unaligned-deck layout escape: 320² merges to an exactly lane-aligned
(160, 640) grid with zero dead compute)."""

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


def test_merge_unmerge_roundtrip():
    _, f, _ = _problem(16, 160)
    m = fold.merge(f, 2)
    assert m.shape == (9, 8, 320)
    np.testing.assert_array_equal(np.asarray(fold.unmerge(m, 2)),
                                  np.asarray(f))
    # the merge is the identity on the raw buffer (row-major): G
    # consecutive physical rows are contiguous
    np.testing.assert_array_equal(
        np.asarray(f).reshape(9, 8, 320), np.asarray(m))


@pytest.mark.parametrize("ny,nx,G", [
    (16, 160, 2),    # the 320-class: nx % 128 = 32-multiple, G=2 aligns
    (16, 224, 2),    # the 448-class
    (16, 96, 4),     # deeper merge: boundary block G-1, multi-block patches
    (12, 64, 3),     # G that is not a power of two
    (8, 128, 1),     # G=1 degenerates to the plain step
])
def test_merged_step_bitwise(ny, nx, G):
    params, f, mask = _problem(ny, nx)
    m = fold.merge(f, G)
    mask_m = fold.merge(mask, G)

    f_ref, av_ref = f, []
    m_out, av_m = m, []
    for _ in range(8):
        f_ref, av = step_jnp.lbm_step(f_ref, mask, params)
        av_ref.append(float(av))
        m_out, avm = fold.lbm_step_merged(m_out, mask_m, params, G, nx)
        av_m.append(float(avm))

    np.testing.assert_array_equal(
        np.asarray(fold.unmerge(m_out, G)), np.asarray(f_ref))
    # the |u| SUM reduces in a different shape ((ny/G, W) vs (ny, nx)) —
    # same multiset of values, different f32 addition order
    np.testing.assert_allclose(
        np.float32(av_m), np.float32(av_ref), rtol=1e-5)


def test_accel_row_lands_in_one_block():
    """Global row ny-2 maps to merged row (ny-2)//G, block (ny-2)%G —
    every other cell of that merged row must be untouched by accelerate."""
    params, f, mask = _problem(16, 96)
    G, nx = 4, 96
    m = fold.merge(f, G)
    mask_m = fold.merge(mask, G)
    out = fold.accelerate_merged(m, mask_m, params, G, nx)
    y, s = params.accel_row // G, params.accel_row % G
    d = np.asarray(out) - np.asarray(m)
    changed = np.nonzero(d)
    assert set(changed[1].tolist()) <= {y}
    assert np.all(changed[2] >= s * nx) and np.all(changed[2] < (s + 1) * nx)
    # and it matches the physical accelerate bitwise
    ref = step_jnp.accelerate(f, mask, params)
    np.testing.assert_array_equal(np.asarray(fold.unmerge(out, G)),
                                  np.asarray(ref))
