"""Backend tier selection in make_runner.

The perf tiering (resident -> skew -> skew2d -> kstep -> kstep2d -> stream
-> jnp) is pure logic; these tests pin which tier each configuration routes
to, and that the 'auto'/'pallas'/'jnp' requests and error paths behave."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulbm.core.params import LBMParams
from tpulbm.dist import runner as runner_mod
from tpulbm.dist.mesh import get_mesh
from tpulbm.ops import (pallas_kstep, pallas_kstep2d, pallas_kstep_skew,
                        pallas_kstep_skew2d, pallas_resident)


def _no_skew(monkeypatch):
    """Disable the skew-family tiers (1-D, fold, 2-D) to pin the classic
    tier order below them."""
    from tpulbm.ops import pallas_kstep_skew_fold

    monkeypatch.setattr(pallas_kstep_skew, "supported",
                        lambda h, nx, k: False)
    monkeypatch.setattr(pallas_kstep_skew_fold, "pick_fold",
                        lambda ny, nx, k=8: None)
    monkeypatch.setattr(pallas_kstep_skew2d, "supported",
                        lambda h, nx, k: False)


def _params(nx=128, ny=128):
    return LBMParams(nx=nx, ny=ny, max_iters=8, reynolds_dim=10,
                     density=0.1, accel=0.005, omega=1.85).with_free_cells(
                         nx * ny)


def _spy(monkeypatch):
    calls = {}

    def wrap(name, fn):
        def inner(*a, **k):
            calls[name] = calls.get(name, 0) + 1
            return fn(*a, **k)
        return inner

    monkeypatch.setattr(
        runner_mod, "_make_resident_runner",
        wrap("resident", runner_mod._make_resident_runner),
    )
    monkeypatch.setattr(
        runner_mod, "_make_kstep_runner",
        wrap("kstep", runner_mod._make_kstep_runner),
    )
    monkeypatch.setattr(
        runner_mod, "_make_skew_runner",
        wrap("skew", runner_mod._make_skew_runner),
    )
    return calls


def test_small_grid_single_device_uses_resident(monkeypatch):
    calls = _spy(monkeypatch)
    runner_mod.make_runner(_params(), 8, get_mesh(n_devices=1),
                           backend="pallas")
    assert calls == {"resident": 1}


def test_multi_device_uses_kstep(monkeypatch):
    calls = _spy(monkeypatch)
    runner_mod.make_runner(_params(), 8, get_mesh(n_devices=4),
                           backend="pallas")
    assert calls == {"kstep": 1}


def test_large_grid_routes_to_skew_then_kstep(monkeypatch):
    calls = _spy(monkeypatch)
    monkeypatch.setattr(pallas_resident, "supported", lambda ny, nx: False)
    runner_mod.make_runner(_params(), 8, get_mesh(n_devices=1),
                           backend="pallas")
    assert calls == {"skew": 1}

    # skew tiers gated off -> classic kstep
    calls.clear()
    _no_skew(monkeypatch)
    runner_mod.make_runner(_params(), 8, get_mesh(n_devices=1),
                           backend="pallas")
    assert calls == {"kstep": 1}


def test_wide_grid_routes_to_fold_before_skew2d(monkeypatch):
    """Wide single-device grids in the foldable family ride the lane-folded
    skew (r5: +9.1%/+6.8% device over the 2-D tiled skew at 2048²/4096²);
    (48, 2048) folds to (96, 1024) at F=2. Multi-device keeps the sharded
    tiers (the fold runner is single-device)."""
    from tpulbm.ops import pallas_kstep_skew_fold

    built = []
    monkeypatch.setattr(
        pallas_kstep_skew_fold, "make_fold_runner",
        lambda *a, **k: built.append(True) or (lambda f, o: (f, None)),
    )
    monkeypatch.setattr(pallas_resident, "supported", lambda ny, nx: False)
    monkeypatch.setattr(pallas_resident, "supported_hbm",
                        lambda ny, nx: False)
    p = _params(nx=2048, ny=48)
    assert pallas_kstep_skew_fold.pick_fold(48, 2048) == 2
    runner_mod.make_runner(p, 16, get_mesh(n_devices=1), backend="pallas")
    assert built == [True]

    # a 2-device mesh never takes the fold even for a foldable global
    # shape (the fold runner is single-device; sharded tiers keep it)
    built.clear()
    runner_mod.make_runner(p, 16, get_mesh(n_devices=2), backend="pallas")
    assert built == []


def test_wide_grid_routes_to_kstep2d_then_bands(monkeypatch):
    """Wide grids prefer the row-major 2-D tiling (fastest in every
    hardware window measured — docs/measurements/round2.md); the band-major
    tier is the fallback when kstep2d can't take the shape."""
    import tpulbm.ops.pallas_kstep_bands as pallas_kstep_bands

    calls = _spy(monkeypatch)
    monkeypatch.setattr(pallas_resident, "supported", lambda ny, nx: False)
    monkeypatch.setattr(pallas_kstep, "supported", lambda h, nx, k: False)
    _no_skew(monkeypatch)
    makers = []
    orig = runner_mod._make_kstep_runner

    def capture(*a, **k):
        makers.append(k.get("maker"))
        return orig(*a, **k)

    monkeypatch.setattr(runner_mod, "_make_kstep_runner", capture)
    runner_mod.make_runner(_params(nx=256, ny=256), 8, get_mesh(n_devices=1),
                           backend="pallas")
    assert makers == [pallas_kstep2d.make_kstep2d]

    # kstep2d unsupported -> band-major fallback
    monkeypatch.setattr(pallas_kstep2d, "supported", lambda h, nx, k: False)
    bands_built = []
    orig_bands = runner_mod._make_kstep_bands_runner

    def capture_bands(*a, **k):
        bands_built.append(True)
        return orig_bands(*a, **k)

    monkeypatch.setattr(runner_mod, "_make_kstep_bands_runner", capture_bands)
    runner_mod.make_runner(_params(nx=256, ny=256), 8, get_mesh(n_devices=1),
                           backend="pallas")
    assert bands_built == [True]


def test_unsupported_shape_falls_back_or_raises():
    # nx=100 is no longer unsupported on pallas (round-3 x extension takes
    # it); nx=50 can't lane-pad (mirror would wrap twice: padx=78 >= nx)
    bad = LBMParams(nx=50, ny=64, max_iters=4, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85).with_free_cells(3200)
    # auto silently falls back to jnp and still runs
    r = runner_mod.make_runner(bad, 2, get_mesh(n_devices=1), backend="auto")
    from tpulbm.core.state import initial_state

    f, av = r(initial_state(bad), jnp.zeros((64, 50), dtype=bool))
    assert np.all(np.isfinite(np.asarray(av)))
    # explicit pallas raises
    with pytest.raises(ValueError, match="unsupported"):
        runner_mod.make_runner(bad, 2, get_mesh(n_devices=1),
                               backend="pallas")
