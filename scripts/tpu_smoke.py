"""TPU hardware smoke gate: one chunk of EVERY kernel tier on the real chip.

Round-3 verdict item 3: the default test gate runs kernels in CPU interpret
mode only, and interpret provably diverges from Mosaic (the offset-window
experiment was interpret-correct, hardware-rejected — commit 71a72e0). This
gate compiles and runs one short chunk of every single-device kernel tier on
the real TPU and tolerance-gates it against the jnp oracle running on the
same chip, so a hardware-only regression is caught without the full
acceptance decks. The reference's analog is ``make check`` running the real
binary (reference Makefile:19-20).

Tolerances are the production pair-symmetric gates from
tests/test_pair_symmetric.py (f: rtol 5e-5 / atol 1e-7; av: rtol 5e-5) —
the kernels run their production configuration, not the bitwise test one.

Multi-device tiers (RDMA, rings, torus) need >= 2 chips and are covered by
``__graft_entry__.dryrun_multichip`` (virtual mesh) and the Mosaic-lowering
HLO export test (tests/test_hlo_collectives.py).

Run: ``make tpu-smoke`` (~2 min warm-cache; first run pays ~11 remote
compiles, ~20-40 s each in a healthy window).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpulbm.core.params import LBMParams
from tpulbm.core.state import initial_state
from tpulbm.dist import runner as R
from tpulbm.dist.mesh import get_mesh
from tpulbm.ops.step_jnp import run_steps

FTOL = dict(rtol=5e-5, atol=1e-7)
AVTOL = dict(rtol=5e-5)


def _case(ny, nx, seed=0):
    params = LBMParams(nx=nx, ny=ny, max_iters=16, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < 0.05
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    return params, jnp.asarray(mask)


def _tiers():
    """(name, ny, nx, n_steps, make) — one entry per single-device kernel
    tier; shapes are the smallest each tier's gate takes (fast compiles)."""
    from tpulbm.ops import (pallas_kstep2d, pallas_kstep_skew2d,
                            pallas_resident)

    mesh1 = get_mesh(n_devices=1)

    def resident(p, n):
        assert pallas_resident.supported(p.ny, p.nx)
        return R._make_resident_runner(p, n)

    def resident_hbm(p, n):
        assert (pallas_resident.supported_hbm(p.ny, p.nx)
                and not pallas_resident.supported(p.ny, p.nx))
        return R._make_resident_runner(p, n)

    def skew(p, n):
        return R._make_skew_runner(p, n, mesh1)

    def skew2d(p, n):
        return R._make_skew_runner(p, n, mesh1,
                                   maker=pallas_kstep_skew2d.make_skew2d)

    def skew2d_xfix(p, n):
        # the x-tiled seam fix (production for nx > MONO_FIX_NX_MAX, i.e.
        # 8192-wide grids): force it at smoke scale by lowering the envelope
        from tpulbm.ops import pallas_kstep_skew as pks

        orig = pks.MONO_FIX_NX_MAX
        pks.MONO_FIX_NX_MAX = 128
        try:
            return R._make_skew_runner(
                p, n, mesh1, maker=pallas_kstep_skew2d.make_skew2d)
        finally:
            pks.MONO_FIX_NX_MAX = orig

    def kstep(p, n):
        return R._make_kstep_runner(p, n, mesh1, 8, alias_donor=True,
                                    exact_all=True)

    def kstep2d(p, n):
        return R._make_kstep_runner(p, n, mesh1, 8,
                                    maker=pallas_kstep2d.make_kstep2d,
                                    exact_all=True)

    def bands(p, n):
        return R._make_kstep_bands_runner(p, n, mesh1, 8)

    def strips(p, n):
        return R._make_kstep_strips_runner(p, n, mesh1, 8, bx=256)

    def one_step(p, n):
        # K=2 < MARGIN routes _make_kstep_runner's chunk loop at K=2; the
        # true 1-step stream kernel is exercised via make_runner below.
        return R.make_runner(p, n, mesh=mesh1, backend="pallas")

    def padded(p, n):
        assert R.supported_padded_kstep(p, 1, 8)
        return R.make_runner(p, n, mesh=mesh1, backend="pallas")

    def xpad(p, n):
        r = R._make_xpad_runner(p, n, mesh1)
        assert r is not None
        return r

    def fold(p, n):
        # lane-folded skew (wide-grid tier, r5); hardware is BITWISE vs
        # the oracle where the CPU interpreter rounds isolated accel-row
        # cells 1 ULP off (docs/VALIDATION.md §4)
        from tpulbm.ops import pallas_kstep_skew_fold as pkf

        assert pkf.supported(p.ny, p.nx, 2)
        return pkf.make_fold_runner(p, n, F=2)

    def fold_f4(p, n):
        # F=4 exercises the PADDED fix band (2*(m+K) = 44 rows is not
        # 8-aligned — the natural band failed Mosaic compilation, r5;
        # fix_band_side pads it to 48)
        from tpulbm.ops import pallas_kstep_skew_fold as pkf

        assert pkf.supported(p.ny, p.nx, 4)
        return pkf.make_fold_runner(p, n, F=4)

    def merge(p, n):
        # row-merged skew (unaligned-deck tier, r5): the 320-lane class
        # evolves as the exactly lane-aligned (ny/2, 640) merged grid
        from tpulbm.ops import pallas_kstep_merge as pkm

        assert pkm.supported(p.ny, p.nx, 2)
        return pkm.make_merge_runner(p, n, G=2)

    return [
        ("resident", 128, 128, 16, resident),
        ("resident-hbm", 256, 512, 16, resident_hbm),
        ("skew", 96, 128, 16, skew),
        ("skew2d", 48, 512, 16, skew2d),
        ("skew2d-xfix", 48, 2048, 16, skew2d_xfix),  # 2-tile fix (bx=1024)
        ("kstep", 64, 128, 16, kstep),
        ("kstep2d", 32, 1024, 16, kstep2d),
        ("bands", 32, 512, 16, bands),
        ("strips", 32, 512, 16, strips),
        ("1-step", 16, 128, 4, one_step),       # rows too thin for K tiers
        ("padded", 100, 128, 16, padded),       # ny % 8 != 0 row extension
        ("xpad", 128, 200, 16, xpad),           # nx % 128 != 0 col extension
        ("fold", 96, 256, 16, fold),            # lane-folded skew, F=2
        ("fold-f4", 64, 512, 16, fold_f4),      # F=4: padded fix band
        ("merge", 96, 320, 16, merge),          # row-merged skew, G=2
    ]


def main():
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("tpu-smoke: no TPU visible (platform=cpu); this gate is for "
              "hardware — run the pytest matrix for interpret coverage",
              file=sys.stderr)
        return 2
    print(f"tpu-smoke on {dev.device_kind}")
    failures = []
    t_all = time.time()
    for name, ny, nx, n, make in _tiers():
        t0 = time.time()
        try:
            params, obst = _case(ny, nx)
            f_ref, av_ref = run_steps(initial_state(params), obst, params, n)
            f_ref, av_ref = np.asarray(f_ref), np.asarray(av_ref)
            runner = make(params, n)
            f, av = runner(initial_state(params), obst)
            jax.block_until_ready((f, av))
            f, av = np.asarray(f), np.asarray(av)
            assert f.shape == (9, ny, nx) and av.shape == (n,)
            np.testing.assert_allclose(f, f_ref, **FTOL)
            np.testing.assert_allclose(av, av_ref, **AVTOL)
            df = np.abs(f - f_ref).max()
            print(f"  PASS {name:13s} {ny}x{nx} n={n} "
                  f"max|df|={df:.2e}  [{time.time() - t0:.1f}s]")
        except Exception as e:  # noqa: BLE001 — gate reports all failures
            failures.append(name)
            msg = str(e).strip().splitlines()
            head = msg[0] if msg else repr(e)
            print(f"  FAIL {name:13s} {ny}x{nx}: {head}  "
                  f"[{time.time() - t0:.1f}s]")
    print(f"tpu-smoke: {len(failures)} failures in {time.time() - t_all:.0f}s"
          + (f" ({', '.join(failures)})" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
