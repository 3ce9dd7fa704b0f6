#!/usr/bin/env python
"""Device-time A/B: 1280^2 on the 1-D skew tier (block budget raised to
admit BY=32) vs the skew2d tier it currently routes to.

nx=1280 misses the r3 `_BLOCK_BUDGET = 48K` by 4% ((32+8)*1280 = 51200
elements/plane-window), so it falls to the 2-D tiled skew whose best legal
tile is (40, 640) — a 1.4x full-window x ratio. The 1-D skew tier has NO x
overhead (ratio 1.0); if BY=32 at nx=1280 compiles within real VMEM, it
should win by roughly the ratio. This measures both (and 1024^2 as a
no-change guard for the raised budget).

    python scripts/ab_skew_budget_1280.py [--steps 2000]
"""

import argparse
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "scripts")
from bench_device_time import device_loop_seconds  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--wider", action="store_true",
                    help="probe 1792/2048 windows past the proven budget")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_skew_runner
    from tpulbm.ops import pallas_kstep_skew as sk
    from tpulbm.ops import pallas_kstep_skew2d as sk2

    mesh = get_mesh(n_devices=1)
    n = args.steps
    base_budget = sk._BLOCK_BUDGET

    def deck(size):
        p = LBMParams(nx=size, ny=size, max_iters=n, reynolds_dim=100,
                      density=0.1, accel=0.005, omega=1.85)
        rng = np.random.RandomState(1)
        mask = rng.rand(size, size) < 0.1
        p = p.with_free_cells(size * size - int(mask.sum()))
        return p, jnp.asarray(np.asarray(mask))

    cases = [
        ("1280 skew2d (production)", 1280, sk2.make_skew2d, base_budget),
        ("1280 skew BY=32 (budget+)", 1280, None, 51200),
        ("1024 skew (budget+ guard)", 1024, None, 51200),
        ("1280 skew BY=40 (budget++)", 1280, None, 61440),
        ("1536 skew BY=32 (budget++)", 1536, None, 61440),
        ("1536 skew BY=24 (production)", 1536, None, base_budget),
    ]
    if "--wider" in sys.argv:
        # Can the ratio-1.0 tier stretch to 1792/2048-wide windows? The
        # windows are 17/33% past the r4-proven 61440 elements/plane; the
        # A/B doubles as the compile probe (a FAIL row = the budget must
        # stay below that window size).
        cases = [
            ("1792 skew2d (production)", 1792, sk2.make_skew2d, base_budget),
            ("1792 skew BY=32 (71680)", 1792, None, 71680),
            ("2048 skew2d (production)", 2048, sk2.make_skew2d, base_budget),
            ("2048 skew BY=32 (81920)", 2048, None, 81920),
        ]
    print(f"{'case':28} {'us/step':>9} {'MLUPS':>9}")
    for name, size, maker, budget in cases:
        p, obst = deck(size)
        sk._BLOCK_BUDGET = budget
        if maker is None:
            log(f"{name}: pick_block_rows -> "
                f"{sk.pick_block_rows(size, size)}")
        try:
            kw = {} if maker is None else {"maker": maker}
            runner = _make_skew_runner(p, n, mesh, **kw)
            f = initial_state(p)
            t0 = time.perf_counter()
            f, av = runner(f, obst)
            tail = float(av[-1])
            log(f"{name}: warmup {time.perf_counter() - t0:.1f}s "
                f"av[-1]={tail:.6E}")
        except Exception as e:
            print(f"{name:28} FAIL {type(e).__name__}: {str(e)[:200]}")
            sk._BLOCK_BUDGET = base_budget
            continue
        best = None
        for rep in range(args.reps):
            g = initial_state(p)
            d = tempfile.mkdtemp(prefix="abbud")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"{name} rep {rep}: {dev * 1e6 / n:.2f} us/step")
        sk._BLOCK_BUDGET = base_budget
        if best:
            print(f"{name:28} {best / n * 1e6:9.2f} "
                  f"{size * size * n / best / 1e6:9.0f}")


if __name__ == "__main__":
    sys.exit(main())
