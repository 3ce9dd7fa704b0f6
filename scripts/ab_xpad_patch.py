#!/usr/bin/env python
"""Device-time A/B of the x-extension wrap-patch formulation (unaligned nx).

The periodic x-extension (320^2 -> skew@384) pays (a) the geometric padding
ratio nxp/nx in compute — irreducible for lane-tiled windows — and (b) the
wrap re-aim patch: per step, 6 one-lane substitutions lowered as
iota + full-window where (window_step.x_wrap_patch). This A/B measures (b)'s
formulations (knob window_step.X_PATCH_MODE: `concat` / `where` / `at_set`
/ `dus`) at the two unaligned tier-sweep sizes, alongside their aligned
neighbours for the ratio. Bitwise-equal physics (tests/test_xpad.py pins
it). Measured r4: `concat` wins +2% (landed as default); `at_set`/`dus`
lower to scatter/dynamic_update_slice which hardware Mosaic rejects.

    python scripts/ab_xpad_patch.py [--steps 2000]
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
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.ops import window_step

    mesh = get_mesh(n_devices=1)
    n = args.steps

    cases = [
        (320, "where"),
        (320, "at_set"),
        (320, "dus"),
        (320, "concat"),
        (448, "where"),
        (448, "at_set"),
        (448, "dus"),
        (448, "concat"),
        (384, "aligned"),
        (512, "aligned"),
    ]
    print(f"{'case':16} {'us/step':>9} {'MLUPS':>9}")
    for size, name in cases:
        p = LBMParams(nx=size, ny=size, max_iters=n, reynolds_dim=100,
                      density=0.1, accel=0.005, omega=1.85)
        rng = np.random.RandomState(1)
        mask = rng.rand(size, size) < 0.1
        p = p.with_free_cells(size * size - int(mask.sum()))
        obst = jnp.asarray(np.asarray(mask))
        window_step.X_PATCH_MODE = name if name != "aligned" else "concat"
        try:
            runner = make_runner(p, n, mesh=mesh, backend="pallas")
            f = initial_state(p)
            t0 = time.perf_counter()
            f, av = runner(f, obst)
            tail = float(av[-1])
            log(f"{size}/{name}: warmup {time.perf_counter() - t0:.1f}s "
                f"av[-1]={tail:.6E}")
        except Exception as e:
            print(f"{size}^2/{name:8} FAIL {type(e).__name__}: {str(e)[:150]}")
            continue
        best = None
        for rep in range(args.reps):
            g = initial_state(p)
            d = tempfile.mkdtemp(prefix="abxp")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"{size}/{name} rep {rep}: {dev * 1e6 / n:.2f} us/step")
        if best:
            print(f"{size}^2/{name:8} {best / n * 1e6:9.2f} "
                  f"{size * size * n / best / 1e6:9.0f}")
    window_step.X_PATCH_MODE = "concat"


if __name__ == "__main__":
    sys.exit(main())
