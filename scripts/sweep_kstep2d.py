#!/usr/bin/env python
"""Tile-shape sweep for the 2-D K-step kernel on the 4096x4096 deck.

All variants run in one process (within-process ratios are the only reliable
signal on the shared chip); best-of-N with host readback per timed region.

    python scripts/sweep_kstep2d.py [--steps 400] [--ny 4096 --nx 4096]
"""

import argparse
import functools
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_kstep_runner
    from tpulbm.ops import pallas_kstep2d
    from tpulbm.tools.make_deck import box_obstacles

    ny, nx = args.ny, args.nx
    params = LBMParams(nx=nx, ny=ny, max_iters=args.steps, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = box_obstacles(nx, ny)
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    mesh = get_mesh(n_devices=1)
    n = args.steps

    tiles = [
        (32, 512),    # current picker choice
        (16, 1024),
        (32, 1024),
        (64, 512),
        (64, 1024),
        (8, 2048),
        (16, 2048),
        (128, 256),
        (32, 2048),
    ]
    results = {}
    for tile in tiles:
        label = f"{tile[0]}x{tile[1]}"
        window = (tile[0] + 16) * (tile[1] + 256)
        ratio = window / (tile[0] * tile[1])
        maker = functools.partial(pallas_kstep2d.make_kstep2d, tile=tile)
        try:
            r = _make_kstep_runner(params, n, mesh, k=8, maker=maker)
        except Exception as e:
            log(f"{label}: build failed: {e}")
            continue
        try:
            f = initial_state(params)
            t0 = time.perf_counter()
            f, av = r(f, obst)
            tail = float(av[-1])
            warm = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.reps):
                g = initial_state(params)
                t0 = time.perf_counter()
                g, av = r(g, obst)
                tail = float(av[-1])
                best = min(best, time.perf_counter() - t0)
            us = best / n * 1e6
            mlups = ny * nx * n / best / 1e6
            results[label] = (us, mlups)
            log(f"{label}: ratio={ratio:.2f} warm={warm:.1f}s "
                f"{us:.1f} us/step {mlups:.0f} MLUPS av={tail:.4E}")
        except Exception as e:
            log(f"{label}: run failed: {type(e).__name__}: {str(e)[:120]}")

    ranked = sorted(results.items(), key=lambda kv: kv[1][0])
    for label, (us, mlups) in ranked:
        print(f"{label}\t{us:.1f} us/step\t{mlups:.0f} MLUPS")


if __name__ == "__main__":
    sys.exit(main())
