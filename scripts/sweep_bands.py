#!/usr/bin/env python
"""Tile sweep for the band-major K-step kernel on the 4096x4096 deck.

Includes the kstep2d row-major best as the in-process comparison row. All
variants run in one process (within-process ratios are the only reliable
signal on the shared chip); best-of-N with host readback per timed region.

    python scripts/sweep_bands.py [--steps 400] [--ny 4096 --nx 4096]
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
    ap.add_argument("--skip-2d", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_kstep_bands_runner, _make_kstep_runner
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

    variants = []
    if not args.skip_2d:
        variants.append((
            "2d-32x512",
            lambda: _make_kstep_runner(
                params, n, mesh, k=8,
                maker=functools.partial(pallas_kstep2d.make_kstep2d,
                                        tile=(32, 512)),
            ),
        ))
    for tile in [(32, 512), (64, 512), (32, 1024), (64, 1024), (128, 512),
                 (96, 512), (16, 2048), (128, 256)]:
        if ny % tile[0] or nx % tile[1] or nx == tile[1]:
            continue
        for narrow in (True, False):
            variants.append((
                f"bands-{tile[0]}x{tile[1]}{'' if narrow else '-full'}",
                functools.partial(_make_kstep_bands_runner, params, n, mesh,
                                  k=8, tile=tile, narrow_cols=narrow),
            ))

    results = {}
    for label, build in variants:
        try:
            r = build()
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
            log(f"{label}: warm={warm:.1f}s {us:.1f} us/step "
                f"{mlups:.0f} MLUPS av={tail:.4E}")
        except Exception as e:
            log(f"{label}: run failed: {type(e).__name__}: {str(e)[:160]}")

    ranked = sorted(results.items(), key=lambda kv: kv[1][0])
    for label, (us, mlups) in ranked:
        print(f"{label}\t{us:.1f} us/step\t{mlups:.0f} MLUPS")


if __name__ == "__main__":
    sys.exit(main())
