#!/usr/bin/env python
"""Same-process A/B: canonical vs pair-symmetric equilibrium on a deck.

Both variants run in one process (the tunneled chip's absolute throughput
swings with co-tenant load; only within-process ratios are meaningful),
best-of-N with a host readback ending each timed region.

    python scripts/ab_pair_symmetric.py [--grid 1024x1024] [--steps 4000]
"""

import argparse
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1024x1024")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params
    from tpulbm.ops import window_step

    params = read_params(f"data/input_{args.grid}.params")
    mask, num_free = read_obstacles(
        f"data/obstacles_{args.grid}.dat", params.nx, params.ny
    )
    params = params.with_free_cells(num_free)
    obst = jnp.asarray(mask)
    mesh = get_mesh(n_devices=1)
    n = args.steps

    results = {}
    for name, flag in (("canonical", False), ("pair_symmetric", True)):
        window_step.PAIR_SYMMETRIC_DEFAULT = flag
        runner = make_runner(params, n, mesh=mesh, backend="pallas")
        f = initial_state(params)
        t0 = time.perf_counter()
        f, av = runner(f, obst)
        tail = float(av[-1])
        log(f"{name}: warmup {time.perf_counter() - t0:.3f} s av={tail:.6E}")
        best = float("inf")
        for rep in range(args.reps):
            g = initial_state(params)
            t0 = time.perf_counter()
            g, av = runner(g, obst)
            tail = float(av[-1])
            dt = time.perf_counter() - t0
            best = min(best, dt)
            log(f"{name} rep{rep}: {dt:.3f} s")
        us_step = best / n * 1e6
        mlups = params.nx * params.ny * n / best / 1e6
        results[name] = (us_step, mlups)
        log(f"{name}: {us_step:.1f} us/step  {mlups:.0f} MLUPS")

    a, b = results["canonical"], results["pair_symmetric"]
    log(f"speedup pair_symmetric vs canonical: {a[0] / b[0]:.3f}x")
    print(
        f'{{"grid": "{args.grid}", "canonical_us": {a[0]:.2f}, '
        f'"pair_symmetric_us": {b[0]:.2f}, "speedup": {a[0] / b[0]:.4f}}}'
    )


if __name__ == "__main__":
    sys.exit(main())
