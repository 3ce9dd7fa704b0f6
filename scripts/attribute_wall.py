#!/usr/bin/env python
"""Attribute the 1024^2 healthy-window wall-vs-device gap (round-4 verdict
item 1).

The committed healthy capture reads 1.085 s wall vs 0.816 s device for ONE
20000-step dispatch — ~0.27 s of host-side time. This script splits a bench
rep's timed region into its host components, within one process:

- upload:   host->device transfer of the 36 MB initial state. bench.py's
            ``initial_state`` returns a device array, but the transfer is
            asynchronous — starting the clock right after it leaves the
            transfer in flight inside the timed region.
- dispatch: runner(...) call until Python returns (tracing cache hit +
            enqueue; XLA dispatch is async so this excludes execution).
- execute+readback: from dispatch return to ``float(av[-1])`` landing — the
            device step loop plus one tunnel round trip for the 80 KB av
            series.

A/B: reps alternate between bench.py's current timing (transfer in flight)
and a pre-settled variant (a 1-element readback of the fresh state forces
the upload to complete before the clock starts). The reference's own timed
region starts AFTER initialise (gettimeofday tic, d2q9-bgk.c:278-279), with
the grids already resident in memory — so the pre-settled variant is the
apples-to-apples wall.

Usage: python scripts/attribute_wall.py [--grid 1024x1024] [--reps 6]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params
    from tpulbm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    grid = "1024x1024"
    if "--grid" in sys.argv:
        grid = sys.argv[sys.argv.index("--grid") + 1]
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    params = read_params(f"data/input_{grid}.params")
    mask, num_free = read_obstacles(
        f"data/obstacles_{grid}.dat", params.nx, params.ny)
    params = params.with_free_cells(num_free)
    n_steps = params.max_iters

    mesh = get_mesh(n_devices=1)
    runner = make_runner(params, n_steps, mesh=mesh, backend="pallas")
    obst = jnp.asarray(mask)
    float(obst.sum())  # settle the obstacle upload once

    # warm-up / compile
    f = initial_state(params)
    f, av = runner(f, obst)
    print(f"warmup done av[-1]={float(av[-1]):.6E}", file=sys.stderr)

    rows = []
    for rep in range(reps):
        settled = rep % 2 == 1
        t_make = time.perf_counter()
        g = initial_state(params)
        if settled:
            # force the host->device upload to complete before the clock
            # starts (1-element readback; block_until_ready is unreliable
            # on the tunneled platform)
            float(g[0, 0, 0])
        t0 = time.perf_counter()
        out = runner(g, obst)
        t_disp = time.perf_counter()
        g2, av = out
        tail = float(av[-1])
        t1 = time.perf_counter()
        del g2
        rows.append({
            "rep": rep,
            "mode": "settled" if settled else "bench-as-is",
            "make_s": round(t0 - t_make, 4),
            "dispatch_s": round(t_disp - t0, 4),
            "exec_readback_s": round(t1 - t_disp, 4),
            "wall_s": round(t1 - t0, 4),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    by_mode = {}
    for r in rows:
        by_mode.setdefault(r["mode"], []).append(r["wall_s"])
    summary = {
        "grid": grid,
        "steps": n_steps,
        "best_wall_bench_as_is": min(by_mode.get("bench-as-is", [0])),
        "best_wall_settled": min(by_mode.get("settled", [0])),
        "rows": rows,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
