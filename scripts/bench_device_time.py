#!/usr/bin/env python
"""Device-time benchmark: kernel speed measured from the profiler trace.

The shared TPU pool time-slices tenants: wall-clock in a busy window can
read 5-10x slower than the chip actually runs our program (the xprof trace
shows the step loop executing contiguously at full speed, with the 'lost'
seconds spent queueing in the tunnel before/after). This harness runs the
production runner under ``jax.profiler.trace`` and reports the DEVICE-side
duration of the jitted step loop — the tenancy-independent kernel speed —
alongside wall clock, so engineering decisions are not hostage to pool
load. The official bench.py stays wall-clock (end-to-end honesty); this is
the instrument for kernel work.

    python scripts/bench_device_time.py [--grid 1024x1024] [--steps 2000]
        [--backend pallas] [--reps 2]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def device_loop_seconds(trace_dir):
    """Total duration of top-level jit program events on the TPU timeline."""
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        return None
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    total = 0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" not in str(pids.get(e["pid"], "")):
            continue
        if e.get("name", "").startswith("jit_"):
            total += e.get("dur", 0)
    return total / 1e6 if total else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1024x1024")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params

    deck = f"data/input_{args.grid}.params"
    if os.path.exists(deck):
        params = read_params(deck)
        mask, nf = read_obstacles(
            f"data/obstacles_{args.grid}.dat", params.nx, params.ny
        )
        params = params.with_free_cells(nf)
    else:
        from tpulbm.core.params import LBMParams
        from tpulbm.tools.make_deck import box_obstacles

        nx, ny = (int(v) for v in args.grid.split("x"))
        params = LBMParams(nx=nx, ny=ny, max_iters=args.steps,
                           reynolds_dim=10, density=0.1, accel=0.01,
                           omega=1.85)
        mask = box_obstacles(nx, ny)
        params = params.with_free_cells(ny * nx - int(mask.sum()))

    n = args.steps
    runner = make_runner(params, n, mesh=get_mesh(n_devices=1),
                         backend=args.backend)
    obst = jnp.asarray(mask)

    f = initial_state(params)
    t0 = time.perf_counter()
    f, av = runner(f, obst)
    _ = float(av[-1])
    log(f"warmup {time.perf_counter() - t0:.1f}s")

    best_dev, best_wall = None, None
    for rep in range(args.reps):
        g = initial_state(params)
        d = tempfile.mkdtemp(prefix="devbench")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            g, av = runner(g, obst)
            _ = float(av[-1])
        wall = time.perf_counter() - t0
        dev = device_loop_seconds(d)
        shutil.rmtree(d, ignore_errors=True)
        log(f"rep {rep}: wall {wall:.3f}s device {dev if dev else float('nan'):.3f}s")
        best_wall = wall if best_wall is None else min(best_wall, wall)
        if dev:
            best_dev = dev if best_dev is None else min(best_dev, dev)

    cells = params.nx * params.ny
    out = {
        "grid": args.grid,
        "steps": n,
        "wall_mlups": round(cells * n / best_wall / 1e6, 1),
    }
    if best_dev:
        out["device_mlups"] = round(cells * n / best_dev / 1e6, 1)
        out["device_us_per_step"] = round(best_dev / n * 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
