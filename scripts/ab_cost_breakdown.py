#!/usr/bin/env python
"""Device-time cost breakdown of the production K-step kernel.

Builds the production runner with individual stages of the fused body
skipped (window_step.COST_SKIP — physics is intentionally WRONG in skip
variants) and diffs device time, isolating each stage's share: inflow
acceleration, the pull-stream rolls, the |u| speed (sqrt+div), and the BGK
collide. Drives optimization priorities; results go to
docs/measurements/round3.md.

    python scripts/ab_cost_breakdown.py [--grid 1024x1024] [--steps 2000]
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
    ap.add_argument("--grid", default="1024x1024")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params
    from tpulbm.ops import window_step

    params = read_params(f"data/input_{args.grid}.params")
    mask, nf = read_obstacles(
        f"data/obstacles_{args.grid}.dat", params.nx, params.ny
    )
    params = params.with_free_cells(nf)
    obst = jnp.asarray(mask)
    n = args.steps
    mesh = get_mesh(n_devices=1)

    variants = [
        ("base", set()),
        ("no-accel", {"accel"}),
        ("no-roll", {"roll"}),
        ("no-speed", {"speed"}),
        ("no-collide", {"collide"}),
        ("rolls-only", {"accel", "collide"}),
        # data movement only: window DMAs + assemble + out write-back
        ("none", {"accel", "roll", "collide"}),
    ]
    results = {}
    for name, skip in variants:
        window_step.COST_SKIP = skip
        try:
            runner = make_runner(params, n, mesh=mesh, backend="pallas")
            f = initial_state(params)
            t0 = time.perf_counter()
            f, av = runner(f, obst)
            _ = float(av[-1])
            log(f"{name}: warmup {time.perf_counter() - t0:.1f}s")
        except Exception as e:
            log(f"{name}: FAILED {e!r}")
            results[name] = None
            continue
        best = None
        for rep in range(args.reps):
            g = initial_state(params)
            d = tempfile.mkdtemp(prefix="abcost")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"{name} rep {rep}: {dev * 1e6 / n:.2f} us/step")
        results[name] = best
    window_step.COST_SKIP = set()

    base = results.get("base")
    print(f"{'variant':12} {'us/step':>9} {'delta us':>9}")
    for name, dev in results.items():
        if dev is None:
            print(f"{name:12} {'FAIL':>9}")
        else:
            d_us = dev / n * 1e6
            delta = (base / n * 1e6 - d_us) if base else float("nan")
            print(f"{name:12} {d_us:9.2f} {delta:9.2f}")


if __name__ == "__main__":
    sys.exit(main())
