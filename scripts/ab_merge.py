#!/usr/bin/env python
"""A/B: row-merged skew kernel vs the production unaligned-deck tier
(the periodic column extension) — round-5 verdict item 6.

Both variants run in ONE process, alternating reps, device-time basis
(scripts/bench_device_time.py methodology) so pool tenancy cancels:

    python scripts/ab_merge.py [--grid 320x320] [--steps 2000] [--reps 3]
        [--G N] [--by N] [--collide-split N] [--skip-prod]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(__file__))
from bench_device_time import device_loop_seconds  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="320x320")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--G", type=int, default=None)
    ap.add_argument("--by", type=int, default=None)
    ap.add_argument("--collide-split", type=int, default=1)
    ap.add_argument("--skip-prod", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.ops import pallas_kstep_merge as pkm
    from tpulbm.tools.make_deck import box_obstacles

    nx, ny = (int(v) for v in args.grid.split("x"))
    n = args.steps
    params = LBMParams(nx=nx, ny=ny, max_iters=n, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = box_obstacles(nx, ny)
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    cells = nx * ny

    G = args.G or pkm.pick_merge(ny, nx)
    if G is None:
        log(f"merge unsupported for {args.grid}")
        return 1
    log(f"merge: G={G} merged shape ({ny // G}, {nx * G})")

    variants = {}
    variants["merge"] = pkm.make_merge_runner(
        params, n, G=G, by=args.by, collide_split=args.collide_split)
    if not args.skip_prod:
        variants["prod"] = make_runner(
            params, n, mesh=get_mesh(n_devices=1), backend="pallas")

    for name, r in variants.items():
        t0 = time.perf_counter()
        f, av = r(initial_state(params), obst)
        a = float(av[-1])
        log(f"warmup {name}: {time.perf_counter() - t0:.1f}s av[-1]={a:.6e}")

    best = {k: None for k in variants}
    for rep in range(args.reps):
        for name, r in variants.items():
            d = tempfile.mkdtemp(prefix="abmerge")
            t0 = time.perf_counter()
            with jax.profiler.trace(d):
                g, av = r(initial_state(params), obst)
                _ = float(av[-1])
            wall = time.perf_counter() - t0
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            mlups = cells * n / dev / 1e6 if dev else float("nan")
            log(f"rep {rep} {name}: wall {wall:.3f}s device "
                f"{dev if dev else float('nan'):.3f}s ({mlups:.0f} MLUPS)")
            if dev:
                best[name] = dev if best[name] is None else min(
                    best[name], dev)

    out = {"grid": args.grid, "steps": n, "G": G}
    for name, dev in best.items():
        if dev:
            out[f"{name}_device_mlups"] = round(cells * n / dev / 1e6, 1)
    if best.get("merge") and best.get("prod"):
        out["merge_vs_prod"] = round(best["prod"] / best["merge"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
