#!/usr/bin/env python
"""A/B: lane-folded 1-D skew kernel vs the production wide-grid tier
(round-5 verdict item 2 — the structural attempt at the 13% wide-grid
residual).

Both variants run in ONE process, alternating reps, device-time basis
(scripts/bench_device_time.py methodology) so pool tenancy cancels:

    python scripts/ab_fold.py [--grid 2048x2048] [--steps 2000] [--reps 3]
        [--fold-by N] [--collide-split N]
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
    ap.add_argument("--grid", default="2048x2048")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fold-by", type=int, default=None)
    ap.add_argument("--collide-split", type=int, default=1)
    ap.add_argument("--F", type=int, default=None)
    ap.add_argument("--skip-prod", action="store_true")
    ap.add_argument("--out-slots", type=int, default=None,
                    help="vstage staging slots (1 = VMEM-slim single-staged "
                         "output; default = pick_out_slots policy)")
    ap.add_argument("--budget", type=int, default=None,
                    help="probe: override the fold window budget "
                         "(_BLOCK_BUDGET) to admit configs past the "
                         "production envelope, as ab_skew_budget_1280 "
                         "does for the 1-D skew")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.ops import pallas_kstep_skew_fold as pkf
    from tpulbm.tools.make_deck import box_obstacles

    nx, ny = (int(v) for v in args.grid.split("x"))
    n = args.steps
    params = LBMParams(nx=nx, ny=ny, max_iters=n, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = box_obstacles(nx, ny)
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    cells = nx * ny

    if args.budget is not None:
        log(f"probe: fold _BLOCK_BUDGET {pkf._BLOCK_BUDGET} -> {args.budget}")
        pkf._BLOCK_BUDGET = args.budget

    F = args.F or pkf.pick_fold(ny, nx)
    if F is None:
        log(f"fold unsupported for {args.grid}")
        return 1
    log(f"fold: F={F} folded shape ({ny * F}, {nx // F}) "
        f"by={args.fold_by or pkf.pick_by(ny * F, nx // F, F)}")

    variants = {}
    variants["fold"] = pkf.make_fold_runner(
        params, n, F=F, by=args.fold_by, out_slots=args.out_slots,
        collide_split=args.collide_split)
    if not args.skip_prod:
        variants["prod"] = make_runner(
            params, n, mesh=get_mesh(n_devices=1), backend="pallas")

    # warm both (compile + first dispatch)
    for name, r in variants.items():
        t0 = time.perf_counter()
        f, av = r(initial_state(params), obst)
        a = float(av[-1])
        log(f"warmup {name}: {time.perf_counter() - t0:.1f}s av[-1]={a:.6e}")

    best = {k: None for k in variants}
    for rep in range(args.reps):
        for name, r in variants.items():
            d = tempfile.mkdtemp(prefix="abfold")
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

    out = {"grid": args.grid, "steps": n, "F": F}
    for name, dev in best.items():
        if dev:
            out[f"{name}_device_mlups"] = round(cells * n / dev / 1e6, 1)
    if best.get("fold") and best.get("prod"):
        out["fold_vs_prod"] = round(best["prod"] / best["fold"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
