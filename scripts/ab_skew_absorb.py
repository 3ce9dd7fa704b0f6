#!/usr/bin/env python
"""Device-time A/B of the absorb_shift lever (ROADMAP 1024^2/4096^2 item).

The skew kernels realign each step's +1(+CY) shift with a pltpu.roll before
slicing the valid rows (pallas_kstep_skew.py / _skew2d.py step loop). The
index algebra ``roll(v, r)[_PAD:_PAD+by] == v[_PAD-r : _PAD-r+by]`` lets the
shift be absorbed into a static sublane-offset slice instead — one fewer
roll per (step, plane) plus the obstacle-window roll per step. Bitwise-equal
physics (tests pin it); this measures whether Mosaic's unaligned-sublane
slices beat the rolls.

    python scripts/ab_skew_absorb.py [--grid 1024x1024] [--steps 2000]
    python scripts/ab_skew_absorb.py --grid 4096x4096   # skew2d tier
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_skew_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params

    params = read_params(f"data/input_{args.grid}.params")
    mask, nf = read_obstacles(
        f"data/obstacles_{args.grid}.dat", params.nx, params.ny
    )
    params = params.with_free_cells(nf)
    obst = jnp.asarray(mask)
    n = args.steps
    mesh = get_mesh(n_devices=1)
    cells = params.nx * params.ny

    variants = [
        ("base", dict()),
        ("absorb", dict(kernel_kw=dict(absorb_shift=True))),
    ]
    results = {}
    tails = {}
    for name, kw in variants:
        try:
            runner = _make_skew_runner(params, n, mesh, **kw)
            f = initial_state(params)
            t0 = time.perf_counter()
            f, av = runner(f, obst)
            tails[name] = float(av[-1])
            log(f"{name}: warmup {time.perf_counter() - t0:.1f}s "
                f"av[-1]={tails[name]:.6E}")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[name] = None
            continue
        best = None
        for rep in range(args.reps):
            g = initial_state(params)
            d = tempfile.mkdtemp(prefix="absk")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"{name} rep {rep}: {dev * 1e6 / n:.2f} us/step "
                    f"({cells * n / dev / 1e6:.0f} MLUPS)")
        results[name] = best

    print(f"{'variant':8} {'us/step':>9} {'MLUPS':>9}")
    for name, dev in results.items():
        if dev is None:
            print(f"{name:8} {'FAIL':>9}")
        else:
            print(f"{name:8} {dev / n * 1e6:9.2f} "
                  f"{cells * n / dev / 1e6:9.0f}")
    if len(tails) == 2:
        vals = list(tails.values())
        print(f"av tails match: {vals[0] == vals[1]} ({vals[0]:.6E})")


if __name__ == "__main__":
    sys.exit(main())
