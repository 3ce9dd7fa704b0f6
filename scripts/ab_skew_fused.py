#!/usr/bin/env python
"""Device-time A/B: fused-fix skew kernel vs the split (two-call) skew path.

The fused variant runs the seam fix as a trailing grid program of the main
pallas_call (no second kernel launch / band concat / value splices); the
split variant is the round-3 baseline. Same-process, best-of-N, xprof
device-time basis (wall rankings are unstable on the shared chip).

    python scripts/ab_skew_fused.py [--grid 1024x1024] [--steps 2000]
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

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_skew_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params
    import jax.numpy as jnp

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
        ("split", dict(fused_fix=False)),
        ("fused", dict(fused_fix=True)),
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
            log(f"{name}: FAILED {e!r}")
            results[name] = None
            continue
        best = None
        for rep in range(args.reps):
            g = initial_state(params)
            d = tempfile.mkdtemp(prefix="abfused")
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
