#!/usr/bin/env python
"""Device-time sweep across the kernel-tier boundary (VERDICT r2 item 5).

Measures square grids from the VMEM-resident sweet spot through the K-step
tier (256^2, 320^2, 384^2, 448^2, 512^2, 768^2) so the tier-boundary table
in BENCHMARKS.md is measured, not assumed. Synthetic decks: official-deck
physics constants, 10% random obstacles (throughput is obstacle-agnostic;
the official decks' geometry only matters for physics validation).

    python scripts/bench_tier_boundary.py [--steps 2000]
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
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sizes", default="256,320,384,448,512,768")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.ops import pallas_resident

    mesh = get_mesh(n_devices=1)
    n = args.steps
    print(f"{'grid':10} {'tier':14} {'us/step':>9} {'MLUPS':>9}")
    for size in [int(s) for s in args.sizes.split(",")]:
        p = LBMParams(nx=size, ny=size, max_iters=n, reynolds_dim=100,
                      density=0.1, accel=0.005, omega=1.85)
        rng = np.random.RandomState(1)
        mask = rng.rand(size, size) < 0.1
        p = p.with_free_cells(size * size - int(mask.sum()))
        obst = jnp.asarray(np.asarray(mask))
        cells = size * size
        if size % 128:
            tier = "xpad"
        elif pallas_resident.supported(size, size):
            tier = "resident"
        elif pallas_resident.supported_hbm(size, size):
            tier = "resident-hbm"
        else:
            tier = "kstep/skew"
        try:
            runner = make_runner(p, n, mesh=mesh, backend="pallas")
        except Exception as e:
            print(f"{size}x{size:<5} {tier:14} FAIL {type(e).__name__}")
            continue
        f = initial_state(p)
        t0 = time.perf_counter()
        f, av = runner(f, obst)
        _ = float(av[-1])
        log(f"{size}^2 [{tier}]: warmup {time.perf_counter() - t0:.1f}s")
        best = None
        for rep in range(args.reps):
            g = initial_state(p)
            d = tempfile.mkdtemp(prefix="tier")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"  rep {rep}: {dev * 1e6 / n:.2f} us/step")
        if best:
            print(f"{size}x{size:<5} {tier:14} {best / n * 1e6:9.2f} "
                  f"{cells * n / best / 1e6:9.0f}")
        else:
            print(f"{size}x{size:<5} {tier:14} {'n/a':>9}")


if __name__ == "__main__":
    sys.exit(main())
