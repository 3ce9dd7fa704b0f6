#!/usr/bin/env python
"""Same-process device-time A/B: window height (BY) x collide_split.

collide_split chunks the pointwise collide to cap Mosaic's live-vector
VMEM — the constraint that rejected BY=64 in round 2 (docs/measurements/
round2.md "BY=64/128"). Bigger BY cuts the margin-recompute ratio
((BY+2K)/BY rolls, (BY+K)/BY collide with exact_all), so if split windows
compile, device time should drop.

    python scripts/ab_collide_split.py [--grid 1024x1024] [--steps 2000]
        [--reps 2] [--variants base,by64s2,by64s4,by32s2]
"""

import argparse
import functools
import sys
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
    ap.add_argument("--variants", default="base,by64s2,by64s4,by32s2")
    args = ap.parse_args()

    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_kstep_runner, make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params
    from tpulbm.ops import pallas_kstep

    params = read_params(f"data/input_{args.grid}.params")
    mask, nf = read_obstacles(
        f"data/obstacles_{args.grid}.dat", params.nx, params.ny
    )
    params = params.with_free_cells(nf)
    obst = jnp.asarray(mask)
    n = args.steps
    mesh = get_mesh(n_devices=1)

    def kstep_variant(by, split):
        return _make_kstep_runner(
            params, n, mesh, k=8, alias_donor=True, exact_all=True,
            maker=functools.partial(
                pallas_kstep.make_kstep, by=by, collide_split=split
            ),
        )

    builders = {
        "base": lambda: make_runner(params, n, mesh=mesh, backend="pallas"),
        "by64s2": lambda: kstep_variant(64, 2),
        "by64s4": lambda: kstep_variant(64, 4),
        "by64s8": lambda: kstep_variant(64, 8),
        "by32s2": lambda: kstep_variant(32, 2),
        "by128s4": lambda: kstep_variant(128, 4),
        "by128s8": lambda: kstep_variant(128, 8),
    }

    results = {}
    ref_av = None
    for name in args.variants.split(","):
        try:
            runner = builders[name]()
        except Exception as e:
            log(f"{name}: BUILD FAILED: {e!r}")
            results[name] = None
            continue
        try:
            f = initial_state(params)
            t0 = time.perf_counter()
            f, av = runner(f, obst)
            tail = float(av[-1])
            log(f"{name}: warmup {time.perf_counter() - t0:.1f}s "
                f"av[-1]={tail:.6E}")
        except Exception as e:
            log(f"{name}: COMPILE/RUN FAILED: {e!r}")
            results[name] = None
            continue
        if ref_av is None:
            ref_av = tail
        elif abs(tail - ref_av) > 1e-9 + 1e-4 * abs(ref_av):
            log(f"{name}: AV MISMATCH {tail!r} vs {ref_av!r}")
        best = None
        for rep in range(args.reps):
            g = initial_state(params)
            d = tempfile.mkdtemp(prefix="abcs")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"{name} rep {rep}: device {dev * 1e6 / n:.2f} us/step")
        results[name] = best

    cells = params.nx * params.ny
    print(f"{'variant':10} {'us/step':>9} {'MLUPS':>9}")
    for name, dev in results.items():
        if dev is None:
            print(f"{name:10} {'FAIL':>9}")
        else:
            print(f"{name:10} {dev / n * 1e6:9.2f} {cells * n / dev / 1e6:9.0f}")


if __name__ == "__main__":
    sys.exit(main())
