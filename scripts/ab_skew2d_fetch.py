#!/usr/bin/env python
"""Device-time A/B of the skew2d window-fetch organization at 4096^2.

Round-3 accounting left a ~256 us/step core-side DMA issue/wait floor that
does not overlap compute (docs/measurements/round3.md). Two levers:

- ``merged_fetch``: the window is one contiguous x-range except where a
  margin wraps the torus, so interior strips can fetch ONE wx-wide piece
  per plane-set instead of three (main 4 KB/row + two 512 B/row margins) —
  fewer descriptors, bigger segments.
- ``in_slots=3``: deepen the input pipeline to two windows of fetch lead
  without scaling the output staging (the round-3 slots=3 VMEM failure
  scaled fbuf+obuf+vstage together).

    python scripts/ab_skew2d_fetch.py [--steps 2000]
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
    ap.add_argument("--grid", default="4096x4096")
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
    from tpulbm.ops import pallas_kstep_skew2d as sk2

    import functools

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
        ("merged", dict(merged_fetch=True)),
        ("in3", dict(in_slots=3)),
        ("merged+in3", dict(merged_fetch=True, in_slots=3)),
        ("merged+in4", dict(merged_fetch=True, in_slots=4)),
        ("absorb", dict(absorb_shift=True)),
        ("mrg+in3+abs", dict(merged_fetch=True, in_slots=3,
                             absorb_shift=True)),
    ]
    results = {}
    tails = {}
    for name, kw in variants:
        try:
            maker = functools.partial(sk2.make_skew2d, **kw)
            runner = _make_skew_runner(params, n, mesh, maker=maker)
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
            d = tempfile.mkdtemp(prefix="absk2f")
            with jax.profiler.trace(d):
                g, av = runner(g, obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                best = dev if best is None else min(best, dev)
                log(f"{name} rep {rep}: {dev * 1e6 / n:.2f} us/step")
        results[name] = best

    print(f"{'variant':14} {'us/step':>9} {'MLUPS':>9}")
    for name, dev in results.items():
        if dev is None:
            print(f"{name:14} {'FAIL':>9}")
        else:
            print(f"{name:14} {dev / n * 1e6:9.2f} "
                  f"{cells * n / dev / 1e6:9.0f}")
    uniq = set(tails.values())
    print(f"av tails: {sorted(uniq)} (identical: {len(uniq) == 1})")


if __name__ == "__main__":
    sys.exit(main())
