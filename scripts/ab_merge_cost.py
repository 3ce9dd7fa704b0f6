#!/usr/bin/env python
"""Cost attribution of the merged skew kernel's streaming pieces at 320²:
COST_SKIP variants (physics intentionally WRONG when skipping) compiled in
ONE process, device-time basis. Skips: mpatch (the per-block x-wrap lane
concats), mselect (the boundary-block row-carry selects)."""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
from bench_device_time import device_loop_seconds  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpulbm.core.params import LBMParams
    from tpulbm.core.state import initial_state
    from tpulbm.ops import window_step
    from tpulbm.ops import pallas_kstep_merge as pkm
    from tpulbm.tools.make_deck import box_obstacles

    ny = nx = 320
    n = 4000
    params = LBMParams(nx=nx, ny=ny, max_iters=n, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = box_obstacles(nx, ny)
    params = params.with_free_cells(ny * nx - int(mask.sum()))
    obst = jnp.asarray(mask)
    cells = ny * nx

    variants = {
        "full": set(),
        "no-mpatch": {"mpatch"},
        "no-mselect": {"mselect"},
        "no-both": {"mpatch", "mselect"},
    }
    runners = {}
    for name, skip in variants.items():
        window_step.COST_SKIP = skip
        runners[name] = pkm.make_merge_runner(params, n, G=2)
        f, av = runners[name](initial_state(params), obst)
        log(f"warmed {name} av[-1]={float(av[-1]):.6e}")
    window_step.COST_SKIP = set()

    out = {}
    for rep in range(3):
        for name, r in runners.items():
            d = tempfile.mkdtemp(prefix="abmc")
            with jax.profiler.trace(d):
                g, av = r(initial_state(params), obst)
                _ = float(av[-1])
            dev = device_loop_seconds(d)
            shutil.rmtree(d, ignore_errors=True)
            if dev:
                out[name] = min(out.get(name, 1e9), dev)
            log(f"rep {rep} {name}: device {dev:.4f}s "
                f"({cells * n / dev / 1e6:.0f} MLUPS)")
    print(json.dumps({k: round(v, 4) for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
