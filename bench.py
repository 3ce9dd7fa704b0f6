#!/usr/bin/env python
"""Headline benchmark: sustained MLUPS on the 1024x1024 deck, one TPU chip.

Baseline: the reference's best time on this deck is 5.92 s for 20000 steps on
64 Xeon cores (report.odt table 4; d2q9-bgk_best.out:10) = ~3550 MLUPS.
``vs_baseline`` is the speedup over that number.

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

BASELINE_MLUPS = 3550.0  # 1024^2 * 20000 / 5.92 s / 1e6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpulbm.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params

    deck = "data/input_1024x1024.params"
    obst_file = "data/obstacles_1024x1024.dat"
    params = read_params(deck)
    mask, num_free = read_obstacles(obst_file, params.nx, params.ny)
    params = params.with_free_cells(num_free)
    n_steps = params.max_iters  # 20000, the reference benchmark length

    platform = jax.devices()[0].platform
    backend = "pallas" if platform != "cpu" else "jnp"
    log(f"platform={platform} backend={backend} grid={params.nx}x{params.ny} "
        f"steps={n_steps}")

    mesh = get_mesh(n_devices=1)
    runner = make_runner(params, n_steps, mesh=mesh, backend=backend)
    obst = jnp.asarray(mask)

    # Warm-up / compile on a fresh state; readback forces execution (the
    # tunneled platform's block_until_ready is unreliable for timing). The
    # warm-up run is also timed as a fallback measurement: the shared chip
    # occasionally degrades several-fold for minutes, and the time budget
    # below keeps the benchmark from hanging inside such a window.
    t_start = time.perf_counter()
    f = initial_state(params)
    t0 = time.perf_counter()
    f, av = runner(f, obst)
    tail = float(av[-1])
    warm = time.perf_counter() - t0
    log(f"warmup (incl compile): {warm:.3f} s  av[-1]={tail:.6E}")

    best = warm
    for rep in range(3):
        if time.perf_counter() - t_start > 240:
            log("time budget exhausted; using measurements so far")
            break
        g = initial_state(params)
        t0 = time.perf_counter()
        g, av = runner(g, obst)
        tail = float(av[-1])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"rep {rep}: {dt:.3f} s  av[-1]={tail:.6E}")

    # Sanity: physics must still be right (Reynolds ~3.3763 on this deck).
    reynolds = tail * params.reynolds_dim / params.viscosity
    log(f"reynolds={reynolds:.4f} (reference float build: ~3.3763)")
    if not (3.2 < reynolds < 3.6):
        log("WARNING: Reynolds number outside expected range — result suspect")

    mlups = params.nx * params.ny * n_steps / best / 1e6
    print(json.dumps({
        "metric": f"mlups_1024x1024_{n_steps}steps",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
    }))


if __name__ == "__main__":
    main()
