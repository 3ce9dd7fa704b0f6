#!/usr/bin/env python
"""Quick TPU-pool health probe.

Runs a short 1024x1024 kstep scan and reports us/step. Healthy windows
cluster near ~78 us/step end-to-end on this part (BENCHMARKS.md); multiples
of that mean the shared chip/compile service is degraded and absolute
benchmark numbers are meaningless.

    python scripts/tpu_health.py        -> prints one line, exit 0 healthy
                                           (<1.6x nominal), exit 1 degraded
"""

import sys
import time

# Healthy-window end-to-end wall on the skew-era production runner with the
# state upload settled before the clock: 0.841 s / 20000 steps = 42.1
# us/step (bench_artifacts/1024x1024.json, round 5; device 40.8). Earlier
# nominals (55.5, 78) included an in-flight 36 MB upload in the timed
# region (scripts/attribute_wall.py).
NOMINAL_US = 42.1


def main():
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import make_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params

    params = read_params("data/input_1024x1024.params")
    mask, nf = read_obstacles("data/obstacles_1024x1024.dat", 1024, 1024)
    params = params.with_free_cells(nf)
    obst = jnp.asarray(mask)
    n = 1000
    runner = make_runner(params, n, mesh=get_mesh(n_devices=1),
                         backend="pallas")
    float(obst.sum())
    f = initial_state(params)
    float(f[0, 0, 0])  # settle the upload: a 36 MB transfer would dwarf
    t0 = time.perf_counter()  # the 1000-step probe (attribute_wall.py)
    f, av = runner(f, obst)
    _ = float(av[-1])
    warm = time.perf_counter() - t0
    best = float("inf")
    for _rep in range(2):
        g = initial_state(params)
        float(g[0, 0, 0])
        t0 = time.perf_counter()
        g, av = runner(g, obst)
        _ = float(av[-1])
        best = min(best, time.perf_counter() - t0)
    us = best / n * 1e6
    ratio = us / NOMINAL_US
    state = "HEALTHY" if ratio < 1.6 else "DEGRADED"
    print(f"{state} {us:.1f} us/step ({ratio:.2f}x nominal; warmup {warm:.1f}s)")
    return 0 if ratio < 1.6 else 1


if __name__ == "__main__":
    sys.exit(main())
