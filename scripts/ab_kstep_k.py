#!/usr/bin/env python
"""(K, BY) sweep for the 1-D K-step kernel on the 1024x1024 deck.

With the row-narrowed compute window (compute on BY + 2K rows while DMA
margins stay 8), smaller K trades HBM traffic for less window recompute:
per owned cell the VPU work scales with (BY + 2K)/BY and the HBM traffic
with (2BY + 16)/BY per K steps. This sweep measures where the trade lands
on hardware. All variants run in one process (within-process ratios are
the only reliable signal on the shared chip); best-of-N with host readback.

    python scripts/ab_kstep_k.py [--steps 2000] [--reps 2]
"""

import argparse
import functools
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--grid", default="1024x1024")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.dist.mesh import get_mesh
    from tpulbm.dist.runner import _make_kstep_runner
    from tpulbm.io.obstacles import read_obstacles
    from tpulbm.io.params_file import read_params
    from tpulbm.ops import pallas_kstep

    params = read_params(f"data/input_{args.grid}.params")
    mask, num_free = read_obstacles(
        f"data/obstacles_{args.grid}.dat", params.nx, params.ny
    )
    params = params.with_free_cells(num_free)
    obst = jnp.asarray(mask)
    mesh = get_mesh(n_devices=1)
    n = args.steps

    variants = []
    for k, by in [(8, 32), (4, 32), (2, 32), (4, 64), (2, 64), (8, 64),
                  (2, 128), (4, 128)]:
        if n % k or params.ny % by:
            continue
        variants.append((
            f"k{k}-by{by}",
            functools.partial(
                _make_kstep_runner, params, n, mesh, k=k,
                alias_donor=True,
                maker=functools.partial(pallas_kstep.make_kstep, by=by),
            ),
        ))

    results = {}
    for label, build in variants:
        try:
            r = build()
        except Exception as e:
            log(f"{label}: build failed: {type(e).__name__}: {str(e)[:120]}")
            continue
        try:
            f = initial_state(params)
            t0 = time.perf_counter()
            f, av = r(f, obst)
            tail = float(av[-1])
            warm = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.reps):
                g = initial_state(params)
                t0 = time.perf_counter()
                g, av = r(g, obst)
                tail = float(av[-1])
                best = min(best, time.perf_counter() - t0)
            us = best / n * 1e6
            mlups = params.ny * params.nx * n / best / 1e6
            results[label] = (us, mlups)
            log(f"{label}: warm={warm:.1f}s {us:.1f} us/step "
                f"{mlups:.0f} MLUPS av={tail:.4E}")
        except Exception as e:
            log(f"{label}: run failed: {type(e).__name__}: {str(e)[:160]}")

    ranked = sorted(results.items(), key=lambda kv: kv[1][0])
    for label, (us, mlups) in ranked:
        print(f"{label}\t{us:.1f} us/step\t{mlups:.0f} MLUPS")


if __name__ == "__main__":
    sys.exit(main())
