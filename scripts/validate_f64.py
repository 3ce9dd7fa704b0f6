#!/usr/bin/env python
"""Independent float64 oracle study.

A self-contained NumPy double-precision D2Q9-BGK implementation, written
directly from the physics specification (not sharing any code with the
framework), run against (a) the shipped reference goldens — which come from
the reference's DOUBLE build — and (b) the framework's float32 jnp oracle.

Expected outcome (recorded in docs/VALIDATION.md): the f64 oracle matches the
goldens to float-print precision, proving the discretization is exactly the
reference's; the framework's f32 path drifts O(0.1%) from both, which is the
float rounding budget the 1% acceptance gate absorbs.

Usage: python scripts/validate_f64.py [deck=128x128] [steps=2000]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tpulbm.io.obstacles import read_obstacles  # noqa: E402
from tpulbm.io.params_file import read_params  # noqa: E402

# D2Q9 constants, written out from the stencil definition.
C = np.array(
    [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1),
     (1, 1), (-1, 1), (-1, -1), (1, -1)]
)
W = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)
OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6])


def run_f64(params, obst, n_steps):
    ny, nx = params.ny, params.nx
    rho0 = params.density
    f = np.empty((9, ny, nx), dtype=np.float64)
    for k in range(9):
        f[k] = rho0 * W[k]
    w1 = rho0 * params.accel / 9.0
    w2 = rho0 * params.accel / 36.0
    omega = params.omega
    free = ~obst
    inv_free = 1.0 / free.sum()
    row = ny - 2
    av = np.empty(n_steps)
    for step in range(n_steps):
        # inflow acceleration with positivity guard
        ok = free[row] & (f[3, row] > w1) & (f[6, row] > w2) & (f[7, row] > w2)
        f[1, row][ok] += w1
        f[3, row][ok] -= w1
        for k, s in ((5, 1), (6, -1), (7, -1), (8, 1)):
            f[k, row][ok] += s * w2
        # pull streaming (periodic both axes)
        t = np.empty_like(f)
        for k in range(9):
            t[k] = np.roll(f[k], (C[k, 1], C[k, 0]), axis=(0, 1))
        # macroscopics + BGK equilibrium
        rho = t.sum(axis=0)
        mx = t[1] + t[5] + t[8] - t[3] - t[6] - t[7]
        my = t[2] + t[5] + t[6] - t[4] - t[7] - t[8]
        usq = mx * mx + my * my
        feq = np.empty_like(t)
        for k in range(9):
            cu = C[k, 0] * mx + C[k, 1] * my
            feq[k] = W[k] * (rho + 3 * cu + 1.5 / rho * (3 * cu * cu - usq))
        out = t + omega * (feq - t)
        # bounce-back on obstacles
        for k in range(9):
            out[k][obst] = t[OPP[k]][obst]
        f = out
        av[step] = (np.sqrt(usq[free]) / rho[free]).sum() * inv_free
    return f, av


def run_f64_jax(params, obst, n_steps):
    """XLA-compiled port of ``run_f64`` (same from-spec arithmetic, float64,
    ``lax.scan`` over steps) for golden generation at sizes where the
    interpreted NumPy loop is impractical on this 1-core host (1024^2 x
    20000 steps ~ 7 h NumPy). Not bitwise vs ``run_f64`` — XLA may
    reassociate — but cross-checked against it to ~1e-13 over hundreds of
    steps (tests/test_physics.py::test_f64_jax_oracle_matches_numpy_oracle),
    and every golden generated from it is additionally gated against the
    reference double build's FULL av_vels series at 1e-4
    (scripts/make_f64_goldens.py)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # Snapshot the global jax config and restore it on exit: flipping
    # jax_enable_x64 (and jax_platforms) permanently would silently give any
    # later in-process f32 framework code x64 promotion semantics.
    prev_x64 = jax.config.jax_enable_x64
    prev_platforms = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    ny, nx = params.ny, params.nx
    rho0 = float(params.density)
    w1 = rho0 * float(params.accel) / 9.0
    w2 = rho0 * float(params.accel) / 36.0
    omega = float(params.omega)
    obst_j = jnp.asarray(obst)
    free = ~obst_j
    inv_free = 1.0 / int(np.asarray(free).sum())
    row = ny - 2
    f0 = (jnp.asarray(W, dtype=jnp.float64)[:, None, None]
          * rho0 * jnp.ones((9, ny, nx), dtype=jnp.float64))

    def step(f, _):
        ok = free[row] & (f[3, row] > w1) & (f[6, row] > w2) & (f[7, row] > w2)
        for k, d in ((1, w1), (3, -w1), (5, w2), (6, -w2), (7, -w2), (8, w2)):
            f = f.at[k, row].set(jnp.where(ok, f[k, row] + d, f[k, row]))
        t = jnp.stack([
            jnp.roll(f[k], (int(C[k, 1]), int(C[k, 0])), axis=(0, 1))
            for k in range(9)
        ])
        rho = t.sum(axis=0)
        mx = t[1] + t[5] + t[8] - t[3] - t[6] - t[7]
        my = t[2] + t[5] + t[6] - t[4] - t[7] - t[8]
        usq = mx * mx + my * my
        feq = jnp.stack([
            W[k] * (rho + 3 * cu + 1.5 / rho * (3 * cu * cu - usq))
            for k in range(9)
            for cu in (C[k, 0] * mx + C[k, 1] * my,)
        ])
        out = t + omega * (feq - t)
        out = jnp.where(obst_j[None], t[jnp.asarray(OPP)], out)
        av = jnp.where(free, jnp.sqrt(usq) / rho, 0.0).sum() * inv_free
        return out, av

    try:
        f_final, av = jax.jit(
            lambda f: jax.lax.scan(step, f, None, length=n_steps)
        )(f0)
        return np.asarray(f_final), np.asarray(av)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
        jax.config.update("jax_platforms", prev_platforms)


def main():
    deck = sys.argv[1] if len(sys.argv) > 1 else "128x128"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    params = read_params(f"data/input_{deck}.params")
    obst, num_free = read_obstacles(
        f"data/obstacles_{deck}.dat", params.nx, params.ny
    )
    params = params.with_free_cells(num_free)

    print(f"f64 oracle: {deck}, {n_steps} steps ...", flush=True)
    _, av64 = run_f64(params, obst, n_steps)

    golden = np.loadtxt(
        f"tests/goldens/{deck}.av_vels.dat", usecols=[1], max_rows=n_steps
    )
    rel_g = np.abs(av64 - golden) / np.abs(golden)
    print(f"f64 vs double-build goldens: max rel {rel_g.max():.3e} "
          f"(mean {rel_g.mean():.3e})")

    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpulbm.core.state import initial_state
    from tpulbm.ops.step_jnp import run_steps

    _, av32 = run_steps(
        initial_state(params), jnp.asarray(obst), params, n_steps
    )
    av32 = np.asarray(av32, dtype=np.float64)
    rel_f = np.abs(av32 - av64) / np.abs(av64)
    print(f"framework f32 vs f64 oracle: max rel {rel_f.max():.3e} "
          f"(mean {rel_f.mean():.3e})")
    rel_fg = np.abs(av32 - golden) / np.abs(golden)
    print(f"framework f32 vs goldens:    max rel {rel_fg.max():.3e} "
          f"(gate 1e-2)")


if __name__ == "__main__":
    main()
