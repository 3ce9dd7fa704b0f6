"""Lane-fold layout: evolve (ny, nx) as (ny*F, nx/F) — the folded grid.

Wide grids (nx > 1536) fall off the ratio-1.0 1-D skew tier because a full
row exceeds the hardware-probed VMEM window budget; the 2-D tiled skew that
catches them runs ~13% slower (window-ratio overhead + exposed realignment
rolls, docs/measurements/round4.md). The fold routes AROUND that wall: split
each row into F strips of width W = nx/F and interleave them in y,

    G[c, y*F + s, x'] = f[c, y, s*W + x']        (s in [0, F), x' in [0, W))

which is **literally ``f.reshape(9, ny*F, W)``** — a free relayout (the
strips of one row are contiguous, so the folded row-major order IS the
original row-major order). Under the fold the D2Q9 pull stencil becomes:

- y-shifts: uniform folded-row shifts by F*CY[c], torus-periodic mod ny*F
  (the interleaving makes the y-wrap land in the right strip by itself);
- x-shifts: lane shifts by CX[c] whose WRAP lane re-aims one folded row off
  — the +x wrap of (r, 0) is (r-1, W-1) for strips s>0 and (r+F-1, W-1)
  for s=0 (the true torus x-wrap), and mirrored for -x. Only one lane
  column per shifted channel needs the re-aim — the same in-register patch
  family as window_step.x_wrap_patch, with a row shift (the strip carry).
- the accelerated row ny-2 becomes F consecutive folded rows
  [(ny-2)*F, (ny-2)*F + F).

Physics arithmetic is untouched — fold, evolve, unfold is bitwise the
unfolded evolution (tests/test_fold.py pins this against ops/step_jnp);
only the |u| series reduces in a different shape (addition order), the
same caveat as every tiled kernel.

This module holds the fold/unfold helpers and the folded-space jnp oracle;
ops/pallas_kstep_skew_fold.py is the production-candidate kernel measured
against the 2-D tiled skew (round-5 verdict item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpulbm.core.lattice import CX, CY, NSPEEDS
from tpulbm.core.params import LBMParams
from tpulbm.core import physics


def fold(f: jnp.ndarray, F: int) -> jnp.ndarray:
    """(..., ny, nx) -> (..., ny*F, nx/F); a pure reshape (free)."""
    *lead, ny, nx = f.shape
    assert nx % F == 0, (nx, F)
    return f.reshape(*lead, ny * F, nx // F)


def unfold(g: jnp.ndarray, F: int) -> jnp.ndarray:
    """(..., ny*F, W) -> (..., ny, W*F); inverse of fold (also free)."""
    *lead, hf, w = g.shape
    assert hf % F == 0, (hf, F)
    return g.reshape(*lead, hf // F, w * F)


def strip_masks(n_rows: int, F: int, base: int = 0):
    """(s0, sF1): boolean (n_rows, 1) masks of folded rows whose strip index
    ((base + r) mod F) is 0 / F-1 — the rows whose x-wrap lane crosses the
    true torus x-boundary."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0) + base
    s = jax.lax.rem(r, F)
    return s == 0, s == F - 1


def pull_folded(g: jnp.ndarray, F: int) -> list[jnp.ndarray]:
    """Folded-space pull streaming: bitwise fold(pull(unfold(g)))."""
    hf, w = g.shape[-2:]
    s0, sF1 = strip_masks(hf, F)
    t = []
    for k in range(NSPEEDS):
        v = g[k]
        if CY[k] != 0:
            v = jnp.roll(v, F * CY[k], axis=0)
        if CX[k] != 0:
            v_pre = v
            v = jnp.roll(v, CX[k], axis=1)
            if CX[k] == 1:
                # wrap lane 0: row above-strip carry (s>0 -> r-1; s=0 ->
                # r+F-1, the torus x-wrap landing in strip F-1)
                src = jnp.where(
                    s0,
                    jnp.roll(v_pre, -(F - 1), axis=0)[:, -1:],
                    jnp.roll(v_pre, 1, axis=0)[:, -1:],
                )
                v = jnp.concatenate([src, v[:, 1:]], axis=1)
            else:
                src = jnp.where(
                    sF1,
                    jnp.roll(v_pre, F - 1, axis=0)[:, :1],
                    jnp.roll(v_pre, -1, axis=0)[:, :1],
                )
                v = jnp.concatenate([v[:, :-1], src], axis=1)
        t.append(v)
    return t


def accelerate_folded(g: jnp.ndarray, obstacles_g: jnp.ndarray,
                      params: LBMParams, F: int) -> jnp.ndarray:
    """Masked inflow acceleration on the F folded rows of global row ny-2
    (bitwise ops/step_jnp.accelerate under the fold)."""
    w1 = jnp.float32(params.accel_w1)
    w2 = jnp.float32(params.accel_w2)
    rows = slice(params.accel_row * F, params.accel_row * F + F)
    f3, f6, f7 = g[3, rows], g[6, rows], g[7, rows]
    mask = (
        (~obstacles_g[rows])
        & (f3 - w1 > 0.0)
        & (f6 - w2 > 0.0)
        & (f7 - w2 > 0.0)
    )
    zero = jnp.float32(0.0)
    dw1 = jnp.where(mask, w1, zero)
    dw2 = jnp.where(mask, w2, zero)
    upd = jnp.stack(
        [
            g[1, rows] + dw1,
            g[3, rows] - dw1,
            g[5, rows] + dw2,
            g[6, rows] - dw2,
            g[7, rows] - dw2,
            g[8, rows] + dw2,
        ]
    )
    return g.at[jnp.array([1, 3, 5, 6, 7, 8]), rows].set(upd)


def lbm_step_folded(g: jnp.ndarray, obstacles_g: jnp.ndarray,
                    params: LBMParams, F: int, pair_symmetric: bool = False):
    """One folded-space step; (g', av) bitwise equal (after unfold) to
    ops/step_jnp.lbm_step on the unfolded state (at the default canonical
    equilibrium). Runners using this as a sub-K remainder pass the
    formulation their kernel chunks use (window_step.PAIR_SYMMETRIC_DEFAULT)
    so one run never mixes equilibria step-to-step."""
    g = accelerate_folded(g, obstacles_g, params, F)
    t = pull_folded(g, F)
    out, speed = physics.collide(t, obstacles_g, params.omega, pair_symmetric)
    return jnp.stack(out), jnp.sum(speed, dtype=jnp.float32) * jnp.float32(
        params.free_cells_inv)


# ---------------------------------------------------------------------------
# Row-merge layout: the DUAL of the fold — evolve (ny, nx) as (ny/G, nx*G).
#
# Motivation: unaligned-lane decks (nx % 128 = 64: 320², 448², …) currently
# pay a mirror-column extension tax provably bound at 83-88 % of the aligned
# neighbour (BENCHMARKS.md tier sweep). Merging G consecutive physical rows
# into one wide row,
#
#     M[y, s*nx + x] = f[y*G + s, x]        (s in [0, G), W = G*nx)
#
# is again **literally ``f.reshape(9, ny//G, nx*G)``** — free — and turns
# 320² into an exactly lane-aligned (160, 640) grid with ZERO dead compute.
# Under the merge the D2Q9 pull stencil becomes, per channel:
#
# - ONE combined lane roll by CY*nx + CX (the y-shift's block transition
#   absorbs the x-shift);
# - for CY != 0, a ±1 sublane roll of the SAME rolled plane selected on the
#   boundary block's columns (block 0 for CY=+1, block G-1 for CY=-1) —
#   the merged rows' torus wrap;
# - for CX != 0, G patched lane columns (each block's x-wrap lane), values
#   from the same (V, V2) pair one block over — the strip-carry dual.
#
# The dependence cone stays 1 merged row/step (unlike the fold's 2F-1), so
# the standard K-step skew schedule applies unchanged in merged space.
# Physics arithmetic is untouched: merge, evolve, unmerge is bitwise the
# physical evolution (tests/test_merge.py); only the |u| series reduces in
# a different shape (addition order), as for every tiled kernel.
# ---------------------------------------------------------------------------


def merge(f: jnp.ndarray, G: int) -> jnp.ndarray:
    """(..., ny, nx) -> (..., ny/G, nx*G); a pure reshape (free)."""
    *lead, ny, nx = f.shape
    assert ny % G == 0, (ny, G)
    return f.reshape(*lead, ny // G, nx * G)


def unmerge(m: jnp.ndarray, G: int) -> jnp.ndarray:
    """(..., ny/G, W) -> (..., ny, W/G); inverse of merge (also free)."""
    *lead, h, w = m.shape
    assert w % G == 0, (w, G)
    return m.reshape(*lead, h * G, w // G)


def pull_merged(m: jnp.ndarray, G: int, nx: int) -> list[jnp.ndarray]:
    """Merged-space pull streaming: bitwise merge(pull(unmerge(m)))."""
    h, W = m.shape[-2:]
    assert W == G * nx, (W, G, nx)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    blk = col // nx
    t = []
    for k in range(NSPEEDS):
        cy, cx = CY[k], CX[k]
        v = m[k]
        if cy == 0 and cx == 0:
            t.append(v)
            continue
        v = jnp.roll(v, cy * nx + cx, axis=1)
        if cy != 0:
            v2 = jnp.roll(v, cy, axis=0)
            boundary = 0 if cy == 1 else G - 1
            sel = v2 if G == 1 else jnp.where(blk == boundary, v2, v)
        else:
            v2, boundary, sel = None, None, v
        if cx != 0:
            # each block's x-wrap lane re-aims one block over (same
            # physical row): value = the (v, v2) pair at column ±nx
            for s in range(G):
                if cx == 1:
                    dst = s * nx
                    src = (dst + nx) % W
                else:
                    dst = s * nx + nx - 1
                    src = (dst - nx) % W
                plane = v2 if (cy != 0 and s == boundary) else v
                sel = sel.at[:, dst].set(plane[:, src])
        t.append(sel)
    return t


def accelerate_merged(m: jnp.ndarray, obstacles_m: jnp.ndarray,
                      params: LBMParams, G: int, nx: int) -> jnp.ndarray:
    """Masked inflow acceleration on the merged image of global row ny-2
    (one block-column range of one merged row; bitwise
    ops/step_jnp.accelerate under the merge)."""
    w1 = jnp.float32(params.accel_w1)
    w2 = jnp.float32(params.accel_w2)
    y = params.accel_row // G
    s = params.accel_row % G
    cols = slice(s * nx, (s + 1) * nx)
    f3, f6, f7 = m[3, y, cols], m[6, y, cols], m[7, y, cols]
    mask = (
        (~obstacles_m[y, cols])
        & (f3 - w1 > 0.0)
        & (f6 - w2 > 0.0)
        & (f7 - w2 > 0.0)
    )
    zero = jnp.float32(0.0)
    dw1 = jnp.where(mask, w1, zero)
    dw2 = jnp.where(mask, w2, zero)
    upd = jnp.stack(
        [
            m[1, y, cols] + dw1,
            m[3, y, cols] - dw1,
            m[5, y, cols] + dw2,
            m[6, y, cols] - dw2,
            m[7, y, cols] - dw2,
            m[8, y, cols] + dw2,
        ]
    )
    return m.at[jnp.array([1, 3, 5, 6, 7, 8]), y, cols].set(upd)


def lbm_step_merged(m: jnp.ndarray, obstacles_m: jnp.ndarray,
                    params: LBMParams, G: int, nx: int,
                    pair_symmetric: bool = False):
    """One merged-space step; (m', av) bitwise equal (after unmerge) to
    ops/step_jnp.lbm_step on the physical state (same remainder-formulation
    contract as lbm_step_folded)."""
    m = accelerate_merged(m, obstacles_m, params, G, nx)
    t = pull_merged(m, G, nx)
    out, speed = physics.collide(t, obstacles_m, params.omega, pair_symmetric)
    return jnp.stack(out), jnp.sum(speed, dtype=jnp.float32) * jnp.float32(
        params.free_cells_inv)
