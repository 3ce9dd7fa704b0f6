"""Shared fused-step body for the Pallas window kernels.

All window kernels (1-D K-step, 2-D tiled K-step, RDMA K-step, VMEM-resident)
advance the same physics on a rectangular window: masked inflow acceleration,
pull-streaming via full-window rotates (the window wrap is either the real
torus or garbage absorbed by the margin), BGK collision with bounce-back, and
a per-step |u| partial sum over the owned sub-rectangle. This module is that
body, written once; the kernels own only their data movement.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from tpulbm.core.lattice import CX, CY, NSPEEDS
from tpulbm.core import physics

# Production equilibrium form for all window kernels (read at trace time).
# True = pair-symmetric (~10% fewer flops; tolerance-tier tested); the
# bitwise kernel-vs-oracle differential tests flip this to False, where the
# kernels are bitwise-equal to the canonical jnp oracle (see
# core/physics.equilibrium).
PAIR_SYMMETRIC_DEFAULT = True


def fused_window_steps(
    w: List[jnp.ndarray],
    blocked: jnp.ndarray,
    accel_sel: jnp.ndarray,
    k_steps: int,
    omega: float,
    w1: float,
    w2: float,
    owned: Tuple[slice, slice],
    pair_symmetric: Optional[bool] = None,
    av_mask: Optional[jnp.ndarray] = None,
    sub_read=None,
    sub_rows: int = 0,
    collect=None,
    collect_rows: Optional[Tuple[int, int]] = None,
):
    """Runs ``k_steps`` fused lattice steps on window values ``w`` (nine
    (H, W) planes). ``accel_sel`` selects the accelerated row's cells
    (already modular over the global torus); ``owned`` is the static
    sub-rectangle whose per-step |u| sums are returned. ``av_mask`` (window-
    shaped bool, optional) further restricts the sums — the padded runner
    uses it to exclude periodic-extension mirror rows from the series while
    still evolving them.

    Exact bottom substitution (``sub_read``/``sub_rows``): before each step
    ``s``, window rows [0, sub_rows) are OVERWRITTEN with
    ``sub_read(s)`` — the exact state-``s`` values of those global rows,
    saved by the previous (lower) block of the same kernel call. The
    collide then runs only on rows [sub_rows, H): the bottom margin is no
    longer recomputed, cutting the window recompute from (BY+2m)/BY to
    (BY+m)/BY. The post-roll slice at ``sub_rows`` is sublane-aligned, so
    no relayout is paid. ``collect(s, rows)`` mirrors the other side: at
    each state ``s`` the ``collect_rows`` slab (this block's owned top
    rows) is handed out for the NEXT block's substitution. ``sub_read`` is
    called before ``collect`` so a shared slot buffer reads the previous
    block's slab before overwriting it.

    Returns (w_final, parts) with ``parts`` a list of ``k_steps`` float32
    scalars; with substitution active, w_final rows [0, sub_rows) are
    zeros (callers never read margin rows back).
    """
    if pair_symmetric is None:
        pair_symmetric = PAIR_SYMMETRIC_DEFAULT
    zero = np.float32(0.0)
    w1f = np.float32(w1)
    w2f = np.float32(w2)
    wy, wx = w[0].shape
    free = jnp.logical_not(blocked)
    off = sub_rows if sub_read is not None else 0
    blocked_c = blocked[off:] if off else blocked
    av_mask_c = av_mask[off:] if (off and av_mask is not None) else av_mask
    parts = []
    for s in range(k_steps):
        if sub_read is not None:
            subs = sub_read(s)
        if collect is not None:
            r0, rs = collect_rows
            collect(s, [w[c][r0 : r0 + rs] for c in range(NSPEEDS)])
        if sub_read is not None:
            w = [
                jnp.concatenate([subs[c], w[c][sub_rows:]], axis=0)
                for c in range(NSPEEDS)
            ]
        # inflow acceleration (d2q9-bgk.c:442-478)
        mask = (
            accel_sel
            & free
            & (w[3] - w1f > zero)
            & (w[6] - w2f > zero)
            & (w[7] - w2f > zero)
        )
        dw1 = jnp.where(mask, w1f, zero)
        dw2 = jnp.where(mask, w2f, zero)
        w = [
            w[0], w[1] + dw1, w[2], w[3] - dw1, w[4],
            w[5] + dw2, w[6] - dw2, w[7] - dw2, w[8] + dw2,
        ]
        # pull-streaming via window rotates (d2q9-bgk.c:520-540)
        t = []
        for c in range(NSPEEDS):
            v = w[c]
            if CY[c] != 0:
                v = pltpu.roll(v, CY[c] % wy, 0)
            if CX[c] != 0:
                v = pltpu.roll(v, CX[c] % wx, 1)
            if off:
                v = v[off:]  # sublane-aligned: collide skips the margin
            t.append(v)
        out, speed = physics.collide(t, blocked_c, omega, pair_symmetric)
        if av_mask_c is not None:
            speed = jnp.where(av_mask_c, speed, zero)
        row_slc = owned[0] if off == 0 else slice(
            owned[0].start - off, owned[0].stop - off
        )
        parts.append(
            jnp.sum(speed[row_slc, owned[1]], dtype=jnp.float32)
        )
        if off:
            pad = jnp.zeros((off, wx), jnp.float32)
            w = [jnp.concatenate([pad, o], axis=0) for o in out]
        else:
            w = out
    return w, parts
