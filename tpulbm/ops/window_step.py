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
):
    """Runs ``k_steps`` fused lattice steps on window values ``w`` (nine
    (H, W) planes). ``accel_sel`` selects the accelerated row's cells
    (already modular over the global torus); ``owned`` is the static
    sub-rectangle whose per-step |u| sums are returned. ``av_mask`` (window-
    shaped bool, optional) further restricts the sums — the padded runner
    uses it to exclude periodic-extension mirror rows from the series while
    still evolving them.

    Returns (w_final, parts) with ``parts`` a list of ``k_steps`` float32
    scalars.
    """
    if pair_symmetric is None:
        pair_symmetric = PAIR_SYMMETRIC_DEFAULT
    zero = np.float32(0.0)
    w1f = np.float32(w1)
    w2f = np.float32(w2)
    wy, wx = w[0].shape
    free = jnp.logical_not(blocked)
    parts = []
    for _ in range(k_steps):
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
            t.append(v)
        w, speed = physics.collide(t, blocked, omega, pair_symmetric)
        if av_mask is not None:
            speed = jnp.where(av_mask, speed, zero)
        parts.append(
            jnp.sum(speed[owned[0], owned[1]], dtype=jnp.float32)
        )
    return w, parts
