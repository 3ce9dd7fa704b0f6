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

import jax
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

# Cost-model instrumentation (scripts/ab_cost_breakdown.py ONLY): names in
# this set skip that stage at trace time, so device-time diffs isolate each
# stage's share. Production never touches it — physics is wrong when set.
COST_SKIP: set = set()

# interpret=None resolution for every kernel maker. The override exists for
# compile-evidence tests that lower genuine Mosaic kernels (interpret=False)
# from a CPU-mesh process via jax.export(platforms=["tpu"]) — see
# tests/test_hlo_collectives.py.
INTERPRET_DEFAULT_OVERRIDE: Optional[bool] = None


def default_interpret() -> bool:
    if INTERPRET_DEFAULT_OVERRIDE is not None:
        return INTERPRET_DEFAULT_OVERRIDE
    return jax.devices()[0].platform == "cpu"


# x_wrap_patch formulation A/B knob (flip only via scripts/ab_xpad_patch.py;
# physics-identical, tests pin bitwise equality of all modes):
#   "concat" — rebuild the plane as concat([src, v[1:]]) / concat([v[:-1],
#              src]): no fine-grained update primitive at all. PRODUCTION
#              DEFAULT — measured +2% over "where" at 320²/448² (r4),
#              putting the unaligned decks at 94-95% of their geometric
#              lane-tiling bound (docs/measurements/round4.md)
#   "where"  — iota + full-window select (r3 default)
#   "at_set" — .at[col].set(): lowers to scatter, which hardware Mosaic
#              REJECTS (NotImplementedError, measured r4) — interpret-only
#   "dus"    — lax.dynamic_update_slice with static indices: ALSO rejected
#              by hardware Mosaic (NotImplementedError, measured r4)
X_PATCH_MODE = "concat"


def _patch_col(v: jnp.ndarray, src: jnp.ndarray, col: int) -> jnp.ndarray:
    """Substitute one lane column at ANY static position per X_PATCH_MODE
    (edge columns for the x-extension wrap re-aims; mid-plane columns for
    the merged layout's per-block x-wrap lanes)."""
    if X_PATCH_MODE == "at_set":
        return v.at[..., col : col + 1].set(src)
    if X_PATCH_MODE == "dus":
        start = (0,) * (v.ndim - 1) + (col,)
        return jax.lax.dynamic_update_slice(v, src, start)
    if X_PATCH_MODE == "concat":
        if col == 0:
            return jnp.concatenate([src, v[..., 1:]], axis=-1)
        if col == v.shape[-1] - 1:
            return jnp.concatenate([v[..., :col], src], axis=-1)
        return jnp.concatenate([v[..., :col], src, v[..., col + 1 :]],
                               axis=-1)
    cid = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    return jnp.where(cid == col, src, v)


def merged_stream_channel(
    v: jnp.ndarray,
    cy: int,
    cx: int,
    merge_g: int,
    phys_nx: int,
    bmask0,
    bmask_g1,
    realign: int = 0,
    row_window=None,
):
    """Row-merge pull streaming of ONE channel plane (ops/fold.py merge
    family): the physical (ny, nx) torus evolved in the merged
    (ny/G, W = G*nx) layout. The physical CY shift becomes part of ONE
    combined lane roll by ``cy*nx + cx`` plus a ±1 row carry on the
    boundary block's columns (block 0 for cy=+1, block G-1 for cy=-1 —
    the merged rows' torus wrap); each block's x-wrap lane re-aims one
    block over (``_patch_col``), values from the same (v1, v2) pair.

    ``realign`` adds the skew schedule's constant row slide (0 for the
    classic recompute, +1 for the skewed main kernel) and ``row_window``
    (start, size) slices the valid rows AFTER the row rolls (the lane roll
    runs on the full window — one big roll beats two sliced ones).
    ``bmask0``/``bmask_g1`` are the static boundary-block column masks at
    the POST-slice shape. Bitwise fold.pull_merged (pure data movement)."""
    wy, W = v.shape
    L = (cy * phys_nx + cx) % W
    if L:
        v = pltpu.roll(v, L, 1)

    def rows(r):
        r %= wy
        u = pltpu.roll(v, r, 0) if r else v
        if row_window is not None:
            u = u[row_window[0] : row_window[0] + row_window[1], :]
        return u

    v1 = rows(realign)
    if cy != 0 and "mselect" not in COST_SKIP:
        v2 = rows(realign + cy)
        out = jnp.where(bmask0 if cy == 1 else bmask_g1, v2, v1)
    else:
        v2, out = None, v1
    if cx != 0 and "mpatch" not in COST_SKIP:
        bnd = 0 if cy == 1 else merge_g - 1
        for s in range(merge_g):
            if cx == 1:
                dst = s * phys_nx
                src = (dst + phys_nx) % W
            else:
                dst = s * phys_nx + phys_nx - 1
                src = (dst - phys_nx) % W
            plane = v2 if (cy != 0 and v2 is not None and s == bnd) else v1
            out = _patch_col(out, plane[:, src : src + 1], dst)
    return out


def merged_block_masks(rows: int, W: int, merge_g: int, phys_nx: int):
    """(bmask0, bmask_g1): static (rows, W) column masks of blocks 0 and
    G-1 for merged_stream_channel."""
    blk = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1) // phys_nx
    return blk == 0, blk == merge_g - 1


def x_wrap_patch(v: jnp.ndarray, v_pre: jnp.ndarray, cx: int,
                 x_canon: int) -> jnp.ndarray:
    """Re-aim a lane roll's wrap column for a periodically x-extended window
    (see fused_window_steps ``x_canon``). ``v`` is the post-roll plane,
    ``v_pre`` the pre-roll one; |cx| == 1 (D2Q9)."""
    wx = v.shape[-1]
    if cx == 1:
        # col 0 wrongly reads mirror col wx-1; the true left wrap of col 0
        # is canonical col x_canon-1
        return _patch_col(v, v_pre[..., x_canon - 1 : x_canon], 0)
    # cx == -1: col wx-1 (mirror of col wx-1-x_canon... i.e. canonical col
    # wx-x_canon-1's mirror) wrongly reads col 0; its true right wrap is
    # col wx-x_canon
    return _patch_col(v, v_pre[..., wx - x_canon : wx - x_canon + 1], wx - 1)


def accel_update(w: List[jnp.ndarray], sel_free: jnp.ndarray,
                 w1f: np.float32, w2f: np.float32) -> List[jnp.ndarray]:
    """Masked inflow acceleration (d2q9-bgk.c:442-478) on nine window planes.
    ``sel_free`` pre-combines the accelerated-row selection with the free
    mask; the positivity knife-edge guard is applied here."""
    zero = np.float32(0.0)
    mask = (
        sel_free
        & (w[3] - w1f > zero)
        & (w[6] - w2f > zero)
        & (w[7] - w2f > zero)
    )
    dw1 = jnp.where(mask, w1f, zero)
    dw2 = jnp.where(mask, w2f, zero)
    return [
        w[0], w[1] + dw1, w[2], w[3] - dw1, w[4],
        w[5] + dw2, w[6] - dw2, w[7] - dw2, w[8] + dw2,
    ]


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
    sub_axis: int = 0,
    owned_alt: Optional[Tuple[slice, slice]] = None,
    collide_split: int = 1,
    owned_step_dy: int = 0,
    x_canon: Optional[int] = None,
    merge_g: int = 0,
    phys_nx: int = 0,
):
    """Runs ``k_steps`` fused lattice steps on window values ``w`` (nine
    (H, W) planes). ``accel_sel`` selects the accelerated row's cells
    (already modular over the global torus); ``owned`` is the static
    sub-rectangle whose per-step |u| sums are returned. ``av_mask`` (window-
    shaped bool, optional) further restricts the sums — the padded runner
    uses it to exclude periodic-extension mirror rows from the series while
    still evolving them.

    Exact leading-margin substitution (``sub_read``/``sub_rows``): before
    each step ``s``, the window's leading ``sub_rows`` slices along
    ``sub_axis`` (rows for the 1-D kernel's bottom margin, columns for the
    2-D kernel's left margin) are OVERWRITTEN with ``sub_read(s)`` — the
    exact state-``s`` values of those global cells, saved by the previous
    block of the same kernel call. The collide then skips the leading
    margin entirely: it is no longer recomputed. The post-roll slice at
    ``sub_rows`` must be tile-aligned for the axis (8 sublanes / 128
    lanes) so no relayout is paid. ``collect(s, slabs)`` mirrors the
    trailing side: at each state ``s`` the ``collect_rows`` (start, size)
    slab along ``sub_axis`` is handed out for the NEXT block's
    substitution. ``sub_read`` is called before ``collect`` so a shared
    slot buffer reads the previous block's slab before overwriting it.

    Returns (w_final, parts) with ``parts`` a list of ``k_steps`` float32
    scalars; with substitution active, w_final's leading margin is zeros
    (callers never read margin cells back).

    ``collide_split`` chunks the (pointwise) collide along rows into that
    many sublane-aligned pieces, capping Mosaic's peak live-vector VMEM:
    the collide's ~dozen temporaries then live on a window fraction instead
    of the whole window, which is what lets BY=64-class windows compile
    (round-2 rejected BY=64 because the fused body's live set blew VMEM,
    docs/measurements/round2.md "BY=64/128"). Physics is unchanged — the
    collide has no cross-cell terms (all coupling is in the rolls), so
    chunk boundaries are bitwise-invisible.

    ``owned_step_dy``: per-step row slide of the owned sum slice — at step
    ``s`` the owned rows become ``[start + s*dy, stop + s*dy)``. Used by the
    skew-fix kernel (ops/pallas_kstep_skew.py), whose sum coverage tracks
    the skewed main kernel's sliding valid region.

    ``merge_g``/``phys_nx``: ROW-MERGED LAYOUT — the window holds the
    merged (ny/G, G*nx) image of the physical torus (ops/fold.py merge
    family); streaming goes through ``merged_stream_channel`` (one combined
    lane roll + boundary-block row carry + per-block x-wrap lane patches)
    instead of the plain CY/CX rolls. Mutually exclusive with ``x_canon``
    and the margin-substitution machinery (the merged window is always
    full-width). The caller's ``accel_sel`` must already carry the
    accelerated row's block-column restriction.

    ``x_canon``: PERIODIC X-EXTENSION — the window's columns [x_canon, W)
    are mirror copies of columns [0, W - x_canon) (lane-padding an nx that
    is not a 128-multiple up to the tile width). The CX rolls then wrap at
    the wrong column; one select per rolled channel re-aims it — column 0
    reads pre-roll column x_canon-1 (the true torus left wrap) and column
    W-1 reads pre-roll column W-x_canon — which keeps every mirror column
    evolving bitwise-identically to its canonical (the in-register analog
    of the padded row runner's shifted wrap slabs). Mirror columns are
    excluded from the per-step |u| sums.
    """
    if pair_symmetric is None:
        pair_symmetric = PAIR_SYMMETRIC_DEFAULT
    zero = np.float32(0.0)
    w1f = np.float32(w1)
    w2f = np.float32(w2)
    wy, wx = w[0].shape
    free = jnp.logical_not(blocked)
    off = sub_rows if sub_read is not None else 0
    bm0 = bm_g1 = None
    if merge_g > 1:
        assert x_canon is None and sub_read is None and collect is None, \
            "merged streaming is full-width only"
        bm0, bm_g1 = merged_block_masks(wy, wx, merge_g, phys_nx)

    def cut(a):
        # drop the leading margin along sub_axis
        return (a[off:] if sub_axis == 0 else a[:, off:]) if off else a

    def lead_slice(a, start, size):
        return a[start : start + size] if sub_axis == 0 else \
            a[:, start : start + size]

    blocked_c = cut(blocked)
    av_mask_c = cut(av_mask) if av_mask is not None else None
    xmask_c = None
    if x_canon is not None and x_canon != wx:
        assert sub_axis == 0, "x_canon with a column margin is unsupported"
        xmask_c = (
            jax.lax.broadcasted_iota(jnp.int32, blocked_c.shape, 1) < x_canon
        )
    parts = []
    for s in range(k_steps):
        if sub_read is not None:
            subs = sub_read(s)
        if collect is not None:
            r0, rs = collect_rows
            collect(s, [lead_slice(w[c], r0, rs) for c in range(NSPEEDS)])
        if sub_read is not None:
            def fill(sc):
                # A provider may hand back fewer slices than the margin —
                # the minimal exact requirement is ONE (the cell row
                # adjacent to the computed region); broadcast it across the
                # margin (the other copies are garbage-equivalent, absorbed
                # exactly like the recomputed margin they replace).
                if sc.shape[sub_axis] < sub_rows:
                    tgt = list(sc.shape)
                    tgt[sub_axis] = sub_rows
                    sc = jnp.broadcast_to(sc, tuple(tgt))
                return sc

            w = [
                jnp.concatenate(
                    [fill(subs[c]),
                     lead_slice(w[c], sub_rows,
                                w[c].shape[sub_axis] - sub_rows)],
                    axis=sub_axis,
                )
                for c in range(NSPEEDS)
            ]
        # inflow acceleration (d2q9-bgk.c:442-478)
        if "accel" not in COST_SKIP:
            w = accel_update(w, accel_sel & free, w1f, w2f)
        # pull-streaming via window rotates (d2q9-bgk.c:520-540)
        t = []
        for c in range(NSPEEDS):
            v = w[c]
            if "roll" not in COST_SKIP:
                if merge_g > 1:
                    v = merged_stream_channel(
                        v, CY[c], CX[c], merge_g, phys_nx, bm0, bm_g1)
                else:
                    if CY[c] != 0:
                        v = pltpu.roll(v, CY[c] % wy, 0)
                    if CX[c] != 0:
                        v_pre = v
                        v = pltpu.roll(v, CX[c] % wx, 1)
                        if x_canon is not None and x_canon != wx:
                            v = x_wrap_patch(v, v_pre, CX[c], x_canon)
            if off:
                v = cut(v)  # tile-aligned: collide skips the margin
            t.append(v)
        if "collide" in COST_SKIP:
            out, speed = list(t), t[0]
        elif collide_split > 1:
            rows = t[0].shape[0]
            # sublane-aligned chunk starts; last chunk absorbs the remainder
            step8 = -(-rows // (8 * collide_split)) * 8
            starts = list(range(0, rows, step8))
            outs, speeds = [], []
            for r0 in starts:
                r1 = min(r0 + step8, rows)
                o_c, s_c = physics.collide(
                    [p[r0:r1] for p in t], blocked_c[r0:r1], omega,
                    pair_symmetric,
                    compute_speed="speed" not in COST_SKIP,
                )
                outs.append(o_c)
                speeds.append(s_c)
            out = [jnp.concatenate([o[c] for o in outs], axis=0)
                   for c in range(NSPEEDS)]
            speed = jnp.concatenate(speeds, axis=0)
        else:
            out, speed = physics.collide(
                t, blocked_c, omega, pair_symmetric,
                compute_speed="speed" not in COST_SKIP,
            )
        if av_mask_c is not None:
            speed = jnp.where(av_mask_c, speed, zero)
        if xmask_c is not None:
            speed = jnp.where(xmask_c, speed, zero)
        def part_of(slc):
            o_r, o_c = slc
            if off and sub_axis == 0:
                o_r = slice(o_r.start - off, o_r.stop - off)
            elif off and sub_axis == 1:
                o_c = slice(o_c.start - off, o_c.stop - off)
            if owned_step_dy:
                o_r = slice(o_r.start + s * owned_step_dy,
                            o_r.stop + s * owned_step_dy)
            return jnp.sum(speed[o_r, o_c], dtype=jnp.float32)

        parts.append(
            part_of(owned) if owned_alt is None
            else (part_of(owned), part_of(owned_alt))
        )
        if off:
            pad_shape = (off, out[0].shape[1]) if sub_axis == 0 \
                else (out[0].shape[0], off)
            pad = jnp.zeros(pad_shape, jnp.float32)
            w = [jnp.concatenate([pad, o], axis=sub_axis) for o in out]
        else:
            w = out
    return w, parts
