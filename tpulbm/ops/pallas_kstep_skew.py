"""Skewed (parallelogram) K-step kernel: temporal blocking with ZERO margin
recompute.

The classic K-step kernel (ops/pallas_kstep.py) pays a margin-recompute tax:
each row block computes on BY + K rows (exact-bottom substitution) to own BY
— a 1.25x VPU-op overhead at BY=32 that is the single largest remaining cost
at 1024^2 (scripts/ab_cost_breakdown.py). This kernel removes it entirely by
SKEWING the block parallelogram: block ``i``'s valid region at intermediate
state ``s`` is global rows ``[i*BY - s, (i+1)*BY - s)`` — it slides DOWN one
row per step, so the top edge never needs data that doesn't exist yet (the
shrink direction supplies itself), and the bottom edge needs exactly TWO rows
below per step, which the previous block (ascending grid order) computed at
that very state and left in a slab scratch. Every collide row is an owned
row: compute/owned ratio 1.0 in y.

The window trick that keeps all hot slices tile-aligned: instead of slicing
a shifting valid region out of a fixed window (sublane relayout per step),
the PULL-streaming roll is fused with a +1 realignment shift — channel ``c``
rolls by ``1 + CY[c]`` in {0, 1, 2} instead of ``CY[c]`` in {-1, 0, 1} — so
the valid region stays at FIXED window rows [8, 8+BY) while the global rows
it represents slide. The obstacle window is rolled by +1 each step for the
same reason (one cheap sublane roll of one plane replaces two relayouts).

Seam handling: block 0 has no previous block in this chunk — its slab reads
are garbage, contaminating the 2K global rows [-K, K) around the torus seam
(values AND |u| sums; its per-step sums use a reduced static slice that
skips them). The seam band is recomputed classically from the chunk's input
state — by default FUSED into this kernel as one extra trailing grid
program (``fused_fix``: the band DMAs start at program 0 and overlap the
whole pipeline, the recompute adds ~1 block of VPU work, and its values DMA
straight into the output — no second pallas_call, band concat, or splices;
measured +0.15 us/step vs the split pair at 1024^2), or by the standalone
``make_skew_fix`` kernel with the same contract (the split path kept for
the 2-D tiled skew and A/B). Because a block's output rows are
``[i*BY - K, (i+1)*BY - K)``, the shard's top K rows are produced by the
NEXT shard's fix pass and arrive via one K-row ppermute (the skew turns the
halo exchange itself into the output exchange; total collective count per
chunk is unchanged: one 2K-row slab up, one K-row slab down).

Reference parity: this fuses accelerate_flow + propagate + collision +
av_velocity (d2q9-bgk.c:442-704) exactly like the classic kernel — the skew
changes only which rows a block computes, never a cell's arithmetic, so the
final state stays bitwise-equal to the jnp oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulbm.core.lattice import CX, CY, NSPEEDS
from tpulbm.core import physics
from tpulbm.ops import window_step

_PAD = 8          # bottom pad rows of the window; slab rows live at 6,7
SKEW_K = 8        # output offsets are i*BY - K: 8-aligned only for K == 8
# (BY + 8) * nx elements per window plane. 61440 = (40+8)*1280, the largest
# window compiled AND measured on hardware (r4 budget A/B): raising it from
# the r3 48K admitted nx=1280 (BY=40) to this ratio-1.0 tier at 25.7K device
# MLUPS, +30% over the skew2d tile it previously fell to — and flipped
# nothing else measurable (1024²/1536² picks unchanged or measured-equal;
# scripts/ab_skew_budget_1280.py, docs/measurements/round4.md).
_BLOCK_BUDGET = 61440


def pick_block_rows(h: int, nx: int) -> Optional[int]:
    """Largest 8-multiple row block dividing h with a VMEM-budget window.
    BY > 2K is required so block 0's reduced sum slice [2K, BY) is
    non-empty."""
    best = None
    for by in range(24, min(h // 2, 512) + 1, 8):
        if h % by == 0 and (by + _PAD) * nx <= _BLOCK_BUDGET:
            best = by
    return best


def supported(h: int, nx: int, k: int) -> bool:
    by = pick_block_rows(h, nx) if h % 8 == 0 else None
    return (
        k == SKEW_K
        and nx % 128 == 0
        and by is not None
        and h // by >= 2
        and h >= 4 * SKEW_K  # the fix band reads rows [0, 2K) of the shard
    )


def _kernel(
    f_ref,        # (9, H, nx) HBM (pre-chunk state; rows [i*BY, (i+1)*BY) read)
    obst_ref,     # (H, nx) HBM float32 mask (1.0 = blocked)
    scal_ref,     # (1, 2|3) SMEM int32: [global accel row, shard row offset,
                  # (fused_fix) fix-band base row]
    out_ref,      # (9, H, nx) HBM; rows [H-K, H) are NOT written unless
                  # ``top_local`` (caller's seam splice covers them otherwise)
    av_ref,       # (K, 1) SMEM per-step |u| sums
    fbuf,         # (slots, 9, BY+8, nx) VMEM: valid rows at [8, 8+BY)
    obuf,         # (slots, BY+8, nx) VMEM: obstacle rows [i*BY-8, (i+1)*BY)
    vstage,       # (slots, 9, BY, nx) VMEM output staging
    slab,         # (K*9*2, nx) VMEM: two post-accel rows per (state, channel)
    sem_f, sem_o, sem_out,  # DMA semaphores, (slots,) each
    acc,          # (K, 1) SMEM accumulator
    band_lo_ref=None,   # fused_fix, multi-dev: (9, 2K, nx) rows below shard
    oband_ref=None,     # fused_fix: (4K, nx) f32 seam-band obstacle mask
    top_ref=None,       # fused_fix, multi-dev: (9, K, nx) output for the
                        # backward ppermute (this shard's rows [-K, 0))
    band=None,          # fused_fix: (9, 4K, nx) VMEM seam-band state
    obandv=None,        # fused_fix: (4K, nx) VMEM
    fstage=None,        # fused_fix: (9, 2K, nx) VMEM fix output staging
    sem_band=None,      # fused_fix: DMA semaphore
    *,
    by: int,
    nx: int,
    h: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    slots: int = 2,
    collide_split: int = 1,
    fused_fix: bool = False,
    self_band: bool = False,
    top_local: bool = False,
    fix_collide_split: int = 1,
    canon_nx: int = 0,
    absorb_shift: bool = False,
    merge_g: int = 0,
    phys_nx: int = 0,
    accel_block: int = -1,
):
    k = k_steps
    i = pl.program_id(0)
    n = pl.num_programs(0)
    nb = n - 1 if fused_fix else n  # main row blocks; program nb = fix pass
    slot = jax.lax.rem(i, slots)
    nslot = jax.lax.rem(i + 1, slots)
    zero = np.float32(0.0)
    w1f = np.float32(w1)
    w2f = np.float32(w2)
    pair_symmetric = window_step.PAIR_SYMMETRIC_DEFAULT

    # -- input DMAs: each block reads ONLY its BY owned rows (no margins) ----
    def in_copies(b, s):
        row0 = pl.multiple_of(b * by, 8)
        copies = [pltpu.make_async_copy(
            f_ref.at[:, pl.ds(row0, by), :],
            fbuf.at[s, :, pl.ds(_PAD, by), :],
            sem_f.at[s],
        )]
        # obstacles: rows [b*BY-8, (b+1)*BY); block 0's sub-seam rows are
        # garbage-tolerated (its bottom collide rows are fix-pass territory)
        return copies

    def obst_copies(b, s):
        # (predicate, src_lo, size, dst_lo)
        return [
            (b == 0, 0, by, _PAD),
            (b != 0, b * by - _PAD, by + _PAD, 0),
        ]

    def start_dmas(b, s):
        for c in in_copies(b, s):
            c.start()
        for pred, src_lo, sz, dst_lo in obst_copies(b, s):
            @pl.when(pred)
            def _(src_lo=src_lo, sz=sz, dst_lo=dst_lo):
                pltpu.make_async_copy(
                    obst_ref.at[pl.ds(pl.multiple_of(
                        jnp.clip(src_lo, 0, h - sz), 8), sz), :],
                    obuf.at[s, pl.ds(dst_lo, sz), :],
                    sem_o.at[s],
                ).start()

    def wait_dmas(b, s):
        for c in in_copies(b, s):
            c.wait()
        for pred, src_lo, sz, dst_lo in obst_copies(b, s):
            @pl.when(pred)
            def _(src_lo=src_lo, sz=sz, dst_lo=dst_lo):
                pltpu.make_async_copy(
                    obst_ref.at[pl.ds(pl.multiple_of(
                        jnp.clip(src_lo, 0, h - sz), 8), sz), :],
                    obuf.at[s, pl.ds(dst_lo, sz), :],
                    sem_o.at[s],
                ).wait()

    if fused_fix:
        # seam-band DMAs: started at program 0, waited by the fix program —
        # the band is the CHUNK INPUT state (f_ref is never written), so the
        # copies overlap the entire main pipeline
        def band_copies():
            lo_src = (f_ref.at[:, pl.ds(h - 2 * k, 2 * k), :]
                      if self_band else band_lo_ref)
            return [
                pltpu.make_async_copy(
                    lo_src, band.at[:, pl.ds(0, 2 * k), :], sem_band),
                pltpu.make_async_copy(
                    f_ref.at[:, pl.ds(0, 2 * k), :],
                    band.at[:, pl.ds(2 * k, 2 * k), :], sem_band),
                pltpu.make_async_copy(oband_ref, obandv, sem_band),
            ]

    @pl.when(i == 0)
    def _():
        start_dmas(jnp.int32(0), 0)
        if fused_fix:
            for c in band_copies():
                c.start()

    @pl.when(i + 1 < nb)
    def _():
        start_dmas(i + 1, nslot)

    # -- output staging DMA bookkeeping --------------------------------------
    # Double-buffered: block i waits the copy issued two blocks ago
    # (measured ~0.7 us/step faster than a single-slot stage at 1024^2).
    def out_copy(b, s):
        # block 0's first 8 output rows are seam garbage: skip them.
        first = b == 0
        row0 = pl.multiple_of(
            jnp.clip(b * by - k, 0, h - by), 8)
        return [
            (first, pltpu.make_async_copy(
                vstage.at[s, :, pl.ds(_PAD, by - k), :],
                out_ref.at[:, pl.ds(0, by - k), :],
                sem_out.at[s],
            )),
            (jnp.logical_not(first), pltpu.make_async_copy(
                vstage.at[s],
                out_ref.at[:, pl.ds(row0, by), :],
                sem_out.at[s],
            )),
        ]

    def out_wait(b, s):
        for pred, c in out_copy(b, s):
            @pl.when(pred)
            def _(c=c):
                c.wait()

    if True:
        @pl.when(i >= slots)
        def _():
            out_wait(i - slots, slot)

    # -- the K skewed steps --------------------------------------------------
    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]

    def main_block():
        wait_dmas(i, slot)
        w = [fbuf[slot, c, _PAD : _PAD + by, :] for c in range(NSPEEDS)]
        o_win = obuf[slot]  # (BY+8, nx); rolled +1/step to track the slide
        base = shard_off + i * by  # global row of w[0] at state 0
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)
        junk6 = jnp.zeros((_PAD - 2, nx), jnp.float32)
        cmask = None
        if canon_nx and canon_nx != nx:
            # periodic x-extension: mirror columns evolve bitwise like
            # their canonicals (window_step.x_wrap_patch) but are excluded
            # from the |u| series
            cmask = jax.lax.broadcasted_iota(
                jnp.int32, (by, nx), 1) < canon_nx
        bm0 = bm_g1 = amask = None
        if merge_g > 1:
            # row-merged layout: boundary-block masks for the streaming
            # and the accelerated row's block-column restriction
            bm0, bm_g1 = window_step.merged_block_masks(
                by, nx, merge_g, phys_nx)
            amask = jax.lax.broadcasted_iota(
                jnp.int32, (by, nx), 1) // phys_nx == accel_block

        skip = window_step.COST_SKIP  # instrumentation only (trace-time)
        for s in range(k):
            # previous block's slab rows for state s (post-accel) — read
            # BEFORE this block overwrites the slot with its own
            subs = [slab[pl.ds((s * NSPEEDS + c) * 2, 2), :]
                    for c in range(NSPEEDS)]
            # inflow acceleration on valid rows (global [base-s, base-s+by))
            if "accel" not in skip:
                if absorb_shift:
                    free_v = o_win[_PAD - s : _PAD - s + by, :] == zero
                else:
                    free_v = o_win[_PAD : _PAD + by, :] == zero
                a_off = jax.lax.rem(
                    a_glob - (base - s) + 2 * ny_global, ny_global)
                sel_free = (row_ids == a_off) & free_v
                if amask is not None:
                    sel_free = sel_free & amask
                w = window_step.accel_update(w, sel_free, w1f, w2f)
            # hand our top-2 post-accel rows to the next block at this state
            if "sub" not in skip:
                for c in range(NSPEEDS):
                    slab[pl.ds((s * NSPEEDS + c) * 2, 2), :] = \
                        w[c][by - 2 : by, :]
            # skewed pull: roll by 1 + CY keeps the valid region at rows
            # [8, 8+BY) while the represented global rows slide down by one.
            # (A roll(BY)+row-select formulation without the concat was
            # measured 0.6 us/step SLOWER at 1024^2 — Mosaic fuses the
            # concat+roll+slice chain better than two whole-window selects.)
            t = []
            for c in range(NSPEEDS):
                sc = subs[c] if "sub" not in skip else w[c][:2]
                v = jnp.concatenate([junk6, sc, w[c]], axis=0)
                if merge_g > 1:
                    # row-merged streaming: one combined lane roll, the
                    # boundary-block row carry rides the +1 realignment
                    # (window_step.merged_stream_channel)
                    t.append(window_step.merged_stream_channel(
                        v, CY[c], CX[c], merge_g, phys_nx, bm0, bm_g1,
                        realign=1, row_window=(_PAD, by)))
                    continue
                if "roll" not in skip:
                    r = (1 + CY[c]) % (by + _PAD)
                    if absorb_shift:
                        # roll(v, r)[_PAD : _PAD+by] == v[_PAD-r : _PAD-r+by]
                        # (no top wrap: _PAD - r >= 6): the +1+CY realignment
                        # shift absorbed into a static (sub)lane-offset slice
                        # instead of a materialized roll — ROADMAP lever.
                        v = v[_PAD - r : _PAD - r + by, :]
                    elif r:
                        v = pltpu.roll(v, r, 0)
                        v = v[_PAD : _PAD + by, :]
                    else:
                        v = v[_PAD : _PAD + by, :]
                    if CX[c] != 0:
                        # lane roll after the row slice: by rows, not by+8
                        v_pre = v
                        v = pltpu.roll(v, CX[c] % nx, 1)
                        if canon_nx and canon_nx != nx:
                            v = window_step.x_wrap_patch(
                                v, v_pre, CX[c], canon_nx)
                else:
                    v = v[_PAD : _PAD + by, :]
                t.append(v)
            if absorb_shift:
                # un-rolled obstacle window: step-s valid rows live at the
                # static offset _PAD - s - 1 after the slide
                blocked_c = o_win[_PAD - s - 1 : _PAD - s - 1 + by, :] != zero
            else:
                o_win = pltpu.roll(o_win, 1, 0)
                blocked_c = o_win[_PAD : _PAD + by, :] != zero
            if "collide" in skip:
                w, speed = list(t), t[0]
            elif collide_split > 1:
                # sublane-aligned row chunks cap Mosaic's live-vector VMEM
                # (same trick as window_step; pointwise => bitwise-invisible)
                step8 = -(-by // (8 * collide_split)) * 8
                outs, speeds = [], []
                for r0 in range(0, by, step8):
                    r1 = min(r0 + step8, by)
                    o_c, s_c = physics.collide(
                        [p[r0:r1] for p in t], blocked_c[r0:r1], omega,
                        pair_symmetric,
                    )
                    outs.append(o_c)
                    speeds.append(s_c)
                w = [jnp.concatenate([o[c] for o in outs], axis=0)
                     for c in range(NSPEEDS)]
                speed = jnp.concatenate(speeds, axis=0)
            else:
                w, speed = physics.collide(t, blocked_c, omega,
                                           pair_symmetric)
            if cmask is not None:
                speed = jnp.where(cmask, speed, zero)
            # both sums unconditionally: gating the reductions under pl.when
            # (one per block) measured +4.4 us/step at 1024^2 — Mosaic
            # serializes the predicated reduce against the pipeline
            part_full = jnp.sum(speed, dtype=jnp.float32)
            part_red = jnp.sum(speed[2 * k :, :], dtype=jnp.float32)

            @pl.when(i == 0)
            def _(s=s, part_red=part_red):
                acc[s, 0] = part_red

            @pl.when(i > 0)
            def _(s=s, part_full=part_full):
                acc[s, 0] += part_full

        for c in range(NSPEEDS):
            vstage[slot, c] = w[c]
        for pred, c in out_copy(i, slot):
            @pl.when(pred)
            def _(c=c):
                c.start()

    if not fused_fix:
        main_block()

        @pl.when(i == n - 1)
        def _():
            if n >= 2:
                out_wait(i - 1, nslot)
            out_wait(i, slot)
            for s in range(k):
                av_ref[s, 0] = acc[s, 0]
    else:
        @pl.when(i < nb)
        def _():
            main_block()

        @pl.when(i == nb)
        def _():
            for c in band_copies():
                c.wait()
            # classic (unskewed) recompute of the 4K-row seam band: global
            # rows [off-2K, off+2K) of the chunk-input state
            wf = [band[c] for c in range(NSPEEDS)]
            blockedf = obandv[:] != zero
            fix_base = scal_ref[0, 2]
            rf = jax.lax.broadcasted_iota(jnp.int32, (4 * k, nx), 0)
            a_off_f = jax.lax.rem(
                a_glob - fix_base + 2 * ny_global, ny_global)
            accel_sel = jax.lax.rem(
                rf - a_off_f + 2 * ny_global, ny_global) == 0
            if merge_g > 1:
                accel_sel = accel_sel & (jax.lax.broadcasted_iota(
                    jnp.int32, (4 * k, nx), 1) // phys_nx == accel_block)
            wf, parts = window_step.fused_window_steps(
                wf, blockedf, accel_sel, k, omega, w1, w2,
                owned=(slice(2 * k - 1, 4 * k - 1), slice(0, nx)),
                owned_step_dy=-1, collide_split=fix_collide_split,
                x_canon=canon_nx or None,
                merge_g=merge_g, phys_nx=phys_nx,
            )
            for s in range(k):
                acc[s, 0] += parts[s]
            for c in range(NSPEEDS):
                fstage[c] = wf[c][k : 3 * k, :]
            # block nb-1's output copy drained during the recompute; retire
            # it before the kernel ends (the generic out_wait above already
            # retired block nb-slots at this program)
            out_wait(jnp.int32(nb - 1), jnp.int32((nb - 1) % slots))
            # rows [off, off+K) land at out[0:K); rows [off-K, off) are the
            # ring neighbour's shard-top (written locally on 1 device)
            cp_bot = pltpu.make_async_copy(
                fstage.at[:, pl.ds(k, k), :],
                out_ref.at[:, pl.ds(0, k), :], sem_band)
            if top_local:
                cp_top = pltpu.make_async_copy(
                    fstage.at[:, pl.ds(0, k), :],
                    out_ref.at[:, pl.ds(h - k, k), :], sem_band)
            else:
                cp_top = pltpu.make_async_copy(
                    fstage.at[:, pl.ds(0, k), :], top_ref, sem_band)
            cp_bot.start()
            cp_top.start()
            cp_bot.wait()
            cp_top.wait()
            for s in range(k):
                av_ref[s, 0] = acc[s, 0]


def make_skew(
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
    by: Optional[int] = None,
    slots: int = 2,
    alias_donor: bool = False,
    collide_split: int = 1,
    fused_fix: bool = False,
    self_band: bool = False,
    top_local: bool = False,
    fix_collide_split: int = 1,
    canon_nx: int = 0,
    absorb_shift: bool = False,  # A/B knob: static-offset slices instead of
                                 # the per-step realignment rolls
    merge_g: int = 0,            # row-merged layout (ops/fold.py merge):
    phys_nx: int = 0,            # evolve the physical (h*G, nx/G... ) torus
    accel_block: int = -1,       # as (h, nx = G*phys_nx); see make_merge
):
    """Returns ``(prepare, chunk)``:

    ``prepare(obstacles_bool)`` -> float32 obstacle mask;
    ``chunk(f, obst_f, scal[, donor]) -> (f', av_sums[k])`` advances k_steps
    timesteps with the skewed zero-recompute schedule. ``scal`` is int32
    (1, 2): [global accel row, shard global row offset].

    Caller contract (see dist/runner._make_skew_runner): rows [H-K, H) of
    the output are NOT written and rows [0, K) are seam garbage — both are
    spliced from the fix kernel (this shard's / the next shard's); block 0's
    per-step sums exclude global rows [-s-1, 2K-s-1), which the fix kernel's
    av output supplies.

    ``fused_fix`` runs that seam fix INSIDE this kernel as one extra
    trailing grid program (no second pallas_call, no band concat, no value
    splices): the chunk signature becomes
    ``chunk(f, [band_lo,] obst_f, oband_f, scal[, donor])`` with ``scal``
    int32 (1, 3) — [accel row, shard offset, fix-band base row] — and
    ``oband_f`` the (4K, nx) seam-band obstacle mask. ``self_band`` reads
    the band's lower half from ``f`` directly (single device: the torus
    wrap is local — drops the band_lo argument); ``top_local`` writes the
    shard-top rows [H-K, H) in place instead of returning them (single
    device), otherwise the chunk returns ``(f', av, top)`` with ``top``
    the (9, K, nx) slab to ppermute one shard down. Per-step |u| sums are
    accumulated in-kernel (bitwise-equal to the split kernels' ``av +
    av_fix``).
    """
    if by is None:
        by = pick_block_rows(h, nx)
    if by is None or not supported(h, nx, k_steps) or h % by:
        raise ValueError(
            f"skew kernel unsupported for local shape ({h}, {nx}), K={k_steps}"
        )
    if merge_g > 1:
        assert not canon_nx and not absorb_shift, \
            "merged layout excludes x-extension and absorb_shift"
        assert nx == merge_g * phys_nx and 0 <= accel_block < merge_g
    if interpret is None:
        interpret = window_step.default_interpret()
    n_blocks = h // by
    k = k_steps

    statics = dict(
        by=by, nx=nx, h=h, k_steps=k_steps, ny_global=ny_global,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
        slots=slots, collide_split=collide_split, canon_nx=canon_nx,
        absorb_shift=absorb_shift, merge_g=merge_g, phys_nx=phys_nx,
        accel_block=accel_block,
    )
    if not fused_fix:
        kernel = functools.partial(_kernel, **statics)
    else:
        def kernel(*refs):
            it = iter(refs)
            f = next(it)
            band_lo = None if self_band else next(it)
            obst = next(it)
            oband = next(it)
            scal = next(it)
            out = next(it)
            av = next(it)
            top = None if top_local else next(it)
            fbuf, obuf, vstage, slab = (next(it) for _ in range(4))
            sem_f, sem_o, sem_out, acc = (next(it) for _ in range(4))
            band, obandv, fstage, sem_band = (next(it) for _ in range(4))
            return _kernel(
                f, obst, scal, out, av, fbuf, obuf, vstage, slab,
                sem_f, sem_o, sem_out, acc,
                band_lo_ref=band_lo, oband_ref=oband, top_ref=top,
                band=band, obandv=obandv, fstage=fstage, sem_band=sem_band,
                fused_fix=True, self_band=self_band, top_local=top_local,
                fix_collide_split=fix_collide_split, **statics,
            )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec]                       # f
    if fused_fix and not self_band:
        in_specs.append(any_spec)               # band_lo
    in_specs.append(any_spec)                   # obstacles
    if fused_fix:
        in_specs.append(any_spec)               # oband
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # scalars
    out_specs = [any_spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((NSPEEDS, h, nx), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
    ]
    if fused_fix and not top_local:
        out_specs.append(any_spec)
        out_shape.append(jax.ShapeDtypeStruct((NSPEEDS, k, nx), jnp.float32))

    kernel_fn = kernel
    io_aliases = {}
    if alias_donor:
        in_specs = [any_spec] + in_specs

        def kernel_fn(donor_ref, *rest):
            del donor_ref  # storage only; never read
            return kernel(*rest)

        io_aliases = {0: 0}

    scratch_shapes = [
        pltpu.VMEM((slots, NSPEEDS, by + _PAD, nx), jnp.float32),
        pltpu.VMEM((slots, by + _PAD, nx), jnp.float32),
        pltpu.VMEM((slots, NSPEEDS, by, nx), jnp.float32),
        pltpu.VMEM((k * NSPEEDS * 2, nx), jnp.float32),
        pltpu.SemaphoreType.DMA((slots,)),
        pltpu.SemaphoreType.DMA((slots,)),
        pltpu.SemaphoreType.DMA((slots,)),
        pltpu.SMEM((k, 1), jnp.float32),
    ]
    if fused_fix:
        scratch_shapes += [
            pltpu.VMEM((NSPEEDS, 4 * k, nx), jnp.float32),
            pltpu.VMEM((4 * k, nx), jnp.float32),
            pltpu.VMEM((NSPEEDS, 2 * k, nx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    call = pl.pallas_call(
        kernel_fn,
        grid=(n_blocks + (1 if fused_fix else 0),),
        in_specs=in_specs,
        input_output_aliases=io_aliases,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=85 * h * nx * k_steps,
            bytes_accessed=2 * NSPEEDS * h * nx * 4,
            transcendentals=2 * h * nx * k_steps,
        ),
        interpret=interpret,
    )

    def prepare(obstacles):
        return obstacles.astype(jnp.float32)

    def chunk(*args):
        if alias_donor:
            *ins, donor = args
            outs = call(donor, *ins)
        else:
            outs = call(*args)
        if fused_fix and not top_local:
            f_out, av, top = outs
            return f_out, av[:, 0], top
        f_out, av = outs
        return f_out, av[:, 0]

    return prepare, chunk


def _fix_kernel(
    band_ref,   # (9, 4K, nx) VMEM: pre-chunk state, global rows [off-2K, off+2K)
    oband_ref,  # (4K, nx) VMEM float32
    scal_ref,   # (1, 2) SMEM: [global accel row, (off - 2K) mod ny]
    vals_ref,   # (9, 2K, nx) VMEM out: state-K values of rows [off-K, off+K)
    av_ref,     # (K, 1) SMEM out
    *,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    collide_split: int = 1,
    canon_nx: int = 0,
):
    k = k_steps
    zero = np.float32(0.0)
    hband = 4 * k
    w = [band_ref[c] for c in range(NSPEEDS)]
    blocked = oband_ref[:] != zero
    a_glob = scal_ref[0, 0]
    base = scal_ref[0, 1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hband, nx), 0)
    a_off = jax.lax.rem(a_glob - base + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    # classic full-window recompute; per-step sums slide down with the skewed
    # main kernel's coverage: step s sums band rows [2K-s-1, 4K-s-1)
    # (= global [off-s-1, off+2K-s-1))
    w, parts = window_step.fused_window_steps(
        w, blocked, accel_sel, k, omega, w1, w2,
        owned=(slice(2 * k - 1, 4 * k - 1), slice(0, nx)),
        owned_step_dy=-1, collide_split=collide_split,
        x_canon=canon_nx or None,
    )
    for s, part in enumerate(parts):
        av_ref[s, 0] = part
    for c in range(NSPEEDS):
        vals_ref[c] = w[c][k : 3 * k, :]


def make_skew_fix(
    nx: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    k_steps: int = SKEW_K,
    interpret: Optional[bool] = None,
    collide_split: int = 1,
    canon_nx: int = 0,
):
    """Classic 4K-row seam-band kernel paired with the skewed main kernel:
    ``chunk_fix(band, oband_f, scal) -> (vals (9, 2K, nx), av[k])``."""
    if interpret is None:
        interpret = window_step.default_interpret()
    k = k_steps
    kernel = functools.partial(
        _fix_kernel, nx=nx, k_steps=k, ny_global=ny_global,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
        collide_split=collide_split, canon_nx=canon_nx,
    )
    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, 2 * k, nx), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    def chunk_fix(band, oband_f, scal):
        vals, av = call(band, oband_f, scal)
        return vals, av[:, 0]

    return chunk_fix


# The monolithic fix kernel above holds the full-width band (+ outputs +
# collide temps) in one program's scoped VMEM: ~3.4 KB per lane column,
# measured 26.5 MB at nx=8192 vs the 16 MB limit (hardware compile OOM, r4).
# 4096 is the widest deck it has compiled and run; wider grids use the
# x-tiled fix below.
MONO_FIX_NX_MAX = 4096
_FIX_MX = 128     # lane margin per tile side (garbage moves <= K lanes)


def pick_fix_bx(nx: int) -> int:
    """Largest 128-multiple divisor of nx that is <= 1024 (tile width for
    the x-tiled fix; window = bx + 256 lanes)."""
    for bx in range(min(nx, 1024), 0, -128):
        if nx % bx == 0:
            return bx
    raise ValueError(f"no 128-multiple tile width divides nx={nx}")


def _fix_tiled_kernel(
    band_ref,   # (9, 4K, nx + 2*_FIX_MX) HBM: x-extended pre-chunk band
    oband_ref,  # (4K, nx + 2*_FIX_MX) HBM float32
    scal_ref,   # (1, 2) SMEM: [global accel row, (off - 2K) mod ny]
    vals_ref,   # (9, 2K, nx) HBM out
    av_ref,     # (K, 1) SMEM out
    fbuf,       # (9, 4K, BX + 2*_FIX_MX) VMEM window
    obuf,       # (4K, BX + 2*_FIX_MX) VMEM
    vstage,     # (9, 2K, BX) VMEM output staging
    sem_f, sem_o, sem_out,
    acc,        # (K, 1) SMEM accumulator across tiles
    *,
    bx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
):
    k = k_steps
    i = pl.program_id(0)
    n = pl.num_programs(0)
    hband = 4 * k
    bxw = bx + 2 * _FIX_MX
    zero = np.float32(0.0)

    # tile window: contiguous lanes [i*bx, i*bx + bxw) of the EXTENDED band
    # (the caller wraps 128 torus columns onto each side, so every tile —
    # including the wrap tiles — is one contiguous slice)
    x0 = pl.multiple_of(i * bx, 128)
    cp_f = pltpu.make_async_copy(
        band_ref.at[:, :, pl.ds(x0, bxw)], fbuf, sem_f)
    cp_o = pltpu.make_async_copy(
        oband_ref.at[:, pl.ds(x0, bxw)], obuf, sem_o)
    cp_f.start()
    cp_o.start()
    cp_f.wait()
    cp_o.wait()

    @pl.when(i == 0)
    def _():
        for s in range(k):
            acc[s, 0] = zero

    w = [fbuf[c] for c in range(NSPEEDS)]
    blocked = obuf[:] != zero
    a_glob = scal_ref[0, 0]
    base = scal_ref[0, 1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hband, bxw), 0)
    a_off = jax.lax.rem(a_glob - base + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    # classic K-step recompute on the tile window: in-window lane rolls
    # wrap WRONG values onto the window edges, but garbage moves <= 1 lane
    # per step and the owned columns sit _FIX_MX = 128 >> K lanes inside.
    # Per-step sums slide down exactly as in the monolithic fix, restricted
    # to this tile's owned columns (accumulated across tiles in SMEM; the
    # state values are bitwise those of the monolithic fix — only the |u|
    # series' addition order differs, matching the main kernels' tiling).
    w, parts = window_step.fused_window_steps(
        w, blocked, accel_sel, k, omega, w1, w2,
        owned=(slice(2 * k - 1, 4 * k - 1), slice(_FIX_MX, _FIX_MX + bx)),
        owned_step_dy=-1,
    )
    for s, part in enumerate(parts):
        acc[s, 0] = acc[s, 0] + part
    for c in range(NSPEEDS):
        vstage[c] = w[c][k : 3 * k, _FIX_MX : _FIX_MX + bx]
    cp_out = pltpu.make_async_copy(
        vstage, vals_ref.at[:, :, pl.ds(x0, bx)], sem_out)
    cp_out.start()
    cp_out.wait()

    @pl.when(i == n - 1)
    def _():
        for s in range(k):
            av_ref[s, 0] = acc[s, 0]


def make_skew_fix_tiled(
    nx: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    k_steps: int = SKEW_K,
    interpret: Optional[bool] = None,
    bx: Optional[int] = None,
):
    """x-tiled seam-band kernel for grids wider than the monolithic fix's
    VMEM envelope (nx > MONO_FIX_NX_MAX): same contract as make_skew_fix —
    ``chunk_fix(band, oband_f, scal) -> (vals (9, 2K, nx), av[k])`` — with
    the band x-extended by 128 wrap columns per side OUTSIDE the kernel (an
    XLA concat on the tiny 4K-row band) so every tile window is one
    contiguous DMA. Values are bitwise the monolithic fix's; the |u| series
    is accumulated tile-by-tile (same addition-order caveat as the tiled
    main kernels). No canon_nx support: x-extended decks keep the
    monolithic fix (gated at MONO_FIX_NX_MAX by the runner)."""
    if interpret is None:
        interpret = window_step.default_interpret()
    k = k_steps
    if bx is None:
        bx = pick_fix_bx(nx)
    if nx % bx or bx % 128:
        raise ValueError(f"fix tile width {bx} must be a 128-multiple "
                         f"divisor of nx={nx}")
    nt = nx // bx
    kernel = functools.partial(
        _fix_tiled_kernel, bx=bx, k_steps=k, ny_global=ny_global,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    call = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            any_spec,
            any_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            any_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, 2 * k, nx), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NSPEEDS, 4 * k, bx + 2 * _FIX_MX), jnp.float32),
            pltpu.VMEM((4 * k, bx + 2 * _FIX_MX), jnp.float32),
            pltpu.VMEM((NSPEEDS, 2 * k, bx), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((k, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    def chunk_fix(band, oband_f, scal):
        band_x = jnp.concatenate(
            [band[:, :, nx - _FIX_MX :], band, band[:, :, :_FIX_MX]], axis=2)
        oband_x = jnp.concatenate(
            [oband_f[:, nx - _FIX_MX :], oband_f, oband_f[:, :_FIX_MX]],
            axis=1)
        vals, av = call(band_x, oband_x, scal)
        return vals, av[:, 0]

    return chunk_fix
