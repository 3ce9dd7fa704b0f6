"""2-D tiled skewed K-step kernel: zero y-recompute for wide grids.

Wide grids (nx >= 2048) cannot keep full rows in a VMEM window, so the
classic path tiles both axes (ops/pallas_kstep2d.py) and pays a ~1.9x
window/owned compute ratio — the reason 4096^2 trails 1024^2 by ~40% in
device MLUPS (round-2 VERDICT item 2). This kernel combines two fixes:

- **y: the parallelogram skew** of ops/pallas_kstep_skew.py, per column
  strip. Tile (i, j)'s valid rows slide down one per step; its bottom needs
  exactly two rows per state, collected by tile (i-1, j) — which ran ncol
  programs earlier in the row-major grid — into a per-strip slab. Row-0
  tiles read garbage slabs and the 4K-row seam band is recomputed by the
  shared fix kernel (pallas_kstep_skew.make_skew_fix), full-width, covering
  every strip at once. Compute/owned ratio in y: 1.0.

- **x: full-window compute** (default ``mnx = _MX``). Only K columns per
  side are genuinely needed (window-edge garbage advances one column per
  step), and the first design computed on a NARROW bx + 2*mnx window
  (mnx=64) with one realignment lane roll per plane per chunk (a ragged
  width like bx + 2K = 1040 sends every lane roll down a masked slow path
  measured at 64% of step time, so the narrow width must stay a 128-lane
  multiple). Measured on hardware, though, the full 1280-wide compute
  BEATS the 1152-wide narrow window by 7.5% at 4096^2 (748 vs 803
  us/step, docs/measurements/round3.md): the realignment roll plus the
  offset slicing cost more than the 11% extra collide width they save.
  ``mnx`` remains a parameter for A/B. Compute/owned ratio in x: 1.25 at
  bx=1024 (nominal — the margin columns ride the same VPU pipeline).

Together: ~0.54x the VPU work of the classic 2-D tiling per owned cell,
plus a ~1.22x smaller HBM read (no y-margin rows are fetched).

The x margins are fetched with modular column offsets (the x wrap is real
data, as in pallas_kstep2d), so the in-window lane roll's wrap garbage is
absorbed by the same K-column analysis. The y mechanics (roll by 1 + CY,
obstacle-window roll, fixed valid rows [8, 8+BY)) are identical to the 1-D
skew kernel — see its module docstring for the full derivation.

Caller contract (identical to the 1-D skew kernel; dist/runner.
_make_skew_runner with ``maker=make_skew2d``): output rows [H-K, H) are
unwritten, rows [0, K) are seam garbage, both spliced from the fix kernel;
row-0 per-step sums skip global rows [-s-1, 2K-s-1), supplied by the fix.

Reference parity: fuses accelerate_flow + propagate + collision +
av_velocity (d2q9-bgk.c:442-704); bitwise-equal final state vs the oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulbm.core.lattice import CX, CY, NSPEEDS
from tpulbm.core import physics
from tpulbm.ops import window_step

_PAD = 8      # bottom pad rows; slab rows live at 6,7
_MX = 128     # column margin (lane alignment for the margin DMAs)
SKEW_K = 8    # output row offsets are i*BY - K: 8-aligned only for K == 8
# (BY + 8) * (BX + 256) f32 elements per window plane
_WINDOW_BUDGET = 56 * 1024


def pick_tile(
    h: int, nx: int, budget: Optional[int] = None
) -> Optional[Tuple[int, int]]:
    """(BY, BX) minimizing compute overhead (the full-window x ratio
    (bx + 2*_MX)/bx — the production default computes the whole window) then
    program count, within the window budget. BY > 2K for the row-0 reduced
    sums."""
    if budget is None:
        budget = _WINDOW_BUDGET
    best = None
    best_key = None
    for by in range(24, min(h // 2, 256) + 1, 8):
        if h % by:
            continue
        for bx in range(256, min(nx, 2048) + 1, 128):
            if nx % bx:
                continue
            window = (by + _PAD) * (bx + 2 * _MX)
            if window > budget:
                continue
            # x overhead dominates; ties toward larger tiles
            key = ((bx + 2 * _MX) / bx, -by * bx)
            if best_key is None or key < best_key:
                best_key = key
                best = (by, bx)
    return best


def supported(h: int, nx: int, k: int) -> bool:
    # Any width: the paired seam fix is the monolithic kernel up to
    # pallas_kstep_skew.MONO_FIX_NX_MAX (its scoped VMEM grows ~3.4 KB per
    # lane column — measured 26.5 MB compile OOM at nx=8192, r4) and the
    # x-tiled fix (make_skew_fix_tiled) beyond; the runner picks.
    tile = pick_tile(h, nx) if h % 8 == 0 else None
    return (
        k == SKEW_K
        and nx % 128 == 0
        and nx >= 2 * _MX
        and tile is not None
        and h >= 4 * SKEW_K  # fix band reads rows [0, 2K) of the shard
    )


def _kernel(
    f_ref,        # (9, H, nx) HBM
    obst_ref,     # (H, nx) HBM float32 mask
    scal_ref,     # (1, 2) SMEM int32: [global accel row, shard row offset]
    out_ref,      # (9, H, nx) HBM; rows [H-K, H) not written
    av_ref,       # (K, 1) SMEM
    fbuf,         # (slots, 9, BY+8, BX+256) VMEM; valid rows at [8, 8+BY)
    obuf,         # (slots, BY+8, BX+256) VMEM
    vstage,       # (slots, 9, BY, BX) VMEM output staging
    slab,         # (ncol, K*9*2, SXW) VMEM: per-strip two-row state slabs
                  # (strip index on the leading BATCH dim — lane offsets
                  # must stay static or Mosaic's roll fusion breaks)
    sem_f, sem_o, sem_out, sem_l,  # DMA semaphores (slots,)
    acc,          # (K, 1) SMEM
    *,
    by: int,
    bx: int,
    nx: int,
    h: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    slots: int = 2,
    in_slots: int = 2,        # input-window pipeline depth (fbuf/obuf);
                              # > slots deepens the fetch lead without
                              # scaling the output staging
    collide_split: int = 1,
    mnx: int,                 # compute-margin columns per side (static;
                              # _MX = full-window compute, no realignment).
                              # Required: make_skew2d resolves the production
                              # default (None -> _MX) — a stale default here
                              # would hand direct callers the rejected
                              # 7.5%-slower narrow-window config.
    local_reuse: bool = False,
    merged_fetch: bool = False,
    absorb_shift: bool = False,
):
    k = k_steps
    mx = _MX
    wx = bx + 2 * mx
    wxn = bx + 2 * mnx        # narrow compute width (128-lane multiple)
    sxw = wxn                 # slab storage width
    i = pl.program_id(0)
    j = pl.program_id(1)
    nrow = pl.num_programs(0)
    ncol = pl.num_programs(1)
    lin = i * ncol + j
    n = nrow * ncol
    slot = jax.lax.rem(lin, in_slots)
    nslot = jax.lax.rem(lin + 1, in_slots)
    vslot = jax.lax.rem(lin, slots)
    zero = np.float32(0.0)
    w1f = np.float32(w1)
    w2f = np.float32(w2)
    pair_symmetric = window_step.PAIR_SYMMETRIC_DEFAULT

    # -- input DMAs ----------------------------------------------------------
    def col_pieces(b_col, with_left=True, merged=None):
        # (src_col, dst_col, width); modular offsets give the real x wrap,
        # always 128-aligned and in range (as in pallas_kstep2d). With
        # ``local_reuse`` the left margin comes from the previous window's
        # VMEM (with_left=False) and main+right merge into ONE contiguous
        # HBM run wherever the right margin doesn't wrap (merged=True) —
        # together they eliminate every small strided margin fetch except
        # the j == 0 wrap column.
        left = jax.lax.rem(b_col * bx - mx + nx, nx)
        main = b_col * bx
        right = jax.lax.rem((b_col + 1) * bx, nx)
        pieces = [] if not with_left else [(pl.multiple_of(left, mx), 0, mx)]
        if merged:
            return pieces + [(pl.multiple_of(main, mx), mx, bx + mx)]
        return pieces + [
            (pl.multiple_of(main, mx), mx, bx),
            (pl.multiple_of(right, mx), mx + bx, mx),
        ]

    def obst_rows(b_row):
        # (predicate, src_lo, size, dst_lo); row-0 sub-seam rows are
        # garbage-tolerated (fix-pass territory)
        return [
            (b_row == 0, 0, by, _PAD),
            (b_row != 0, b_row * by - _PAD, by + _PAD, 0),
        ]

    def _dmas(b_row, b_col, s, is_wait, with_left):
        # Start or wait the window's HBM copies. The start/wait predicate
        # structure must be IDENTICAL for matching semaphore counts; the
        # main+right merge is itself predicated on whether the right margin
        # wraps (only the last column tile wraps).
        frow = pl.multiple_of(b_row * by, 8)

        def go(pieces):
            for src_c, dst_c, wdt in pieces:
                c = pltpu.make_async_copy(
                    f_ref.at[:, pl.ds(frow, by), pl.ds(src_c, wdt)],
                    fbuf.at[s, :, pl.ds(_PAD, by), pl.ds(dst_c, wdt)],
                    sem_f.at[s],
                )
                c.wait() if is_wait else c.start()
            for pred, src_lo, sz, dst_lo in obst_rows(b_row):
                @pl.when(pred)
                def _(src_lo=src_lo, sz=sz, dst_lo=dst_lo):
                    src_r = pl.multiple_of(jnp.clip(src_lo, 0, h - sz), 8)
                    for src_c, dst_c, wdt in pieces:
                        c = pltpu.make_async_copy(
                            obst_ref.at[pl.ds(src_r, sz), pl.ds(src_c, wdt)],
                            obuf.at[s, pl.ds(dst_lo, sz), pl.ds(dst_c, wdt)],
                            sem_o.at[s],
                        )
                        c.wait() if is_wait else c.start()

        if local_reuse and ncol > 1:
            @pl.when(b_col != ncol - 1)
            def _():
                go(col_pieces(b_col, with_left, merged=True))

            @pl.when(b_col == ncol - 1)
            def _():
                go(col_pieces(b_col, with_left, merged=False))
        elif merged_fetch and ncol > 1:
            # The window [b_col*bx - mx, (b_col+1)*bx + mx) is ONE
            # contiguous x-range except where a margin wraps the torus:
            # the left margin wraps only at b_col == 0, the right only at
            # b_col == ncol-1 — so interior strips fetch a single
            # wx-wide piece per plane-set (vs three), and the edge strips
            # two. Offsets under the edge predicates are static.
            @pl.when(b_col == 0)
            def _():
                go([(nx - mx, 0, mx), (0, mx, bx + mx)])

            @pl.when(b_col == ncol - 1)
            def _():
                go([((ncol - 1) * bx - mx, 0, mx + bx), (0, mx + bx, mx)])

            if ncol > 2:
                @pl.when((b_col > 0) & (b_col < ncol - 1))
                def _():
                    left = b_col * bx - mx
                    go([(pl.multiple_of(left, mx), 0, wx)])
        else:
            go(col_pieces(b_col, with_left, merged=False))

    def start_dmas(b_row, b_col, s, with_left=True):
        _dmas(b_row, b_col, s, False, with_left)

    def wait_dmas(b_row, b_col, s, with_left=True):
        _dmas(b_row, b_col, s, True, with_left)

    def local_left(src_s, dst_s, do_start):
        # Left margin of the NEXT window (same row block, next column tile)
        # = the tail of THIS window's main piece: a contiguous VMEM-to-VMEM
        # copy replaces the strided HBM margin fetch (the kstep2d trick).
        # Full window rows — pad rows copy garbage, absorbed by the margin
        # analysis exactly as for the HBM path.
        fc = pltpu.make_async_copy(
            fbuf.at[src_s, :, :, pl.ds(bx, mx)],
            fbuf.at[dst_s, :, :, pl.ds(0, mx)],
            sem_l.at[dst_s],
        )
        oc = pltpu.make_async_copy(
            obuf.at[src_s, :, pl.ds(bx, mx)],
            obuf.at[dst_s, :, pl.ds(0, mx)],
            sem_l.at[dst_s],
        )
        if do_start:
            fc.start()
            oc.start()
        else:
            fc.wait()
            oc.wait()

    nxt = lin + 1
    nxt_j = jax.lax.rem(nxt, ncol)
    have_next = nxt < n

    if local_reuse and ncol > 1:
        # Wait the inbound local left-margin copy FIRST: it reads the other
        # slot's main-piece tail, which the prefetch below overwrites.
        @pl.when(j != 0)
        def _():
            local_left(nslot, slot, False)

        @pl.when(lin == 0)
        def _():
            start_dmas(jnp.int32(0), jnp.int32(0), 0, with_left=True)

        @pl.when(have_next & (nxt_j == 0))
        def _():
            start_dmas(nxt // ncol, nxt_j, nslot, with_left=True)

        @pl.when(have_next & (nxt_j != 0))
        def _():
            start_dmas(nxt // ncol, nxt_j, nslot, with_left=False)

        @pl.when(j == 0)
        def _():
            wait_dmas(i, j, slot, with_left=True)

        @pl.when(j != 0)
        def _():
            wait_dmas(i, j, slot, with_left=False)

        # This window is complete — hand its main-piece tail to the next.
        @pl.when(have_next & (nxt_j != 0))
        def _():
            local_left(slot, nslot, True)
    else:
        # Generalized depth-(in_slots - 1) software pipeline: program lin
        # starts the fetch for window lin + D, so the DMA engine holds D
        # windows of lead over the compute. in_slots == 2 reduces to the
        # classic one-ahead double buffer.
        depth = in_slots - 1

        @pl.when(lin == 0)
        def _():
            for d in range(min(depth, n)):
                start_dmas(jnp.int32(d // ncol), jnp.int32(d % ncol),
                           d % in_slots)

        nxt_d = lin + depth
        @pl.when(nxt_d < n)
        def _():
            start_dmas(nxt_d // ncol, jax.lax.rem(nxt_d, ncol),
                       jax.lax.rem(nxt_d, in_slots))

        wait_dmas(i, j, slot)

    # -- output staging ------------------------------------------------------
    def out_copy(b_row, b_col, s):
        first = b_row == 0
        row0 = pl.multiple_of(jnp.clip(b_row * by - k, 0, h - by), 8)
        col0 = pl.multiple_of(b_col * bx, mx)
        return [
            (first, pltpu.make_async_copy(
                vstage.at[s, :, pl.ds(_PAD, by - k), :],
                out_ref.at[:, pl.ds(0, by - k), pl.ds(col0, bx)],
                sem_out.at[s],
            )),
            (jnp.logical_not(first), pltpu.make_async_copy(
                vstage.at[s],
                out_ref.at[:, pl.ds(row0, by), pl.ds(col0, bx)],
                sem_out.at[s],
            )),
        ]

    def out_wait(b_row, b_col, s):
        for pred, c in out_copy(b_row, b_col, s):
            @pl.when(pred)
            def _(c=c):
                c.wait()

    if True:
        @pl.when(lin >= slots)
        def _():
            prv = lin - slots
            out_wait(prv // ncol, jax.lax.rem(prv, ncol), vslot)

    # -- the K skewed steps --------------------------------------------------
    # Narrow-window realignment: the genuine slice starts at lane x0 =
    # mx - mnx = 64, which is not 128-aligned — slicing there gives every
    # plane a lane-offset layout that Mosaic refuses to concatenate with
    # the (offset-0) slab rows. One lane ROLL per plane per chunk moves
    # col x0 to col 0 instead; the wrapped tail cols land beyond wxn and
    # are cut by the slice.
    x0 = mx - mnx
    if x0:
        w = [pltpu.roll(fbuf[slot, c], wx - x0, 1)[_PAD : _PAD + by, :wxn]
             for c in range(NSPEEDS)]
        o_win = pltpu.roll(obuf[slot], wx - x0, 1)[:, :wxn]  # (BY+8, wxn)
    else:
        # full-window compute (mnx == _MX): no realignment needed
        w = [fbuf[slot, c][_PAD : _PAD + by, :] for c in range(NSPEEDS)]
        o_win = obuf[slot]
    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    base = shard_off + i * by
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, wxn), 0)
    junk6 = jnp.zeros((_PAD - 2, wxn), jnp.float32)

    skip = window_step.COST_SKIP  # instrumentation only (trace-time)
    for s in range(k):
        # Strip index on the LEADING (batch) slab dim: lane offsets stay
        # STATIC. A dynamic lane offset here (the original j*sxw layout)
        # broke Mosaic's roll fusion for every downstream plane — measured
        # +34.7 us/step of materialized rolls at 4 strips (round-3 log).
        subs = [slab[j, pl.ds((s * NSPEEDS + c) * 2, 2), :]
                for c in range(NSPEEDS)]
        if "accel" not in skip:
            if absorb_shift:
                free_v = o_win[_PAD - s : _PAD - s + by, :] == zero
            else:
                free_v = o_win[_PAD : _PAD + by, :] == zero
            a_off = jax.lax.rem(
                a_glob - (base - s) + 2 * ny_global, ny_global)
            sel_free = (row_ids == a_off) & free_v
            w = window_step.accel_update(w, sel_free, w1f, w2f)
        if "sub" not in skip:
            for c in range(NSPEEDS):
                slab[j, pl.ds((s * NSPEEDS + c) * 2, 2), :] = \
                    w[c][by - 2 : by, :]
        t = []
        for c in range(NSPEEDS):
            if "sub" not in skip:
                v = jnp.concatenate([junk6, subs[c], w[c]], axis=0)
            else:
                v = jnp.concatenate([junk6, w[c][:2], w[c]], axis=0)
            if "roll" not in skip:
                r = (1 + CY[c]) % (by + _PAD)
                if absorb_shift:
                    # roll(v, r)[_PAD:_PAD+by] == v[_PAD-r : _PAD-r+by]
                    # (no top wrap: _PAD - r >= 6) — realignment shift
                    # absorbed into a static sublane-offset slice
                    v = v[_PAD - r : _PAD - r + by, :]
                elif r:
                    v = pltpu.roll(v, r, 0)
                    v = v[_PAD : _PAD + by, :]
                else:
                    v = v[_PAD : _PAD + by, :]
                if CX[c] != 0:
                    # narrow-window-local wrap: garbage, absorbed by the
                    # K-column edge analysis
                    v = pltpu.roll(v, CX[c] % wxn, 1)
            else:
                v = v[_PAD : _PAD + by, :]
            t.append(v)
        if absorb_shift:
            blocked_c = o_win[_PAD - s - 1 : _PAD - s - 1 + by, :] != zero
        else:
            o_win = pltpu.roll(o_win, 1, 0)
            blocked_c = o_win[_PAD : _PAD + by, :] != zero
        if collide_split > 1:
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
        elif "collide" in skip:
            w, speed = list(t), t[0]
        else:
            w, speed = physics.collide(t, blocked_c, omega, pair_symmetric)
        sp_own = speed[:, mnx : mnx + bx]
        part_full = jnp.sum(sp_own, dtype=jnp.float32)
        part_red = jnp.sum(sp_own[2 * k :, :], dtype=jnp.float32)

        @pl.when((i == 0) & (j == 0))
        def _(s=s, part_red=part_red):
            acc[s, 0] = part_red

        @pl.when((i == 0) & (j > 0))
        def _(s=s, part_red=part_red):
            acc[s, 0] += part_red

        @pl.when(i > 0)
        def _(s=s, part_full=part_full):
            acc[s, 0] += part_full

    for c in range(NSPEEDS):
        vstage[vslot, c] = w[c][:, mnx : mnx + bx]
    for pred, c in out_copy(i, j, vslot):
        @pl.when(pred)
        def _(c=c):
            c.start()

    @pl.when(lin == n - 1)
    def _():
        if n >= 2:
            prv = lin - 1
            out_wait(prv // ncol, jax.lax.rem(prv, ncol),
                     jax.lax.rem(lin + slots - 1, slots))
        out_wait(i, j, vslot)
        for s in range(k):
            av_ref[s, 0] = acc[s, 0]


def make_skew2d(
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
    tile: Optional[Tuple[int, int]] = None,
    slots: int = 2,
    in_slots: Optional[int] = None,  # input pipeline depth (default: slots)
    alias_donor: bool = False,
    collide_split: int = 1,
    mnx: Optional[int] = None,
    local_reuse: bool = False,  # measured 0.7% SLOWER at 4096^2 — A/B knob
    merged_fetch: bool = False,  # single contiguous window fetch per
                                 # non-wrapping strip — A/B knob
    absorb_shift: bool = False,  # A/B knob: static-offset slices instead of
                                 # the per-step realignment rolls
):
    """Returns ``(prepare, chunk)`` with the same contract as
    pallas_kstep_skew.make_skew (see that docstring) over (BY, BX) tiles."""
    if tile is None:
        tile = pick_tile(h, nx)
    if tile is None or not supported(h, nx, k_steps):
        raise ValueError(
            f"skew2d kernel unsupported for local shape ({h}, {nx}), "
            f"K={k_steps}"
        )
    by, bx = tile
    if h % by or nx % bx or by < 3 * 8:
        raise ValueError(f"bad skew2d tile {tile} for ({h}, {nx})")
    if interpret is None:
        interpret = window_step.default_interpret()
    nrow, ncol = h // by, nx // bx
    if mnx is None:
        mnx = _MX  # full-window compute (measured fastest; see module doc)
    if mnx % 64 or not 0 < mnx <= _MX or (bx + 2 * mnx) % 128:
        raise ValueError(f"bad skew2d compute margin mnx={mnx} for bx={bx}")
    if in_slots is None:
        in_slots = slots
    if in_slots < slots or (local_reuse and in_slots != 2):
        raise ValueError(
            f"bad skew2d pipeline (slots={slots}, in_slots={in_slots}, "
            f"local_reuse={local_reuse})"
        )
    sxw = bx + 2 * mnx  # narrow compute / slab width (see _kernel)

    kernel = functools.partial(
        _kernel, by=by, bx=bx, nx=nx, h=h, k_steps=k_steps,
        ny_global=ny_global, omega=float(omega), w1=float(accel_w1),
        w2=float(accel_w2), slots=slots, in_slots=in_slots,
        collide_split=collide_split, mnx=mnx, local_reuse=local_reuse,
        merged_fetch=merged_fetch, absorb_shift=absorb_shift,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    kernel_fn = kernel
    io_aliases = {}
    if alias_donor:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + in_specs

        def kernel_fn(donor_ref, *rest):
            del donor_ref
            return kernel(*rest)

        io_aliases = {0: 0}

    call = pl.pallas_call(
        kernel_fn,
        grid=(nrow, ncol),
        in_specs=in_specs,
        input_output_aliases=io_aliases,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((in_slots, NSPEEDS, by + _PAD, bx + 2 * _MX),
                       jnp.float32),
            pltpu.VMEM((in_slots, by + _PAD, bx + 2 * _MX), jnp.float32),
            pltpu.VMEM((slots, NSPEEDS, by, bx), jnp.float32),
            pltpu.VMEM((ncol, k_steps * NSPEEDS * 2, sxw), jnp.float32),
            pltpu.SemaphoreType.DMA((in_slots,)),
            pltpu.SemaphoreType.DMA((in_slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((in_slots,)),
            pltpu.SMEM((k_steps, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
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

    if alias_donor:
        def chunk(f, obst_f, scal, donor):
            f_out, av = call(donor, f, obst_f, scal)
            return f_out, av[:, 0]
    else:
        def chunk(f, obst_f, scal):
            f_out, av = call(f, obst_f, scal)
            return f_out, av[:, 0]

    # Resolved configuration, introspectable by tests pinning the production
    # defaults (full-window compute, no margin reuse).
    chunk.mnx = mnx
    chunk.sxw = sxw
    chunk.local_reuse = local_reuse
    chunk.merged_fetch = merged_fetch
    chunk.in_slots = in_slots
    chunk.tile = (by, bx)
    return prepare, chunk
