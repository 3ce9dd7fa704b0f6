"""2-D tiled K-step temporal-blocking kernel for wide grids.

The 1-D K-step kernel (pallas_kstep.py) keeps full rows in VMEM, which caps
the row-block at BY=8 once nx reaches 4096 (the 1-D kernel still wins at nx=2048) and leaves the kernel bound by
per-program overhead. This variant tiles BOTH axes: each program owns a
(BY, BX) tile and steps a (BY+16, BX+256) window K (<= 8) times in VMEM.

Margins: 8 rows (Mosaic sublane alignment) and 128 columns (lane alignment).
Since x is never sharded, the column margins — including the periodic wrap at
the first/last column tiles — are plain DMAs at modular source offsets
(always 128-aligned, always in range), with no conditional cases at all; the
row dimension keeps the 1-D kernel's shard-halo cases. Window-edge garbage
propagates one cell per step in each axis, so K <= 8 steps never contaminate
the owned tile. Per-step |u| sums cover owned cells only.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulbm.core.lattice import NSPEEDS
from tpulbm.ops import window_step
from tpulbm.ops.window_step import fused_window_steps

_MY = 8     # row margin
_MX = 128   # column margin
MAX_K = _MY
# Window footprint target (f32 elements) for one (WY, WX) plane. 64K admits
# the (32, 1024)/(64, 512) tiles (61K loaded): the device-time sweep at
# 4096^2 measured (32, 1024) fastest — 1244 us/step = 13,485 MLUPS vs 1434
# for the old 40K-budget pick (32, 512) (docs/measurements/round2.md).
_WINDOW_BUDGET = 64 * 1024


def pick_tile(
    h: int, nx: int, budget: Optional[int] = None
) -> Optional[Tuple[int, int]]:
    """(BY, BX) minimizing the window/owned overhead ratio within the
    window budget (the kernel is compute-bound, and both the redundant
    recompute and the extra read scale with that ratio); ties break toward
    larger owned area (fewer programs)."""
    if budget is None:
        budget = _WINDOW_BUDGET  # module global: resolved at call time
    best = None
    best_key = None
    for by in range(8, min(h, 256) + 1, 8):
        if h % by:
            continue
        for bx in range(128, min(nx, 2048) + 1, 128):
            if nx % bx:
                continue
            window = (by + 2 * _MY) * (bx + 2 * _MX)
            if window > budget:
                continue
            key = (window / (by * bx), -by * bx)
            if best_key is None or key < best_key:
                best_key = key
                best = (by, bx)
    return best


def supported(h: int, nx: int, k: int) -> bool:
    return (
        1 <= k <= MAX_K
        and nx % 128 == 0
        and nx >= 2 * _MX  # wrap margins must not overlap themselves badly
        and h >= k
        and pick_tile(h, nx) is not None
    )


def _kernel(
    f_ref,        # (9, H, nx) HBM
    lo_ref,       # (9, K, nx) VMEM: the K global rows below the shard
    hi_ref,       # (9, K, nx) VMEM: the K global rows above the shard
    obst_ref,     # (H, nx) HBM float32 mask
    olo_ref,      # (K, nx) VMEM
    ohi_ref,      # (K, nx) VMEM
    scal_ref,     # (1, 2) SMEM int32: [global accel row, shard row offset]
    out_ref,      # (9, BY, BX) VMEM block
    av_ref,       # (K, 1) SMEM
    fbuf,         # (2, 9, WY, WX) VMEM
    obuf,         # (2, WY, WX) VMEM
    sem_f, sem_o,  # DMA semaphores (2,)
    sem_l,        # local (VMEM-to-VMEM) left-margin copy semaphore (2,)
    acc,          # (K, 1) SMEM
    # (K, 9, WY, mx) VMEM slab buffer, present only in exact_left mode: the
    # previous program's owned right-edge columns at every intermediate
    # state, consumed as this window's exact left margin per fused step.
    *extra_scratch,
    by: int,
    bx: int,
    nx: int,
    h: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    local_reuse: bool = True,
    exact_left: bool = False,
):
    my, mx = _MY, _MX
    wy = by + 2 * my
    wx = bx + 2 * mx
    i = pl.program_id(0)
    j = pl.program_id(1)
    nrow = pl.num_programs(0)
    ncol = pl.num_programs(1)
    lin = i * ncol + j
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)
    n_static = h // by

    def col_pieces(b_col, with_left=True):
        # (src_col, dst_col, width); modular offsets handle the x wrap and
        # are always 128-aligned and in range. The left margin is loaded
        # from HBM only at the column wrap (j == 0): elsewhere it is the
        # tail of the previous program's main piece, reused from VMEM.
        left = jax.lax.rem(b_col * bx - mx + nx, nx)
        main = b_col * bx
        right = jax.lax.rem((b_col + 1) * bx, nx)
        pieces = [] if not with_left else [(pl.multiple_of(left, mx), 0, mx)]
        return pieces + [
            (pl.multiple_of(main, mx), mx, bx),
            (pl.multiple_of(right, mx), mx + bx, mx),
        ]

    def row_cases(b_row):
        first = b_row == 0
        last = b_row == n_static - 1
        cases = []
        if n_static == 1:
            cases.append((first & last, 0, by, my))
        else:
            cases.append((first, 0, by + my, my))
            if n_static > 2:
                cases.append(
                    ((b_row != 0) & (b_row != n_static - 1),
                     b_row * by - my, by + 2 * my, 0)
                )
            cases.append(((b_row != 0) & last, b_row * by - my, by + my, 0))
        return cases

    def start_dmas(b_row, b_col, s, with_left):
        pieces = col_pieces(b_col, with_left)
        for pred, src_row, row_sz, dst_row in row_cases(b_row):
            @pl.when(pred)
            def _():
                src_r = pl.multiple_of(
                    jnp.clip(src_row, 0, h - row_sz), _MY
                )
                for src_c, dst_c, w in pieces:
                    pltpu.make_async_copy(
                        f_ref.at[:, pl.ds(src_r, row_sz), pl.ds(src_c, w)],
                        fbuf.at[s, :, pl.ds(dst_row, row_sz), pl.ds(dst_c, w)],
                        sem_f.at[s],
                    ).start()
                    pltpu.make_async_copy(
                        obst_ref.at[pl.ds(src_r, row_sz), pl.ds(src_c, w)],
                        obuf.at[s, pl.ds(dst_row, row_sz), pl.ds(dst_c, w)],
                        sem_o.at[s],
                    ).start()

    def wait_dmas(b_row, b_col, s, with_left):
        pieces = col_pieces(b_col, with_left)
        for pred, src_row, row_sz, dst_row in row_cases(b_row):
            @pl.when(pred)
            def _():
                src_r = pl.multiple_of(
                    jnp.clip(src_row, 0, h - row_sz), _MY
                )
                for src_c, dst_c, w in pieces:
                    pltpu.make_async_copy(
                        f_ref.at[:, pl.ds(src_r, row_sz), pl.ds(src_c, w)],
                        fbuf.at[s, :, pl.ds(dst_row, row_sz), pl.ds(dst_c, w)],
                        sem_f.at[s],
                    ).wait()
                    pltpu.make_async_copy(
                        obst_ref.at[pl.ds(src_r, row_sz), pl.ds(src_c, w)],
                        obuf.at[s, pl.ds(dst_row, row_sz), pl.ds(dst_c, w)],
                        sem_o.at[s],
                    ).wait()

    def local_left(src_s, dst_s, do_start):
        # Left margin of the NEXT window (same row block, next column tile)
        # = the tail of THIS window's main piece: a contiguous VMEM-to-VMEM
        # copy replaces the strided HBM margin fetch. Full wy rows — rows
        # outside the loaded region copy garbage, absorbed by the margin
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
    have_next = nxt < nrow * ncol

    if local_reuse:
        # Wait for the inbound local left-margin copy FIRST: it reads the
        # other slot's main-piece tail, which the prefetch below is about to
        # overwrite.
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

        # This window is now complete — hand its main-piece tail to the next.
        @pl.when(have_next & (nxt_j != 0))
        def _():
            local_left(slot, nslot, True)
    else:
        @pl.when(lin == 0)
        def _():
            start_dmas(jnp.int32(0), jnp.int32(0), 0, with_left=True)

        @pl.when(have_next)
        def _():
            start_dmas(nxt // ncol, nxt_j, nslot, with_left=True)

        wait_dmas(i, j, slot, with_left=True)

    # -- window assembly ----------------------------------------------------
    zero = np.float32(0.0)
    is_first = i == 0
    is_last = i == n_static - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (wy, wx), 0)

    def halo_cols(ref, c=None):
        # (K, WX) column window of a full-width halo plane, with x wrap;
        # ref slices at 128-aligned dynamic lane offsets.
        pieces = col_pieces(j)
        if c is None:
            parts = [ref[:, pl.ds(src_c, w)] for src_c, _, w in pieces]
        else:
            parts = [ref[c, :, pl.ds(src_c, w)] for src_c, _, w in pieces]
        return jnp.concatenate(parts, axis=1)

    def assemble(buf_plane, lo_plane, hi_plane, c=None):
        v = buf_plane
        lo_full = jnp.pad(halo_cols(lo_plane, c),
                          ((my - k_steps, wy - my), (0, 0)))
        hi_full = jnp.pad(halo_cols(hi_plane, c),
                          ((by + my, my - k_steps), (0, 0)))
        v = jnp.where(
            is_first & (row_ids < my) & (row_ids >= my - k_steps), lo_full, v
        )
        v = jnp.where(
            is_last & (row_ids >= by + my) & (row_ids < by + my + k_steps),
            hi_full, v,
        )
        return v

    w = [assemble(fbuf[slot, c], lo_ref, hi_ref, c)
         for c in range(NSPEEDS)]
    o = assemble(obuf[slot], olo_ref, ohi_ref)
    blocked = o != zero

    # accel row by global index (modulo ny), as in the 1-D kernel; every
    # column of that row accelerates, including the wrapped x margins.
    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    win_start = shard_off + i * by - my
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    owned_slc = (slice(my, my + by), slice(mx, mx + bx))

    if not exact_left:
        w, parts = fused_window_steps(
            w, blocked, accel_sel, k_steps, omega, w1, w2, owned=owned_slc,
        )
        for s, part in enumerate(parts):
            @pl.when(lin == 0)
            def _(s=s, part=part):
                acc[s, 0] = part

            @pl.when(lin > 0)
            def _(s=s, part=part):
                acc[s, 0] += part

        for c in range(NSPEEDS):
            out_ref[c] = w[c][my : my + by, mx : mx + bx]
    else:
        # Exact left-margin substitution: column tiles iterate innermost,
        # so the previous program's owned right-edge columns at each
        # intermediate state are this window's exact left margin — read
        # per state from the slab scratch, overwritten with our own
        # (read-before-write on the same state slot). The collide skips
        # the left margin entirely (128-lane-aligned post-roll slice).
        # The column-wrap window (j == 0) keeps the classic body: its left
        # neighbour is the row block's LAST tile, not yet computed.
        slab = extra_scratch[0]

        def sub_read(s):
            return [slab[s, c] for c in range(NSPEEDS)]

        def collect(s, cols):
            for c in range(NSPEEDS):
                slab[s, c] = cols[c]

        def run_and_store(sub, first):
            wf, parts = fused_window_steps(
                w, blocked, accel_sel, k_steps, omega, w1, w2,
                owned=owned_slc,
                sub_read=sub, sub_rows=mx, sub_axis=1,
                collect=collect, collect_rows=(bx, mx),
            )
            for s, part in enumerate(parts):
                if first:
                    acc[s, 0] = part
                else:
                    acc[s, 0] += part
            for c in range(NSPEEDS):
                out_ref[c] = wf[c][my : my + by, mx : mx + bx]

        @pl.when(lin == 0)
        def _():
            run_and_store(None, True)

        @pl.when((lin > 0) & (j == 0))
        def _():
            run_and_store(None, False)

        @pl.when(j != 0)
        def _():
            run_and_store(sub_read, False)

    @pl.when(lin == nrow * ncol - 1)
    def _():
        for s in range(k_steps):
            av_ref[s, 0] = acc[s, 0]




def _kernel_row_inner(
    f_ref,        # (9, H, nx) HBM
    lo_ref,       # (9, K, nx) VMEM
    hi_ref,       # (9, K, nx) VMEM
    obst_ref,     # (H, nx) HBM float32 mask
    olo_ref,      # (K, nx) VMEM
    ohi_ref,      # (K, nx) VMEM
    scal_ref,     # (1, 2) SMEM int32
    out_ref,      # (9, BY, BX) VMEM block
    av_ref,       # (K, 1) SMEM
    fbuf,         # (2, 9, WY, WX) VMEM
    obuf,         # (2, WY, WX) VMEM
    sem_f, sem_o,  # DMA semaphores (2,)
    sem_r,        # row-overlap local copy semaphore (2,)
    acc,          # (K, 1) SMEM
    slab,         # (K*9, WX) VMEM slim slab
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
):
    """ROW-INNER variant: grid = (ncol, nrow) so row blocks chain within
    each column strip, carrying the 1-D kernel's row-overlap DMA reuse and
    the single-body exact bottom-margin substitution (every block
    substitutes; block (j, 0) of each strip gets garbage, its first K
    owned rows are excluded from the sums via a reduced owned slice and
    recomputed by the runner's fix pass). Both column margins come from
    HBM every window (the column-inner variant's left-margin VMEM reuse
    needs the other grid order — measured free on device time anyway)."""
    my, mx = _MY, _MX
    wy = by + 2 * my
    wx = bx + 2 * mx
    j = pl.program_id(0)
    i = pl.program_id(1)
    ncol = pl.num_programs(0)
    nrow = pl.num_programs(1)
    lin = j * nrow + i
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)
    n_static = h // by

    def col_pieces(b_col):
        left = jax.lax.rem(b_col * bx - mx + nx, nx)
        main = b_col * bx
        right = jax.lax.rem((b_col + 1) * bx, nx)
        return [
            (pl.multiple_of(left, mx), 0, mx),
            (pl.multiple_of(main, mx), mx, bx),
            (pl.multiple_of(right, mx), mx + bx, mx),
        ]

    def row_cases(b_row, reduced=False):
        first = b_row == 0
        last = b_row == nrow - 1
        cases = []
        if n_static == 1:
            cases.append((first & last, 0, by, my))
        elif reduced:
            if n_static > 2:
                cases.append(((b_row != 0) & (b_row != nrow - 1),
                              b_row * by + my, by, 2 * my))
            if by > my:
                cases.append(((b_row != 0) & last, b_row * by + my,
                              by - my, 2 * my))
        else:
            cases.append((first, 0, by + my, my))
            if n_static > 2:
                cases.append(((b_row != 0) & (b_row != nrow - 1),
                              b_row * by - my, by + 2 * my, 0))
            cases.append(((b_row != 0) & last, b_row * by - my, by + my, 0))
        return cases

    def dmas(b_col, b_row, s, do_start, reduced):
        pieces = col_pieces(b_col)
        for pred, src_row, row_sz, dst_row in row_cases(b_row, reduced):
            @pl.when(pred)
            def _():
                src_r = pl.multiple_of(
                    jnp.clip(src_row, 0, h - row_sz), _MY
                )
                for src_c, dst_c, w_ in pieces:
                    fc = pltpu.make_async_copy(
                        f_ref.at[:, pl.ds(src_r, row_sz), pl.ds(src_c, w_)],
                        fbuf.at[s, :, pl.ds(dst_row, row_sz),
                                pl.ds(dst_c, w_)],
                        sem_f.at[s],
                    )
                    oc = pltpu.make_async_copy(
                        obst_ref.at[pl.ds(src_r, row_sz), pl.ds(src_c, w_)],
                        obuf.at[s, pl.ds(dst_row, row_sz),
                                pl.ds(dst_c, w_)],
                        sem_o.at[s],
                    )
                    if do_start:
                        fc.start()
                        oc.start()
                    else:
                        fc.wait()
                        oc.wait()

    def local_rows(src_s, dst_s, do_start):
        copies = [
            pltpu.make_async_copy(
                fbuf.at[src_s, :, pl.ds(by, 2 * my), :],
                fbuf.at[dst_s, :, pl.ds(0, 2 * my), :],
                sem_r.at[dst_s],
            ),
            pltpu.make_async_copy(
                obuf.at[src_s, pl.ds(by, 2 * my), :],
                obuf.at[dst_s, pl.ds(0, 2 * my), :],
                sem_r.at[dst_s],
            ),
        ]
        for c in copies:
            if do_start:
                c.start()
            else:
                c.wait()

    nxt = lin + 1
    nxt_i = jax.lax.rem(nxt, nrow)
    have_next = nxt < ncol * nrow
    use_reuse = n_static >= 2

    if use_reuse:
        @pl.when(i != 0)
        def _():
            local_rows(nslot, slot, False)

    @pl.when(lin == 0)
    def _():
        dmas(jnp.int32(0), jnp.int32(0), 0, True, False)

    @pl.when(have_next & (nxt_i == 0))
    def _():
        dmas(nxt // nrow, nxt_i, nslot, True, False)

    @pl.when(have_next & (nxt_i != 0))
    def _():
        dmas(nxt // nrow, nxt_i, nslot, True, use_reuse)

    @pl.when(i == 0)
    def _():
        dmas(j, i, slot, False, False)

    @pl.when(i != 0)
    def _():
        dmas(j, i, slot, False, use_reuse)

    if use_reuse:
        @pl.when(have_next & (nxt_i != 0))
        def _():
            local_rows(slot, nslot, True)

    # -- window assembly ------------------------------------------------
    zero = np.float32(0.0)
    is_first = i == 0
    is_last = i == nrow - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (wy, wx), 0)

    def halo_cols(ref, c=None):
        pieces = col_pieces(j)
        if c is None:
            parts = [ref[:, pl.ds(src_c, w_)] for src_c, _, w_ in pieces]
        else:
            parts = [ref[c, :, pl.ds(src_c, w_)] for src_c, _, w_ in pieces]
        return jnp.concatenate(parts, axis=1)

    def assemble(buf_plane, lo_plane, hi_plane, c=None):
        v = buf_plane
        lo_full = jnp.pad(halo_cols(lo_plane, c),
                          ((my - k_steps, wy - my), (0, 0)))
        hi_full = jnp.pad(halo_cols(hi_plane, c),
                          ((by + my, my - k_steps), (0, 0)))
        v = jnp.where(
            is_first & (row_ids < my) & (row_ids >= my - k_steps), lo_full, v
        )
        v = jnp.where(
            is_last & (row_ids >= by + my) & (row_ids < by + my + k_steps),
            hi_full, v,
        )
        return v

    w = [assemble(fbuf[slot, c], lo_ref, hi_ref, c) for c in range(NSPEEDS)]
    o = assemble(obuf[slot], olo_ref, ohi_ref)
    blocked = o != zero

    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    win_start = shard_off + i * by - my  # full window: row 0 at -my
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    def sub_read(s):
        return [slab[pl.ds(s * NSPEEDS + c, 1), :] for c in range(NSPEEDS)]

    def collect(s, rows):
        for c in range(NSPEEDS):
            slab[pl.ds(s * NSPEEDS + c, 1), :] = rows[c]

    owned_slc = (slice(my, my + by), slice(mx, mx + bx))
    wf, parts = fused_window_steps(
        w, blocked, accel_sel, k_steps, omega, w1, w2,
        owned=owned_slc,
        sub_read=sub_read, sub_rows=my,
        collect=collect, collect_rows=(by + my - 1, 1),
        owned_alt=(slice(my + k_steps, my + by), slice(mx, mx + bx)),
    )
    for s, (pf, pr) in enumerate(parts):
        @pl.when(lin == 0)
        def _(s=s, pr=pr):
            acc[s, 0] = pr

        @pl.when((lin > 0) & (i == 0))
        def _(s=s, pr=pr):
            acc[s, 0] += pr

        @pl.when(i > 0)
        def _(s=s, pf=pf):
            acc[s, 0] += pf

    for c in range(NSPEEDS):
        out_ref[c] = wf[c][my : my + by, mx : mx + bx]

    @pl.when(lin == ncol * nrow - 1)
    def _():
        for s in range(k_steps):
            av_ref[s, 0] = acc[s, 0]


def make_kstep2d(
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
    tile: Optional[Tuple[int, int]] = None,
    local_reuse: bool = True,
    exact_left: Optional[bool] = None,
    row_inner: bool = False,
):
    """Same contract as pallas_kstep.make_kstep: returns (prepare, chunk).
    ``local_reuse=False`` loads every margin from HBM (A/B baseline);
    ``exact_left=False`` disables the exact left-margin substitution
    (classic full-window recompute, the other A/B baseline);
    ``row_inner=True`` selects the row-inner single-body exact kernel —
    the CALLER must run the fix pass over global rows [0, K) and exclude
    them from the returned sums' coverage (see _kernel_row_inner)."""
    if tile is None:
        tile = pick_tile(h, nx)
    if tile is None or not supported(h, nx, k_steps):
        raise ValueError(
            f"kstep2d unsupported for local shape ({h}, {nx}), K={k_steps}"
        )
    by, bx = tile
    if h % by or nx % bx:
        raise ValueError(f"tile {tile} does not divide local shape ({h}, {nx})")
    if row_inner and (by < _MY + k_steps or h // by < 2):
        raise ValueError(
            f"row_inner needs BY >= {_MY + k_steps} and >= 2 row blocks"
        )
    if interpret is None:
        interpret = window_step.default_interpret()
    # exact_left default OFF: unlike the 1-D kernel's row case (+7%), the
    # column-margin substitution measured 2x SLOWER on hardware at
    # (32, 1024) (2448 vs 1247 us/step device) and pushes (64, 512) over
    # Mosaic's VMEM ceiling — the per-state 128-lane slab traffic and the
    # doubled predicated body cost more than the 10% recompute they save.
    # Kept as an explicitly-requested experiment (tolerance-tested on CPU,
    # docs/measurements/round2.md).
    exact_left = bool(exact_left) and nx // bx >= 2

    if row_inner:
        kernel = functools.partial(
            _kernel_row_inner, by=by, bx=bx, nx=nx, h=h, k_steps=k_steps,
            ny_global=ny_global, omega=float(omega), w1=float(accel_w1),
            w2=float(accel_w2),
        )
        grid = (nx // bx, h // by)
        out_map = lambda j, i: (0, i, j)
    else:
        kernel = functools.partial(
            _kernel, by=by, bx=bx, nx=nx, h=h, k_steps=k_steps,
            ny_global=ny_global, omega=float(omega), w1=float(accel_w1),
            w2=float(accel_w2), local_reuse=local_reuse,
            exact_left=exact_left,
        )
        grid = (h // by, nx // bx)
        out_map = lambda i, j: (0, i, j)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((NSPEEDS, by, bx), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, by + 2 * _MY, bx + 2 * _MX), jnp.float32),
            pltpu.VMEM((2, by + 2 * _MY, bx + 2 * _MX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),  # sem_l (local left-margin copy)
            pltpu.SMEM((k_steps, 1), jnp.float32),
        ] + ([pltpu.VMEM((k_steps, NSPEEDS, by + 2 * _MY, _MX), jnp.float32)]
             if exact_left else [])
          + ([pltpu.VMEM((k_steps * NSPEEDS, bx + 2 * _MX), jnp.float32)]
             if row_inner else []),
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

    def prepare(obstacles, olo, ohi):
        return (
            obstacles.astype(jnp.float32),
            olo.astype(jnp.float32),
            ohi.astype(jnp.float32),
        )

    def chunk(f, halo_lo, halo_hi, aux, scal):
        obst_f, olo_f, ohi_f = aux
        f_out, av = call(f, halo_lo, halo_hi, obst_f, olo_f, ohi_f, scal)
        return f_out, av[:, 0]

    return prepare, chunk
