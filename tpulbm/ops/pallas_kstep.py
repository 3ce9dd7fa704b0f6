"""K-step temporal-blocking Pallas kernel for HBM-resident grids.

Advances K (<= 8) lattice timesteps in ONE pass over the state: each row
block is DMA'd once with an 8-row margin on each side, stepped K times
entirely in VMEM (redundantly recomputing the margin — the classic
trapezoidal/overlapped-tiling scheme), and written back once. HBM traffic
drops from 72 B/cell/step to ~((1 + (BY+16)/BY)/2) * 72 / K B/cell/step, and
in the sharded runner the halo exchange becomes K rows every K steps instead
of 1 row every step — a K-fold cut in collective frequency over the
reference's width-1 per-step MPI halos (d2q9-bgk.c:295-366).

Correctness of the fixed-size window: window-edge values become garbage as
steps proceed (the in-window rolls wrap window-locally, which is not the
global topology, and the outermost margin rows may start undefined), but a
wrong value propagates at most one row per step, so after s < 8 steps the
contamination front is still inside the 8-row margin and never reaches the
owned rows. The inflow-accelerated row is identified by GLOBAL row index
(modulo ny, using the shard's global offset), so a shard that only sees the
accelerated row inside its halo margin still applies the acceleration to its
copy — required once halos are K > 1 rows wide.

Per-step |u| sums are taken over owned rows only, so redundantly recomputed
margin cells are never double-counted across blocks or shards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulbm.core.lattice import NSPEEDS
from tpulbm.ops import window_step
from tpulbm.ops.window_step import fused_window_steps

_MARGIN = 8  # rows of overlap each side; bounds K at 8
_MX = 128    # lane-aligned column margin of the x_halo window
# Window footprint target: (BY+16) * window-width elements, sized for VMEM.
_BLOCK_BUDGET = 48 * 1024
MAX_K = _MARGIN


def pick_block_rows(h: int, nx: int, wx: Optional[int] = None) -> Optional[int]:
    """Largest 8-multiple row block dividing h whose (BY+16, wx) window fits
    the VMEM budget; ``wx`` defaults to nx (x_halo windows are wider)."""
    if wx is None:
        wx = nx
    best = None
    for by in range(8, min(h, 512) + 1, 8):
        if h % by == 0 and (by + 2 * _MARGIN) * wx <= _BLOCK_BUDGET:
            best = by
    return best


def supported(h: int, nx: int, k: int) -> bool:
    return (
        1 <= k <= MAX_K
        and nx % 128 == 0
        and h >= k
        and pick_block_rows(h, nx) is not None
    )


def supported_x_halo(h: int, nx: int, k: int) -> bool:
    """Shape gate for the x_halo (torus) mode: the window is 2*_MX wider."""
    return (
        1 <= k <= MAX_K
        and nx % 128 == 0
        and h >= k
        and pick_block_rows(h, nx, wx=nx + 2 * _MX) is not None
    )


def _kernel(
    # inputs (an unused donor ref precedes f_ref in the alias_donor variant)
    f_ref,        # (9, H, nx) HBM
    lo_ref,       # (9, K, nx) VMEM: the K global rows below the shard
    hi_ref,       # (9, K, nx) VMEM: the K global rows above the shard
    obst_ref,     # (H, nx) HBM float32 mask (1.0 = blocked)
    olo_ref,      # (K, nx) VMEM: obstacle mask below the shard
    ohi_ref,      # (K, nx) VMEM: obstacle mask above the shard
    scal_ref,     # (1, 2) SMEM int32: [global accel row, shard row offset]
    # outputs
    out_ref,      # (9, BY, nx) VMEM block
    av_ref,       # (K, 1) SMEM: per-fused-step sum of |u| over owned rows
    # scratch
    fbuf,         # (2, 9, BY+16, nx) VMEM
    obuf,         # (2, BY+16, nx) VMEM
    sem_f, sem_o,  # DMA semaphores, (2,) each
    sem_r,        # row-overlap local copy semaphore, (2,)
    acc,          # (K, 1) SMEM accumulator
    # (K, 9, m, wx) VMEM slab buffer, present only in slab_bottom mode: the
    # per-state owned-top rows of the previous block, consumed as this
    # block's exact bottom margin (see fused_window_steps docstring).
    *extra_scratch,
    by: int,
    nx: int,
    h: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    slots: int = 2,
    ox: int = 0,
    ow: int = 0,
    canon_ny: int = 0,
    canon_nx: int = 0,
    xrefs=None,
    row_reuse: bool = False,
    slab_bottom: bool = False,
    slab_all: bool = False,
    x_narrow: bool = True,
    collide_split: int = 1,
):
    # xrefs = (xlo_ref, xhi_ref, oxlo_ref, oxhi_ref) in x_halo (torus) mode:
    # (9, H, _MX) / (H, _MX) HBM refs holding K valid halo columns from the
    # x ring neighbours inside lane-aligned _MX-wide pads. The window is then
    # [_MX | nx | _MX] wide, assembled by three DMA pieces per row case, and
    # the compute runs on a narrow slice nx + 2K wide (only K columns per
    # side are genuine; the rest is margin the temporal-blocking analysis
    # absorbs anyway — same trick as pallas_kstep_bands).
    if ow == 0:
        ow = nx
    mx = _MX if xrefs is not None else 0
    wx = nx + 2 * mx
    m = _MARGIN
    win = by + 2 * m
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, slots)
    nslot = jax.lax.rem(i + 1, slots)

    # -- double-buffered window DMAs (all offsets 8-aligned) ----------------
    # Four static shapes depending on block position; each case issues
    # exactly one f copy + one obstacle copy, so start/wait pair up as long
    # as both run under the same predicates.
    n_static = h // by

    def case_copies(b, s, reduced=False):
        # (predicate, src_lo, src_sz, dst_lo); only the cases that can occur
        # for the static block count are constructed (sizes are static and
        # must stay within the (9, H, nx) source even for inactive cases).
        # ``reduced=True`` (row_reuse): the window's top 2m rows arrive via
        # the local overlap copy from the previous block's window, so only
        # rows below them are fetched from HBM.
        first = b == 0
        last = b == n - 1
        cases = []
        if n_static == 1:
            cases.append((first & last, 0, by, m))
        elif reduced:
            if n_static > 2:
                cases.append(((b != 0) & (b != n - 1), b * by + m, by, 2 * m))
            if by > m:
                cases.append(((b != 0) & last, b * by + m, by - m, 2 * m))
        else:
            cases.append((first, 0, by + m, m))
            if n_static > 2:
                cases.append(((b != 0) & (b != n - 1), b * by - m, win, 0))
            cases.append(((b != 0) & last, b * by - m, by + m, 0))
        return cases

    if xrefs is None:
        pieces = [(f_ref, obst_ref, 0, nx)]
    else:
        xlo_ref, xhi_ref, oxlo_ref, oxhi_ref = xrefs
        pieces = [
            (xlo_ref, oxlo_ref, 0, mx),
            (f_ref, obst_ref, mx, nx),
            (xhi_ref, oxhi_ref, mx + nx, mx),
        ]

    def make_copies(src_lo, src_sz, dst_lo, s):
        # Clamp so predicated-off cases still describe an in-bounds copy
        # (the address computation exists even when the case doesn't run).
        # Both clamp bounds are multiples of 8, so the hint stays valid —
        # Mosaic cannot see divisibility through the clip on its own.
        src_lo = pl.multiple_of(jnp.clip(src_lo, 0, h - src_sz), _MARGIN)
        copies = []
        for fsrc, osrc, dst_c, width in pieces:
            copies.append(pltpu.make_async_copy(
                fsrc.at[:, pl.ds(src_lo, src_sz), :],
                fbuf.at[s, :, pl.ds(dst_lo, src_sz), pl.ds(dst_c, width)],
                sem_f.at[s],
            ))
            copies.append(pltpu.make_async_copy(
                osrc.at[pl.ds(src_lo, src_sz), :],
                obuf.at[s, pl.ds(dst_lo, src_sz), pl.ds(dst_c, width)],
                sem_o.at[s],
            ))
        return copies

    def start_dmas(b, s, reduced=False):
        for pred, src_lo, src_sz, dst_lo in case_copies(b, s, reduced):
            @pl.when(pred)
            def _():
                for c in make_copies(src_lo, src_sz, dst_lo, s):
                    c.start()

    def wait_dmas(b, s, reduced=False):
        for pred, src_lo, src_sz, dst_lo in case_copies(b, s, reduced):
            @pl.when(pred)
            def _():
                for c in make_copies(src_lo, src_sz, dst_lo, s):
                    c.wait()

    def local_rows(src_s, dst_s, do_start):
        # Row-overlap reuse: the next block's top 2m window rows (its row
        # margin + first m owned rows) are the tail rows of THIS window —
        # global rows [(i+1)*by - m, (i+1)*by + m) — for every block
        # geometry, including the x-halo margin columns. A contiguous
        # VMEM-to-VMEM copy replaces that part of the HBM fetch.
        copies = [
            pltpu.make_async_copy(
                fbuf.at[src_s, :, pl.ds(by, 2 * m), :],
                fbuf.at[dst_s, :, pl.ds(0, 2 * m), :],
                sem_r.at[dst_s],
            ),
            pltpu.make_async_copy(
                obuf.at[src_s, pl.ds(by, 2 * m), :],
                obuf.at[dst_s, pl.ds(0, 2 * m), :],
                sem_r.at[dst_s],
            ),
        ]
        for c in copies:
            if do_start:
                c.start()
            else:
                c.wait()

    if slots == 1:
        # no prefetch: fetch-then-compute (trades DMA overlap for the VMEM
        # that buys a larger BY and less window recompute)
        start_dmas(i, 0)
        wait_dmas(i, 0)
    elif row_reuse and n_static >= 2:
        # Wait for the inbound overlap copy FIRST: it reads the other slot's
        # tail rows, which the prefetch below is about to overwrite.
        @pl.when(i != 0)
        def _():
            local_rows(nslot, slot, False)

        @pl.when(i == 0)
        def _():
            start_dmas(jnp.int32(0), 0)

        @pl.when(i + 1 < n)
        def _():
            start_dmas(i + 1, nslot, reduced=True)

        @pl.when(i == 0)
        def _():
            wait_dmas(i, slot)

        @pl.when(i != 0)
        def _():
            wait_dmas(i, slot, reduced=True)

        # This window is complete — hand its tail rows to the next block.
        @pl.when(i + 1 < n)
        def _():
            local_rows(slot, nslot, True)
    else:
        @pl.when(i == 0)
        def _():
            start_dmas(jnp.int32(0), 0)

        @pl.when(i + 1 < n)
        def _():
            start_dmas(i + 1, nslot)

        wait_dmas(i, slot)

    # -- assemble the window values -----------------------------------------
    zero = np.float32(0.0)
    is_first = i == 0
    is_last = i == n - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (win, wx), 0)

    def assemble(buf_plane, lo_halo, hi_halo):
        """Window plane with shard-halo substitution at the global edges.

        lo_halo/hi_halo are (K, nx); they land at window rows [m-K, m) for
        the first block and [by+m, by+m+K) for the last. Rows outside the
        halo coverage stay garbage (absorbed by the margin analysis)."""
        v = buf_plane
        lo_full = jnp.pad(lo_halo, ((m - k_steps, win - m), (0, 0)))
        hi_full = jnp.pad(hi_halo, ((by + m, m - k_steps), (0, 0)))
        v = jnp.where(is_first & (row_ids < m) & (row_ids >= m - k_steps),
                      lo_full, v)
        v = jnp.where(is_last & (row_ids >= by + m)
                      & (row_ids < by + m + k_steps), hi_full, v)
        return v

    if xrefs is not None and x_narrow:
        # narrow compute window: only K halo columns per side are genuine.
        # The slice sits at lane offset mx - K (not 128-aligned): one
        # all-lane relayout per chunk — cheaper than the saved recompute on
        # small torus shards, but x_narrow=False (full-width compute) is
        # the right trade for the strips runner's tall windows (the
        # relayout's second window copy also pushes Mosaic VMEM).
        x0 = mx - k_steps
        wxn = nx + 2 * k_steps
        ox, ow = k_steps, nx
    elif xrefs is not None:
        x0 = 0
        wxn = wx
        ox, ow = mx, nx
    else:
        x0 = 0
        wxn = wx

    # Row-narrowed compute: DMA margins stay 8 rows (sublane-aligned
    # offsets), but the K fused steps only contaminate K rows inward per
    # side, so the compute runs on a (by + 2K)-row slice — for K < 8 this
    # removes pure-garbage margin rows (same absorption argument as the
    # column narrowing above; one sublane relayout per K-chunk).
    y0 = m - k_steps
    wyn = by + 2 * k_steps

    w = [assemble(fbuf[slot, c], lo_ref[c], hi_ref[c])[y0 : y0 + wyn,
                                                       x0 : x0 + wxn]
         for c in range(NSPEEDS)]
    o = assemble(obuf[slot], olo_ref[:], ohi_ref[:])[y0 : y0 + wyn,
                                                     x0 : x0 + wxn]
    blocked = o != zero

    # Select every window row whose GLOBAL row is the accelerated one —
    # modular, because when the window exceeds the torus (win > ny) the same
    # global row appears both as a halo copy and as an owned row, and both
    # copies must be accelerated identically.
    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    win_start = shard_off + i * by - k_steps  # global row of narrow row 0
    row_ids_n = jax.lax.broadcasted_iota(jnp.int32, (wyn, wxn), 0)
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids_n - a_off + 2 * ny_global, ny_global) == 0

    # Periodic-extension padding (padded runner): mirror rows (padded global
    # index >= real ny) evolve like their originals but are excluded from
    # the |u| series so canonical cells count exactly once.
    av_mask = None
    if canon_ny:
        av_mask = (win_start + row_ids_n) < canon_ny

    # -- K fused steps, constant window shape (see ops.window_step) ---------
    owned_slc = (slice(k_steps, k_steps + by), slice(ox, ox + ow))

    x_canon = canon_nx or None

    if not slab_bottom:
        w, parts = fused_window_steps(
            w, blocked, accel_sel, k_steps, omega, w1, w2,
            owned=owned_slc, av_mask=av_mask, collide_split=collide_split,
            x_canon=x_canon,
        )
        for s, part in enumerate(parts):
            @pl.when(i == 0)
            def _(s=s, part=part):
                acc[s, 0] = part

            @pl.when(i > 0)
            def _(s=s, part=part):
                acc[s, 0] += part

        for c in range(NSPEEDS):
            out_ref[c] = w[c][k_steps : k_steps + by, ox : ox + ow]
    else:
        # Exact bottom substitution (k == m): blocks run bottom-to-top, so
        # the previous block's owned-top rows at every intermediate state
        # are this block's exact bottom margin — read per state from the
        # slab scratch and overwritten with our own (read-before-write on
        # the same slot). Block 0's bottom is the ring halo: it keeps the
        # classic recompute body.
        # Slab layout: plain mode keeps the full m-row slab (measured ~2.4
        # us/step faster at 1024^2 than the slim variant — aligned reads,
        # no broadcast). x_halo windows are 1280+ lanes wide, where the
        # m-row slab's 2.95 MB pushes Mosaic past VMEM (SIGABRT): there the
        # SLIM slab stores ONE exact row per (state, channel) — all the
        # substitution truly needs (window_step broadcasts it across the
        # margin) — in a 2-D (K*9, wx) layout that dodges 8-sublane
        # padding: 0.37 MB, and full,exact compiles.
        slab = extra_scratch[0]
        slim = xrefs is not None

        if slim:
            def sub_read(s):
                return [slab[pl.ds(s * NSPEEDS + c, 1), :]
                        for c in range(NSPEEDS)]

            def collect(s, rows):
                for c in range(NSPEEDS):
                    slab[pl.ds(s * NSPEEDS + c, 1), :] = rows[c]

            coll_rows = (by + m - 1, 1)
        else:
            def sub_read(s):
                return [slab[s, c] for c in range(NSPEEDS)]

            def collect(s, rows):
                for c in range(NSPEEDS):
                    slab[s, c] = rows[c]

            coll_rows = (by, m)

        def run_and_store(sub, first):
            wf, parts = fused_window_steps(
                w, blocked, accel_sel, k_steps, omega, w1, w2,
                owned=owned_slc, av_mask=av_mask,
                sub_read=sub, sub_rows=m,
                collect=collect, collect_rows=coll_rows,
                collide_split=collide_split, x_canon=x_canon,
            )
            for s, part in enumerate(parts):
                if first:
                    acc[s, 0] = part
                else:
                    acc[s, 0] += part
            for c in range(NSPEEDS):
                out_ref[c] = wf[c][k_steps : k_steps + by, ox : ox + ow]

        if slab_all:
            # Single body for every block: block 0 substitutes whatever the
            # slab scratch holds (garbage at call start) — its first
            # k_steps owned rows come out contaminated and the CALLER must
            # recompute them (values AND sums) with a fix pass; its |u|
            # contribution uses the reduced owned slice that skips them
            # (dual static-slice sums — a mask formulation SIGABRTs
            # Mosaic). Halves the traced body vs the classic+exact pair
            # (measured 46.9 vs 50.1 us/step at 1024^2).
            def run_all():
                wf, parts = fused_window_steps(
                    w, blocked, accel_sel, k_steps, omega, w1, w2,
                    owned=owned_slc, av_mask=av_mask,
                    sub_read=sub_read, sub_rows=m,
                    collect=collect, collect_rows=coll_rows,
                    owned_alt=(slice(2 * k_steps, k_steps + by),
                               owned_slc[1]),
                    collide_split=collide_split, x_canon=x_canon,
                )
                for s, (pf, pr) in enumerate(parts):
                    @pl.when(i == 0)
                    def _(s=s, pr=pr):
                        acc[s, 0] = pr

                    @pl.when(i > 0)
                    def _(s=s, pf=pf):
                        acc[s, 0] += pf

                for c in range(NSPEEDS):
                    out_ref[c] = wf[c][k_steps : k_steps + by, ox : ox + ow]

            run_all()
        else:
            @pl.when(i == 0)
            def _():
                run_and_store(None, True)

            @pl.when(i > 0)
            def _():
                run_and_store(sub_read, False)

    @pl.when(i == n - 1)
    def _():
        for s in range(k_steps):
            av_ref[s, 0] = acc[s, 0]


def make_kstep(
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
    owned_cols: Optional[tuple] = None,
    canon_ny: int = 0,
    canon_nx: int = 0,
    x_halo: bool = False,
    row_reuse: Optional[bool] = None,
    exact_bottom: Optional[bool] = None,
    exact_bottom_all: bool = False,
    x_narrow: bool = True,
    collide_split: int = 1,
):
    """Returns ``(prepare, chunk)``:

    ``prepare(obstacles_bool, olo, ohi)`` -> aux (loop-invariant f32 masks);
    ``chunk(f, halo_lo, halo_hi, aux, scal) -> (f', av_sums[k_steps])``
    advances k_steps timesteps. ``scal`` is an int32 (1, 2) array holding
    [global accel row, shard global row offset]; halos are (9, K, nx).

    ``owned_cols=(ox, ow)`` restricts the output (and |u| sums) to window
    columns [ox, ox+ow) — used by the torus runner, whose local array is an
    x-halo-extended block: the in-window x roll then wraps garbage into the
    margins instead of the real torus, which the margin analysis absorbs for
    K <= 8 as long as >= K valid halo columns sit adjacent to the owned ones.

    ``canon_ny`` (nonzero = the REAL global ny when the grid is padded by
    periodic extension): rows whose padded global index is >= canon_ny are
    mirrors — they step like their originals but are excluded from the |u|
    series. ``ny_global`` is then also the real ny, so the modular accel
    selection hits the mirror of the accelerated row too.

    ``x_halo=True`` (the torus runner): the local block is (9, h, nx) with
    BOTH axes sharded; x halos arrive as separate (9, h, _MX) HBM arrays
    (K valid columns inside lane-aligned pads) and the y halos are
    (9, K, nx + 2*_MX) corner-carrying slabs of the x-extended row band.
    chunk then takes ``(f, halo_lo, halo_hi, aux, scal, xlo, xhi)`` and
    prepare ``(obstacles, olo, ohi, oxlo, oxhi)``. This replaces
    materializing an x-extended copy of the whole block per K steps with
    two _MX-wide margin DMA pieces per window.
    """
    if x_halo and (alias_donor or owned_cols is not None):
        raise ValueError("x_halo is incompatible with alias_donor/owned_cols")
    if canon_nx and x_halo:
        raise ValueError("canon_nx (periodic x-extension) is incompatible "
                         "with x_halo (torus column sharding)")
    wx = nx + 2 * _MX if x_halo else nx
    if by is None:
        by = pick_block_rows(h, nx, wx=wx)
    ok = supported_x_halo(h, nx, k_steps) if x_halo else supported(h, nx, k_steps)
    if by is None or not ok or h % by or by % 8:
        raise ValueError(
            f"kstep kernel unsupported for local shape ({h}, {nx}), K={k_steps}"
        )
    if interpret is None:
        interpret = window_step.default_interpret()
    n_blocks = h // by
    if row_reuse is None:
        row_reuse = slots == 2   # on wherever the 2-slot pipeline runs
    if exact_bottom is None:
        # Needs K slab states deep enough to cover the margin (k == m) and
        # at least two blocks to have a previous block to read from.
        exact_bottom = k_steps == _MARGIN and h // by >= 2
    else:
        exact_bottom = exact_bottom and k_steps == _MARGIN and h // by >= 2
    # slab_all: one exact body for every block — block 0 substitutes
    # garbage, contaminating strip rows [0, K) (values and sums), which the
    # CALLER must recompute with a fix pass. Needs by - m >= K-1 so block
    # 0's collected slab stays valid for block 1.
    exact_bottom_all = (
        exact_bottom_all and exact_bottom and by >= _MARGIN + k_steps
    )
    ox, ow = owned_cols if owned_cols is not None else (0, nx)
    if ox % 128 or ow % 128 or ox + ow > nx:
        raise ValueError(f"owned_cols {owned_cols} must be 128-aligned and in range")

    kernel = functools.partial(
        _kernel, by=by, nx=nx, h=h, k_steps=k_steps, ny_global=ny_global,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
        slots=slots, ox=ox, ow=ow, canon_ny=canon_ny, canon_nx=canon_nx,
        row_reuse=row_reuse,
        slab_bottom=exact_bottom, slab_all=exact_bottom_all,
        x_narrow=x_narrow, collide_split=collide_split,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # f
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo lo
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo hi
        pl.BlockSpec(memory_space=pl.ANY),   # obstacles
        pl.BlockSpec(memory_space=pltpu.VMEM),  # obst halo lo
        pl.BlockSpec(memory_space=pltpu.VMEM),  # obst halo hi
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
    ]
    kernel_fn = kernel
    io_aliases = {}
    if x_halo:
        # x-halo margins travel as HBM refs right after their main arrays
        in_specs = (
            in_specs[:1]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2      # xlo, xhi
            + in_specs[1:4]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2      # oxlo, oxhi
            + in_specs[4:]
        )

        def kernel_fn(f_ref, xlo_ref, xhi_ref, lo_ref, hi_ref, obst_ref,
                      oxlo_ref, oxhi_ref, olo_ref, ohi_ref, scal_ref, *rest):
            return kernel(
                f_ref, lo_ref, hi_ref, obst_ref, olo_ref, ohi_ref, scal_ref,
                *rest, xrefs=(xlo_ref, xhi_ref, oxlo_ref, oxhi_ref),
            )

    elif alias_donor:
        # Explicit ping-pong: the output lands in a donated buffer (the
        # caller passes the grand-previous state), letting a scanned caller
        # avoid the carry copy.
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + in_specs

        def kernel_fn(donor_ref, *rest):
            del donor_ref  # storage only; never read
            return kernel(*rest)

        io_aliases = {0: 0}

    call = pl.pallas_call(
        kernel_fn,
        grid=(n_blocks,),
        in_specs=in_specs,
        input_output_aliases=io_aliases,
        out_specs=[
            pl.BlockSpec((NSPEEDS, by, ow), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, h, ow), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, NSPEEDS, by + 2 * _MARGIN, wx), jnp.float32),
            pltpu.VMEM((slots, by + 2 * _MARGIN, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),  # sem_r (row-overlap reuse)
            pltpu.SMEM((k_steps, 1), jnp.float32),
        ] + ([pltpu.VMEM(
                # x_halo: 2-D slim slab (one row per state/channel, width =
                # the compute window); plain: full m-row slab (see kernel)
                (k_steps * NSPEEDS,
                 nx + 2 * k_steps if x_narrow else nx + 2 * _MX)
                if x_halo else
                (k_steps, NSPEEDS, _MARGIN, nx), jnp.float32)]
             if exact_bottom else []),
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

    if x_halo:
        def prepare(obstacles, olo, ohi, oxlo, oxhi):
            return (
                obstacles.astype(jnp.float32),
                olo.astype(jnp.float32),
                ohi.astype(jnp.float32),
                oxlo.astype(jnp.float32),
                oxhi.astype(jnp.float32),
            )

        def chunk(f, halo_lo, halo_hi, aux, scal, xlo, xhi):
            obst_f, olo_f, ohi_f, oxlo_f, oxhi_f = aux
            f_out, av = call(
                f, xlo, xhi, halo_lo, halo_hi, obst_f, oxlo_f, oxhi_f,
                olo_f, ohi_f, scal,
            )
            return f_out, av[:, 0]

        return prepare, chunk

    def prepare(obstacles, olo, ohi):
        return (
            obstacles.astype(jnp.float32),
            olo.astype(jnp.float32),
            ohi.astype(jnp.float32),
        )

    if alias_donor:
        def chunk(f, halo_lo, halo_hi, aux, scal, donor):
            obst_f, olo_f, ohi_f = aux
            f_out, av = call(
                donor, f, halo_lo, halo_hi, obst_f, olo_f, ohi_f, scal
            )
            return f_out, av[:, 0]
    else:
        def chunk(f, halo_lo, halo_hi, aux, scal):
            obst_f, olo_f, ohi_f = aux
            f_out, av = call(f, halo_lo, halo_hi, obst_f, olo_f, ohi_f, scal)
            return f_out, av[:, 0]

    return prepare, chunk
