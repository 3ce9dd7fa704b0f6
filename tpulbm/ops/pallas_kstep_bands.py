"""Band-major K-step temporal-blocking kernel for wide grids.

The 2-D tiled kernel (pallas_kstep2d.py) pays strided DMA on every window
piece at nx=4096: a (rows, 512) tile of a 4096-wide row-major array is 2 KB
segments on a 16 KB stride, and the 1-D kernel's contiguous full-width
blocks are exactly what made the 1024-wide grid fast. This variant fixes the
layout instead of the tiles: the state lives **band-major** —
``(NB, 9, H, BW)``, NB contiguous column bands — for the whole run
(converted once per runner call, amortized over all steps), so each
program's main window piece is a contiguous block of its band and only the
two 128-column margin pieces (from the neighbouring bands, modular) remain
strided. Everything else (8-row margins, K fused steps in VMEM, shard-halo
substitution at the global y edges, modular accel-row selection, owned-only
|u| sums) matches pallas_kstep/pallas_kstep2d; the physics body is the
shared ops/window_step.py.

x periodicity: band b's left margin comes from band (b-1) mod NB, right from
(b+1) mod NB — the band ring IS the x torus, no in-window wrap arithmetic
needed (the window rolls wrap garbage into margins, absorbed by the same
analysis as the 1-D kernel's owned_cols mode).

Left-margin reuse: the grid iterates (row block, band) with the band index
innermost, so the window for (i, b+1) shares its row block with (i, b) and
its left margin IS the tail of (i, b)'s main piece — already sitting in the
other VMEM slot. The kernel copies it VMEM-to-VMEM (contiguous, local)
instead of re-fetching it from HBM, halving the strided margin traffic;
only the right margin and the b == 0 wrap (band NB-1 at a new row block)
still come from HBM.

Narrow compute window: DMA offsets must stay 128-lane aligned, so the
*loaded* window keeps 128-column margins — but the K fused steps only
contaminate ``k`` columns inward per side, so the *compute* runs on an
in-VMEM slice ``bw + 2*k`` wide (one lane relayout per K-chunk, amortized
over the K steps). This cuts the x recompute overhead from
(bw+256)/bw to ~ (bw+128)/bw effective (lane-tile rounding) and is bitwise
identical on the owned region: every value in the narrow slice is genuine
neighbour data, and roll-wrap garbage penetrates at most k ≤ margin columns.
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

_MY = 8     # row margin (Mosaic sublane alignment; bounds K at 8)
_MX = 128   # column margin (lane alignment)
MAX_K = _MY
# Footprint target (f32 elements) for one *loaded* (WY, WX) plane. In
# narrow mode the lane relayout materializes a second window copy, so the
# budget is tighter; full-width compute affords more (measured: (16, 2048)
# at 73K compiles in full mode, fails in narrow).
_WINDOW_BUDGET = 64 * 1024
_WINDOW_BUDGET_FULL = 80 * 1024


def pick_bands(h: int, nx: int,
               narrow_cols: bool = False) -> Optional[Tuple[int, int]]:
    """(BY, BW): band width and row block minimizing compute-window overhead
    within the VMEM budget; ties prefer wider bands (more contiguous DMA,
    fewer margin bytes). With full-width compute (the production default)
    the overhead IS the loaded-window ratio; in narrow mode it is the
    lane-tile-rounded narrow plane."""
    budget = _WINDOW_BUDGET if narrow_cols else _WINDOW_BUDGET_FULL
    best = None
    best_key = None
    for bw in (2048, 1024, 512, 256, 128):
        if nx % bw or nx == bw:  # need >= 2 bands for the ring
            continue
        for by in range(8, min(h, 256) + 1, 8):
            if h % by:
                continue
            window = (by + 2 * _MY) * (bw + 2 * _MX)
            if window > budget:
                continue
            if narrow_cols:
                # effective compute plane: narrow window, lane-tile rounded
                eff = (by + 2 * _MY) * (-(-(bw + 2 * _MY) // 128) * 128)
            else:
                eff = window
            key = (eff / (by * bw), -bw)
            if best_key is None or key < best_key:
                best_key = key
                best = (by, bw)
    return best


def supported(h: int, nx: int, k: int) -> bool:
    return (
        1 <= k <= MAX_K
        and nx % 128 == 0
        and h >= k
        and pick_bands(h, nx) is not None
    )


def to_bands(f: jnp.ndarray, bw: int) -> jnp.ndarray:
    """(9, H, nx) row-major -> (NB, 9, H, BW) band-major."""
    c, h, nx = f.shape
    return f.reshape(c, h, nx // bw, bw).transpose(2, 0, 1, 3)


def from_bands(fb: jnp.ndarray) -> jnp.ndarray:
    """(NB, 9, H, BW) band-major -> (9, H, nx) row-major."""
    nb, c, h, bw = fb.shape
    return fb.transpose(1, 2, 0, 3).reshape(c, h, nb * bw)


def _kernel(
    f_ref,        # (NB, 9, H, BW) HBM, band-major
    lo_ref,       # (NB, 9, K, BW) VMEM: K global rows below the shard
    hi_ref,       # (NB, 9, K, BW) VMEM: K global rows above the shard
    obst_ref,     # (NB, H, BW) HBM float32 mask
    olo_ref,      # (NB, K, BW) VMEM
    ohi_ref,      # (NB, K, BW) VMEM
    scal_ref,     # (1, 2) SMEM int32: [global accel row, shard row offset]
    out_ref,      # (1, 9, BY, BW) VMEM block
    av_ref,       # (K, 1) SMEM
    fbuf,         # (2, 9, WY, WX) VMEM
    obuf,         # (2, WY, WX) VMEM
    sem_f, sem_o,  # DMA semaphores (2,)
    sem_l,        # local (VMEM-to-VMEM) left-margin copy semaphore (2,)
    acc,          # (K, 1) SMEM
    *,
    by: int,
    bw: int,
    nb: int,
    h: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    narrow_cols: bool = False,
):
    my, mx = _MY, _MX
    wy = by + 2 * my
    wx = bw + 2 * mx
    # Band index INNERMOST: (i, b) and (i, b+1) share a row block, so the
    # left margin of b+1 is the tail of b's main piece, reused from VMEM.
    i = pl.program_id(0)
    b = pl.program_id(1)
    nrow = pl.num_programs(0)
    lin = i * nb + b
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)
    n_static = h // by

    def band_pieces(bb, with_left):
        # (src_band, src_col, dst_col, width): the x torus via the band ring.
        left = jax.lax.rem(bb - 1 + nb, nb)
        right = jax.lax.rem(bb + 1, nb)
        pieces = [] if not with_left else [(left, bw - mx, 0, mx)]
        return pieces + [
            (bb, 0, mx, bw),
            (right, 0, mx + bw, mx),
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

    def dmas(bb, b_row, s, do_start, with_left):
        pieces = band_pieces(bb, with_left)
        for pred, src_row, row_sz, dst_row in row_cases(b_row):
            @pl.when(pred)
            def _():
                src_r = pl.multiple_of(
                    jnp.clip(src_row, 0, h - row_sz), _MY
                )
                for src_b, src_c, dst_c, width in pieces:
                    fc = pltpu.make_async_copy(
                        f_ref.at[src_b, :, pl.ds(src_r, row_sz),
                                 pl.ds(src_c, width)],
                        fbuf.at[s, :, pl.ds(dst_row, row_sz),
                                pl.ds(dst_c, width)],
                        sem_f.at[s],
                    )
                    oc = pltpu.make_async_copy(
                        obst_ref.at[src_b, pl.ds(src_r, row_sz),
                                    pl.ds(src_c, width)],
                        obuf.at[s, pl.ds(dst_row, row_sz),
                                pl.ds(dst_c, width)],
                        sem_o.at[s],
                    )
                    if do_start:
                        fc.start()
                        oc.start()
                    else:
                        fc.wait()
                        oc.wait()

    def local_left(src_s, dst_s, do_start):
        # Left margin of the NEXT window (same row block, band b+1) = the
        # tail of THIS window's main piece: a contiguous VMEM-to-VMEM copy
        # (full wy rows; rows outside the loaded region copy garbage, which
        # the margin analysis absorbs exactly as for the HBM path).
        fc = pltpu.make_async_copy(
            fbuf.at[src_s, :, :, pl.ds(bw, mx)],
            fbuf.at[dst_s, :, :, pl.ds(0, mx)],
            sem_l.at[dst_s],
        )
        oc = pltpu.make_async_copy(
            obuf.at[src_s, :, pl.ds(bw, mx)],
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
    nxt_b = jax.lax.rem(nxt, nb)
    have_next = nxt < nb * nrow

    # Wait for the inbound local left-margin copy FIRST: it reads the other
    # slot's main-piece tail, which the prefetch below is about to overwrite.
    @pl.when(b != 0)
    def _():
        local_left(nslot, slot, False)

    @pl.when(lin == 0)
    def _():
        dmas(jnp.int32(0), jnp.int32(0), 0, True, with_left=True)

    # Prefetch the next window's HBM pieces (its left margin comes from HBM
    # only at the band-ring wrap, where the row block changes).
    @pl.when(have_next & (nxt_b == 0))
    def _():
        dmas(nxt_b, nxt // nb, nslot, True, with_left=True)

    @pl.when(have_next & (nxt_b != 0))
    def _():
        dmas(nxt_b, nxt // nb, nslot, True, with_left=False)

    # Wait for this window's HBM pieces.
    @pl.when(b == 0)
    def _():
        dmas(b, i, slot, False, with_left=True)

    @pl.when(b != 0)
    def _():
        dmas(b, i, slot, False, with_left=False)

    # This window is now complete — hand its main-piece tail to the next.
    @pl.when(have_next & (nxt_b != 0))
    def _():
        local_left(slot, nslot, True)

    # -- window assembly ----------------------------------------------------
    zero = np.float32(0.0)
    is_first = i == 0
    is_last = i == n_static - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (wy, wx), 0)

    def halo_cols(ref, c=None):
        # (K, WX) halo plane across the band ring (window width incl. the
        # neighbour-band margins).
        parts = []
        for src_b, src_c, _dst, width in band_pieces(b, True):
            # src_c/width are static (only the band index is traced)
            plane = ref[src_b] if c is None else ref[src_b, c]
            parts.append(plane[:, src_c : src_c + width])
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

    # narrow compute window: margin k columns per side (see module
    # docstring). The slice sits at lane offset mx - k (not 128-aligned), so
    # it costs one all-lane relayout per channel per chunk; narrow_cols=False
    # computes the full loaded width instead (more VPU work, no relayout) —
    # which wins is measured per-shape (scripts/sweep_bands.py).
    if narrow_cols:
        x0 = mx - k_steps
        wxn = bw + 2 * k_steps
        ox = k_steps
    else:
        x0 = 0
        wxn = wx
        ox = mx
    w = [
        assemble(fbuf[slot, c], lo_ref, hi_ref, c)[:, x0 : x0 + wxn]
        for c in range(NSPEEDS)
    ]
    o = assemble(obuf[slot], olo_ref, ohi_ref)[:, x0 : x0 + wxn]
    blocked = o != zero

    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    win_start = shard_off + i * by - my
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    row_ids_n = jax.lax.broadcasted_iota(jnp.int32, (wy, wxn), 0)
    accel_sel = jax.lax.rem(row_ids_n - a_off + 2 * ny_global, ny_global) == 0

    w, parts = fused_window_steps(
        w, blocked, accel_sel, k_steps, omega, w1, w2,
        owned=(slice(my, my + by), slice(ox, ox + bw)),
    )
    for s, part in enumerate(parts):
        @pl.when(lin == 0)
        def _(s=s, part=part):
            acc[s, 0] = part

        @pl.when(lin > 0)
        def _(s=s, part=part):
            acc[s, 0] += part

    for c in range(NSPEEDS):
        out_ref[0, c] = w[c][my : my + by, ox : ox + bw]

    @pl.when(lin == nb * nrow - 1)
    def _():
        for s in range(k_steps):
            av_ref[s, 0] = acc[s, 0]


def make_kstep_bands(
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
    tile: Optional[Tuple[int, int]] = None,
    narrow_cols: bool = False,
):
    """Returns ``(prepare, chunk)`` over BAND-MAJOR arrays:

    ``chunk(fb, ylo, yhi, aux, scal) -> (fb', av[k_steps])`` where ``fb`` is
    (NB, 9, H, BW), ``ylo``/``yhi`` are (NB, 9, K, BW) band-major y-halo
    slabs, and aux = prepare(obst_bands_f32, olo, ohi). Use
    ``to_bands``/``from_bands`` at the runner boundary.
    """
    if tile is None:
        tile = pick_bands(h, nx, narrow_cols)
    if tile is None or not supported(h, nx, k_steps):
        raise ValueError(
            f"kstep_bands unsupported for local shape ({h}, {nx}), K={k_steps}"
        )
    by, bw = tile
    if h % by or nx % bw:
        raise ValueError(f"tile {tile} does not divide local shape ({h}, {nx})")
    nb = nx // bw
    if interpret is None:
        interpret = window_step.default_interpret()

    kernel = functools.partial(
        _kernel, by=by, bw=bw, nb=nb, h=h, k_steps=k_steps,
        ny_global=ny_global, omega=float(omega), w1=float(accel_w1),
        w2=float(accel_w2), narrow_cols=narrow_cols,
    )

    call = pl.pallas_call(
        kernel,
        grid=(h // by, nb),
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
            pl.BlockSpec((1, NSPEEDS, by, bw), lambda i, b: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, NSPEEDS, h, bw), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, by + 2 * _MY, bw + 2 * _MX), jnp.float32),
            pltpu.VMEM((2, by + 2 * _MY, bw + 2 * _MX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),  # sem_l (local left-margin copy)
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

    def prepare(obst_bands, olo, ohi):
        return (
            obst_bands.astype(jnp.float32),
            olo.astype(jnp.float32),
            ohi.astype(jnp.float32),
        )

    def chunk(fb, ylo, yhi, aux, scal):
        obst_f, olo_f, ohi_f = aux
        fb_out, av = call(fb, ylo, yhi, obst_f, olo_f, ohi_f, scal)
        return fb_out, av[:, 0]

    return prepare, chunk
