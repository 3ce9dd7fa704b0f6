"""Fused multi-strip K-step kernel for wide grids (single device).

The strips experiment (dist/runner._make_kstep_strips_runner) showed the
right window economics — 1024-wide strips with 128-column margins and the
1-D kernel's row machinery give (BY+8, BX+256) effective compute per
(BY, BX) owned at K=8, vs kstep2d's (BY+16, BX+256) — but paid 1.38x in
per-strip pallas_call pipeline drains. This kernel fuses all strips into
ONE call: grid = (NB, H/BY) with ROW BLOCKS INNERMOST, so consecutive
programs chain down each strip and the DMA pipeline never drains.

Per strip the program chain carries the 1-D kernel's two couplings:

- row-overlap DMA reuse: the next block's top 2m window rows are the tail
  of this window — a local VMEM copy replaces that part of the HBM fetch
  (block 0 of each strip loads fully);
- exact bottom-margin substitution: this block's owned rows adjacent to
  the next block, at every intermediate state, are saved to a slim
  one-row-per-(state, channel) slab and injected per fused step, so the
  collide skips the bottom margin (block 0 of each strip keeps the
  classic full-window body — its bottom is the torus wrap, not yet
  computed this chunk).

State is band-major (NB, 9, H, BX) (pallas_kstep_bands.to_bands) so the
main window piece is contiguous; the x margins arrive as (NB, 9, H, 128)
lane-aligned pad arrays materialized per K-chunk by the runner (K valid
columns each — 2*K/BX of a pass, fully DMA-overlapped), and the y halos as
corner-carrying (NB, 9, K, BX+256) slabs of the x-extended strips.

Reference analog: the fused timestep hot loop d2q9-bgk.c:493-704 with the
tiled decomposition its report declined; the physics body is the shared
ops/window_step.py.
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

_M = 8       # row margin (sublane alignment; bounds K at 8)
_MX = 128    # lane-aligned x-margin pad width
MAX_K = _M


def supported(h: int, nx: int, k: int, bx: int = 1024, by: int = 32) -> bool:
    return (
        1 <= k <= MAX_K
        and bx % 128 == 0
        and nx % bx == 0
        and nx > bx          # >= 2 strips for the ring
        and by % _M == 0
        and h % by == 0
    )


def _kernel(
    f_ref,       # (NB, 9, H, BX) HBM, band-major
    xlo_ref,     # (NB, 9, H, MX) HBM: left-neighbour strip edge (padded)
    xhi_ref,     # (NB, 9, H, MX) HBM: right-neighbour strip edge (padded)
    lo_ref,      # (NB, 9, K, WX) VMEM: y halo below (x-extended)
    hi_ref,      # (NB, 9, K, WX) VMEM: y halo above (x-extended)
    obst_ref,    # (NB, H, BX) HBM f32 mask
    oxlo_ref,    # (NB, H, MX) HBM
    oxhi_ref,    # (NB, H, MX) HBM
    olo_ref,     # (NB, K, WX) VMEM
    ohi_ref,     # (NB, K, WX) VMEM
    scal_ref,    # (1, 2) SMEM int32: [global accel row, shard row offset]
    out_ref,     # (1, 9, BY, BX) VMEM block
    av_ref,      # (K, 1) SMEM
    fbuf,        # (2, 9, WY, WX) VMEM
    obuf,        # (2, WY, WX) VMEM
    sem_f, sem_o,  # DMA semaphores (2,)
    sem_r,       # row-overlap local copy semaphore (2,)
    acc,         # (K, 1) SMEM
    slab,        # (K*9, WX) VMEM slim slab (one exact row per state/chan)
    *,
    by: int,
    bx: int,
    nb: int,
    h: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
    row_reuse: bool = True,
    exact_bottom: bool = True,
):
    m = _M
    mx = _MX
    wx = bx + 2 * mx
    win = by + 2 * m
    b = pl.program_id(0)
    i = pl.program_id(1)
    nrow = pl.num_programs(1)
    lin = b * nrow + i
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)
    n_static = h // by

    def case_copies(b_row, reduced=False):
        # identical row-case policy to pallas_kstep (see its docstring)
        first = b_row == 0
        last = b_row == nrow - 1
        cases = []
        if n_static == 1:
            cases.append((first & last, 0, by, m))
        elif reduced:
            if n_static > 2:
                cases.append(
                    ((b_row != 0) & (b_row != nrow - 1),
                     b_row * by + m, by, 2 * m)
                )
            if by > m:
                cases.append(((b_row != 0) & last, b_row * by + m,
                              by - m, 2 * m))
        else:
            cases.append((first, 0, by + m, m))
            if n_static > 2:
                cases.append(((b_row != 0) & (b_row != nrow - 1),
                              b_row * by - m, win, 0))
            cases.append(((b_row != 0) & last, b_row * by - m, by + m, 0))
        return cases

    def make_copies(bb, src_lo, src_sz, dst_lo, s):
        src_lo = pl.multiple_of(jnp.clip(src_lo, 0, h - src_sz), _M)
        pieces = [
            (xlo_ref, oxlo_ref, 0, mx),
            (f_ref, obst_ref, mx, bx),
            (xhi_ref, oxhi_ref, mx + bx, mx),
        ]
        copies = []
        for fsrc, osrc, dst_c, width in pieces:
            copies.append(pltpu.make_async_copy(
                fsrc.at[bb, :, pl.ds(src_lo, src_sz), :],
                fbuf.at[s, :, pl.ds(dst_lo, src_sz), pl.ds(dst_c, width)],
                sem_f.at[s],
            ))
            copies.append(pltpu.make_async_copy(
                osrc.at[bb, pl.ds(src_lo, src_sz), :],
                obuf.at[s, pl.ds(dst_lo, src_sz), pl.ds(dst_c, width)],
                sem_o.at[s],
            ))
        return copies

    def dmas(bb, b_row, s, do_start, reduced):
        for pred, src_lo, src_sz, dst_lo in case_copies(b_row, reduced):
            @pl.when(pred)
            def _():
                for c in make_copies(bb, src_lo, src_sz, dst_lo, s):
                    if do_start:
                        c.start()
                    else:
                        c.wait()

    def local_rows(src_s, dst_s, do_start):
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

    nxt = lin + 1
    nxt_i = jax.lax.rem(nxt, nrow)
    have_next = nxt < nb * nrow
    use_reuse = row_reuse and n_static >= 2

    if use_reuse:
        # inbound overlap copy first: its source is the slot the prefetch
        # below overwrites
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
        dmas(b, i, slot, False, False)

    @pl.when(i != 0)
    def _():
        dmas(b, i, slot, False, use_reuse)

    if use_reuse:
        @pl.when(have_next & (nxt_i != 0))
        def _():
            local_rows(slot, nslot, True)

    # -- window assembly ----------------------------------------------------
    zero = np.float32(0.0)
    is_first = i == 0
    is_last = i == nrow - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (win, wx), 0)

    def assemble(buf_plane, lo_plane, hi_plane):
        v = buf_plane
        lo_full = jnp.pad(lo_plane, ((m - k_steps, win - m), (0, 0)))
        hi_full = jnp.pad(hi_plane, ((by + m, m - k_steps), (0, 0)))
        v = jnp.where(is_first & (row_ids < m) & (row_ids >= m - k_steps),
                      lo_full, v)
        v = jnp.where(is_last & (row_ids >= by + m)
                      & (row_ids < by + m + k_steps), hi_full, v)
        return v

    w = [assemble(fbuf[slot, c], lo_ref[b, c], hi_ref[b, c])
         for c in range(NSPEEDS)]
    o = assemble(obuf[slot], olo_ref[b], ohi_ref[b])
    blocked = o != zero

    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    # window row 0 is m rows below the block (this kernel computes the
    # full window — no row narrowing)
    win_start = shard_off + i * by - m
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    owned_slc = (slice(m, m + by), slice(mx, mx + bx))

    if not exact_bottom:
        wf, parts = fused_window_steps(
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
            out_ref[0, c] = wf[c][m : m + by, mx : mx + bx]
    else:
        def sub_read(s):
            return [slab[pl.ds(s * NSPEEDS + c, 1), :]
                    for c in range(NSPEEDS)]

        def collect(s, rows):
            for c in range(NSPEEDS):
                slab[pl.ds(s * NSPEEDS + c, 1), :] = rows[c]

        def run_and_store(sub):
            wf, parts = fused_window_steps(
                w, blocked, accel_sel, k_steps, omega, w1, w2,
                owned=owned_slc,
                sub_read=sub, sub_rows=m,
                collect=collect, collect_rows=(by + m - 1, 1),
            )
            for s, part in enumerate(parts):
                @pl.when(lin == 0)
                def _(s=s, part=part):
                    acc[s, 0] = part

                @pl.when(lin > 0)
                def _(s=s, part=part):
                    acc[s, 0] += part

            for c in range(NSPEEDS):
                out_ref[0, c] = wf[c][m : m + by, mx : mx + bx]

        # Block 0 of each strip: classic body (its bottom is the torus
        # wrap, not computed this chunk).
        @pl.when(i == 0)
        def _():
            run_and_store(None)

        @pl.when(i > 0)
        def _():
            run_and_store(sub_read)

    @pl.when(lin == nb * nrow - 1)
    def _():
        for s in range(k_steps):
            av_ref[s, 0] = acc[s, 0]


def make_kstep_strips(
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
    bx: int = 1024,
    by: int = 32,
    row_reuse: bool = True,
    exact_bottom: bool = True,
):
    """Returns ``(prepare, chunk)`` over BAND-MAJOR arrays:

    ``chunk(fb, ylo, yhi, aux, scal, xlo, xhi) -> (fb', av[k_steps])``
    where ``fb`` is (NB, 9, H, BX), ``xlo``/``xhi`` are (NB, 9, H, 128)
    padded strip-edge arrays (K valid columns), ``ylo``/``yhi`` are
    (NB, 9, K, BX+256) corner-carrying x-extended y slabs, and
    aux = prepare(obst_bands, oylo, oyhi, oxlo, oxhi)."""
    if not supported(h, nx, k_steps, bx, by):
        raise ValueError(
            f"kstep_strips unsupported for ({h}, {nx}), K={k_steps}, "
            f"bx={bx}, by={by}"
        )
    nb = nx // bx
    wx = bx + 2 * _MX
    if interpret is None:
        interpret = window_step.default_interpret()
    # by >= m + k keeps block 0's collected slab ahead of its own bottom
    # contamination (see pallas_kstep's slab_all analysis)
    exact = (exact_bottom and k_steps == _M and h // by >= 2
             and by >= _M + k_steps)

    kernel = functools.partial(
        _kernel, by=by, bx=bx, nb=nb, h=h, k_steps=k_steps,
        ny_global=ny_global, omega=float(omega), w1=float(accel_w1),
        w2=float(accel_w2), row_reuse=row_reuse, exact_bottom=exact,
    )

    call = pl.pallas_call(
        kernel,
        grid=(nb, h // by),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # f bands
            pl.BlockSpec(memory_space=pl.ANY),      # xlo
            pl.BlockSpec(memory_space=pl.ANY),      # xhi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ylo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # yhi
            pl.BlockSpec(memory_space=pl.ANY),      # obstacles
            pl.BlockSpec(memory_space=pl.ANY),      # oxlo
            pl.BlockSpec(memory_space=pl.ANY),      # oxhi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # oylo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # oyhi
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=[
            pl.BlockSpec((1, NSPEEDS, by, bx), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, NSPEEDS, h, bx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, by + 2 * _M, wx), jnp.float32),
            pltpu.VMEM((2, by + 2 * _M, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((k_steps, 1), jnp.float32),
            pltpu.VMEM((k_steps * NSPEEDS, wx), jnp.float32),
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

    def prepare(obst_bands, oylo, oyhi, oxlo, oxhi):
        return (
            obst_bands.astype(jnp.float32),
            oylo.astype(jnp.float32),
            oyhi.astype(jnp.float32),
            oxlo.astype(jnp.float32),
            oxhi.astype(jnp.float32),
        )

    def chunk(fb, ylo, yhi, aux, scal, xlo, xhi):
        obst_f, oylo_f, oyhi_f, oxlo_f, oxhi_f = aux
        fb_out, av = call(fb, xlo, xhi, ylo, yhi, obst_f, oxlo_f, oxhi_f,
                          oylo_f, oyhi_f, scal)
        return fb_out, av[:, 0]

    return prepare, chunk
