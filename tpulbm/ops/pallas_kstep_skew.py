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
skips them). A small classic fix kernel (``make_skew_fix``) recomputes the
4K-row seam band from the chunk's input state and supplies the missing
values and per-step sums — the same caller contract as the classic kernel's
``exact_bottom_all`` mode (dist/runner.py), extended to 2K rows. Because a
block's output rows are ``[i*BY - K, (i+1)*BY - K)``, the shard's top K rows
are produced by the NEXT shard's fix pass and arrive via one K-row ppermute
(the skew turns the halo exchange itself into the output exchange; total
collective count per chunk is unchanged: one 2K-row slab up, one K-row slab
down).

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
_BLOCK_BUDGET = 48 * 1024  # (BY + 8) * nx elements per window plane


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
    scal_ref,     # (1, 2) SMEM int32: [global accel row, shard row offset]
    out_ref,      # (9, H, nx) HBM; rows [H-K, H) are NOT written (caller's
                  # seam splice covers them)
    av_ref,       # (K, 1) SMEM per-step |u| sums
    fbuf,         # (slots, 9, BY+8, nx) VMEM: valid rows at [8, 8+BY)
    obuf,         # (slots, BY+8, nx) VMEM: obstacle rows [i*BY-8, (i+1)*BY)
    vstage,       # (slots, 9, BY, nx) VMEM output staging
    slab,         # (K*9*2, nx) VMEM: two post-accel rows per (state, channel)
    sem_f, sem_o, sem_out,  # DMA semaphores, (slots,) each
    acc,          # (K, 1) SMEM accumulator
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
):
    k = k_steps
    i = pl.program_id(0)
    n = pl.num_programs(0)
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

    @pl.when(i == 0)
    def _():
        start_dmas(jnp.int32(0), 0)

    @pl.when(i + 1 < n)
    def _():
        start_dmas(i + 1, nslot)

    wait_dmas(i, slot)

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
    w = [fbuf[slot, c, _PAD : _PAD + by, :] for c in range(NSPEEDS)]
    o_win = obuf[slot]  # (BY+8, nx); rolled +1/step to track the slide
    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    base = shard_off + i * by  # global row of w[0] at state 0
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)
    junk6 = jnp.zeros((_PAD - 2, nx), jnp.float32)

    for s in range(k):
        # previous block's slab rows for state s (post-accel) — read BEFORE
        # this block overwrites the slot with its own
        subs = [slab[pl.ds((s * NSPEEDS + c) * 2, 2), :]
                for c in range(NSPEEDS)]
        # inflow acceleration on the valid rows (global [base-s, base-s+by))
        free_v = o_win[_PAD : _PAD + by, :] == zero
        a_off = jax.lax.rem(
            a_glob - (base - s) + 2 * ny_global, ny_global)
        sel_free = (row_ids == a_off) & free_v
        w = window_step.accel_update(w, sel_free, w1f, w2f)
        # hand our top-2 post-accel rows to the next block at this state
        for c in range(NSPEEDS):
            slab[pl.ds((s * NSPEEDS + c) * 2, 2), :] = w[c][by - 2 : by, :]
        # skewed pull: roll by 1 + CY keeps the valid region at rows
        # [8, 8+BY) while the represented global rows slide down by one
        t = []
        for c in range(NSPEEDS):
            v = jnp.concatenate([junk6, subs[c], w[c]], axis=0)
            r = (1 + CY[c]) % (by + _PAD)
            if r:
                v = pltpu.roll(v, r, 0)
            v = v[_PAD : _PAD + by, :]
            if CX[c] != 0:
                # lane roll after the row slice: by rows instead of by+8
                v = pltpu.roll(v, CX[c] % nx, 1)
            t.append(v)
        o_win = pltpu.roll(o_win, 1, 0)
        blocked_c = o_win[_PAD : _PAD + by, :] != zero
        if collide_split > 1:
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
            w, speed = physics.collide(t, blocked_c, omega, pair_symmetric)
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

    @pl.when(i == n - 1)
    def _():
        if n >= 2:
            out_wait(i - 1, nslot)
        out_wait(i, slot)
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
    """
    if by is None:
        by = pick_block_rows(h, nx)
    if by is None or not supported(h, nx, k_steps) or h % by:
        raise ValueError(
            f"skew kernel unsupported for local shape ({h}, {nx}), K={k_steps}"
        )
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n_blocks = h // by

    kernel = functools.partial(
        _kernel, by=by, nx=nx, h=h, k_steps=k_steps, ny_global=ny_global,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
        slots=slots, collide_split=collide_split,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # f
        pl.BlockSpec(memory_space=pl.ANY),      # obstacles
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
    ]
    kernel_fn = kernel
    io_aliases = {}
    if alias_donor:
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, NSPEEDS, by + _PAD, nx), jnp.float32),
            pltpu.VMEM((slots, by + _PAD, nx), jnp.float32),
            pltpu.VMEM((slots, NSPEEDS, by, nx), jnp.float32),
            pltpu.VMEM((k_steps * NSPEEDS * 2, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SMEM((k_steps, 1), jnp.float32),
        ],
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

    if alias_donor:
        def chunk(f, obst_f, scal, donor):
            f_out, av = call(donor, f, obst_f, scal)
            return f_out, av[:, 0]
    else:
        def chunk(f, obst_f, scal):
            f_out, av = call(f, obst_f, scal)
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
):
    """Classic 4K-row seam-band kernel paired with the skewed main kernel:
    ``chunk_fix(band, oband_f, scal) -> (vals (9, 2K, nx), av[k])``."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    k = k_steps
    kernel = functools.partial(
        _fix_kernel, nx=nx, k_steps=k, ny_global=ny_global,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
        collide_split=collide_split,
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
