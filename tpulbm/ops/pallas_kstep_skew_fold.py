"""Lane-folded skewed K-step kernel (round-5 verdict item 2).

The structural attempt at the wide-grid residual: evolve (ny, nx) as the
folded (ny*F, W = nx/F) grid (ops/fold.py — a free reshape), so full folded
rows fit the ratio-1.0 1-D skew window budget and the realignment rolls ride
the same single-contiguous-window build Mosaic fuses at <= 1536 wide
(docs/measurements/round4.md pins the 2-D tiled build's exposed rolls +
window ratio as the 13% tax this routes around).

Folded-space schedule (generalizes ops/pallas_kstep_skew.py, which this
kernel reproduces exactly at F=1):

- y-shifts are stride-F sublane rolls; the parallelogram slides ``sl = 2F-1``
  folded rows per step (the max dependence distance, so the valid region
  stays self-supplying at the top exactly like the F=1 skew's slide of 1).
- each block hands the next one a ``4F-2``-row slab per (state, channel)
  (= sl + 2F-1, the bottom reach incl. the wrap-lane patches; 2 rows at F=1).
- the x-wrap lane of each CX-shifted channel re-aims with a strip carry:
  one contiguous (BY+F, 1) sub-column of the PRE-roll window edge column
  supplies both sources (row -1 for interior strips, +/-(F-1) on the torus
  boundary strips), selected by a static per-step row mask — no extra
  full-plane ops (window_step.x_wrap_patch's concat family).
- the accelerated row is the F contiguous folded rows of global row ny-2.
- per-step |u| sums keep folded rows [E, HF - E), E = K*sl, via one masked
  sum per block (thresholds are affine in the program id); the seam band
  [-E, E) — block 0's missing-predecessor contamination, which at F > 1
  spans several blocks — is recomputed CLEAN by the fix kernel below and
  supplies the complementary constant-width sums.

The fix runs in UNFOLDED space: folded rows [-E, E) are exactly unfolded
rows [-m, m), m = E/F = 8(2F-1)/F (integer for F | 8), so the band kernel
is the plain x-tiled classic recompute of ops/pallas_kstep_skew.
make_skew_fix_tiled (r4), just with a parameterized band height — no folded
semantics needed, and the folded<->unfolded band reshape is free.

``make_fold_runner`` wires chunk + fix + splice into a single-device
(f, obst) -> (f', av) runner (donor-aliased scan ping-pong like
dist/runner._make_skew_runner) for the measured A/B at 2048^2 (F=2) and
4096^2 (F=4); 8192^2 cannot fold within the hardware-probed 61440 window
budget (F=8's 30-row slab exceeds any admissible BY).

Reference parity: same fused accelerate+propagate+collide+av semantics
(d2q9-bgk.c:442-704); the fold changes only the layout, never a cell's
arithmetic — state output is bitwise the jnp oracle's under the fold
(tests/test_pallas_fold.py).
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

FOLD_K = 8


def slide(F: int) -> int:
    return 2 * F - 1


def slab_rows(F: int) -> int:
    return 4 * F - 2


def window_pad(F: int) -> int:
    return -(-slab_rows(F) // 8) * 8


_BLOCK_BUDGET = 61440  # same hardware-probed envelope as pallas_kstep_skew


def pick_by(hf: int, w: int, F: int) -> Optional[int]:
    """Largest admissible block height: 8-multiple AND F-multiple divisor of
    the folded height with a budget window, >= the slab height."""
    best = None
    lo = -(-max(8, slab_rows(F)) // 8) * 8
    for by in range(lo, min(hf // 2, 512) + 1, 8):
        if by % F == 0 and hf % by == 0 and (by + window_pad(F)) * w <= _BLOCK_BUDGET:
            best = by
    return best


def pick_out_slots(by: int, w: int, F: int, slots: int = 2) -> int:
    """Output-staging slots for a window of (by + pad) x w: windows past the
    classic 61,440 budget (slim-admitted, e.g. F=8's (32+32)x1024 at 8192²)
    single-stage the output so the scratch fits scoped VMEM (the 2-slot
    vstage overflows the 16 MB limit by 384 KB there — committed FAIL,
    docs/measurements/round5.md). The reclaim wait moves one block later
    and has the whole k-step compute to drain."""
    return 1 if (by + window_pad(F)) * w > _BLOCK_BUDGET else slots


def supported(ny: int, nx: int, F: int, k: int = FOLD_K) -> bool:
    if k != FOLD_K or F not in (1, 2, 4, 8) or nx % F:
        return False
    w = nx // F
    hf = ny * F
    if w % 128 or (8 * slide(F)) % F:
        return False
    by = pick_by(hf, w, F)
    return (
        by is not None
        and hf // by >= 2
        and ny >= 2 * fix_band_side(F, k)  # the fix band must fit the torus
        and hf >= 2 * k * slide(F) + by  # main keeps some rows every step
    )


def _kernel(
    f_ref,        # (9, HF, W) HBM folded pre-chunk state (local shard)
    obst_ref,     # (HF, W) HBM float32 mask (1.0 = blocked)
    scal_ref,     # (1, 2) SMEM int32: [folded accel base row, shard's
                  # global folded row offset (0 on one device)]
    out_ref,      # (9, HF, W) HBM; rows [HF-E, HF) NOT written (fix splice)
    av_ref,       # (K, 1) SMEM per-step MAIN |u| sums (rows [E, HF-E) only)
    fbuf, obuf, vstage, slab,
    sem_f, sem_o, sem_out, acc,
    *,
    F: int,
    by: int,
    w: int,
    hf: int,
    k_steps: int,
    omega: float,
    w1: float,
    w2: float,
    slots: int = 2,
    out_slots: Optional[int] = None,
    collide_split: int = 1,
    hf_global: Optional[int] = None,
):
    # hf = LOCAL shard rows (out size, clip bounds, the seam keep-mask);
    # hf_global = the folded torus height for the accel-row wrap arithmetic
    # (equal on one device)
    if hf_global is None:
        hf_global = hf
    if out_slots is None:
        out_slots = slots
    k = k_steps
    sl = slide(F)
    sn = slab_rows(F)
    pad = window_pad(F)
    pad_o = k * sl                      # 8-aligned: 8*(2F-1)
    E = k * sl
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, slots)
    nslot = jax.lax.rem(i + 1, slots)
    # static 0 when single-staged: a traced rem(i, 1) index on a singleton
    # scratch dim defeats Mosaic's in-place staging (measured +1.8 MB scoped)
    vslot = 0 if out_slots == 1 else jax.lax.rem(i, out_slots)
    nvslot = 0 if out_slots == 1 else jax.lax.rem(i + 1, out_slots)
    zero = np.float32(0.0)
    w1f = np.float32(w1)
    w2f = np.float32(w2)
    pair_symmetric = window_step.PAIR_SYMMETRIC_DEFAULT
    nclip_o = -(-pad_o // by)           # blocks with clipped obstacle loads
    nclip_out = -(-E // by)             # blocks with clipped output ranges

    def in_copies(b, s):
        row0 = pl.multiple_of(b * by, 8)
        return [pltpu.make_async_copy(
            f_ref.at[:, pl.ds(row0, by), :],
            fbuf.at[s, :, pl.ds(pad, by), :],
            sem_f.at[s],
        )]

    def obst_copies(b):
        # (predicate, src_lo, size, dst_lo); clipped loads leave garbage in
        # the low rows — those map to folded rows < 0, whose outputs are fix
        # territory (never summed, overwritten by the splice)
        cases = []
        for bb in range(nclip_o):
            cases.append((b == bb, 0, (bb + 1) * by, pad_o - bb * by))
        cases.append((b >= nclip_o, None, by + pad_o, 0))
        return cases

    def start_or_wait_obst(b, s, start):
        for pred, src_lo, sz, dst_lo in obst_copies(b):
            @pl.when(pred)
            def _(src_lo=src_lo, sz=sz, dst_lo=dst_lo):
                lo = 0 if src_lo == 0 else pl.multiple_of(b * by - pad_o, 8)
                cp = pltpu.make_async_copy(
                    obst_ref.at[pl.ds(lo, sz), :],
                    obuf.at[s, pl.ds(dst_lo, sz), :],
                    sem_o.at[s],
                )
                cp.start() if start else cp.wait()

    def start_dmas(b, s):
        for c in in_copies(b, s):
            c.start()
        start_or_wait_obst(b, s, True)

    def wait_dmas(b, s):
        for c in in_copies(b, s):
            c.wait()
        start_or_wait_obst(b, s, False)

    @pl.when(i == 0)
    def _():
        start_dmas(jnp.int32(0), 0)

    @pl.when(i + 1 < n)
    def _():
        start_dmas(i + 1, nslot)

    def out_copy(b, s):
        # block b owns output rows [b*by - E, (b+1)*by - E); rows < 0 are
        # wrapped seam garbage the fix overwrites — clip them (offsets stay
        # 8-aligned: by, E are 8-multiples)
        cases = []
        for bb in range(nclip_out):
            size = (bb + 1) * by - E
            if size <= 0:
                continue
            cases.append((b == bb, pltpu.make_async_copy(
                vstage.at[s, :, pl.ds(E - bb * by, size), :],
                out_ref.at[:, pl.ds(0, size), :],
                sem_out.at[s],
            )))
        cases.append((b >= nclip_out, pltpu.make_async_copy(
            vstage.at[s],
            out_ref.at[:, pl.ds(pl.multiple_of(
                jnp.clip(b * by - E, 0, hf - by), 8), by), :],
            sem_out.at[s],
        )))
        return cases

    def out_start(b, s):
        for pred, c in out_copy(b, s):
            @pl.when(pred)
            def _(c=c):
                c.start()

    def out_wait(b, s):
        for pred, c in out_copy(b, s):
            @pl.when(pred)
            def _(c=c):
                c.wait()

    @pl.when(i >= out_slots)
    def _():
        out_wait(i - out_slots, vslot)

    a_base = scal_ref[0, 0]  # folded accel band base row (accel_row * F)
    shard_off = scal_ref[0, 1]

    wait_dmas(i, slot)
    wv = [fbuf[slot, c, pad : pad + by, :] for c in range(NSPEEDS)]
    o_win = obuf[slot]                       # (by+pad_o, w), rolled sl/step
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (by, w), 0)
    row_col = jax.lax.broadcasted_iota(jnp.int32, (by, 1), 0)
    junk = jnp.zeros((pad - sn, w), jnp.float32)
    base0 = i * by                           # LOCAL folded row of wv[0] @ s=0
    gbase0 = shard_off + base0               # global (accel wrap arithmetic;
    # shard_off % F == 0 is a ring-runner invariant so the strip masks'
    # base0-drops-out-mod-F argument holds globally too

    for s in range(k):
        new_base = base0 - (s + 1) * sl
        subs = [slab[pl.ds((s * NSPEEDS + c) * sn, sn), :]
                for c in range(NSPEEDS)]
        # inflow acceleration on the F folded rows of global row ny-2,
        # at the CURRENT state's valid coordinates (base0 - s*sl)
        free_v = o_win[pad_o : pad_o + by, :] == zero
        a_off = jax.lax.rem(
            a_base - (gbase0 - s * sl) + 2 * hf_global, hf_global)
        sel_free = (
            jax.lax.rem(row_ids - a_off + 2 * hf_global, hf_global) < F
        ) & free_v
        wv = window_step.accel_update(wv, sel_free, w1f, w2f)
        # hand our top slab rows (post-accel, state s) to the next block
        for c in range(NSPEEDS):
            slab[pl.ds((s * NSPEEDS + c) * sn, sn), :] = wv[c][by - sn :, :]
        # static strip masks of the TARGET rows: strip(vr) = (vr+s+1) mod F
        # (base0 = i*by with by % F == 0, so base0 drops out mod F)
        if F > 1:
            sidx = jax.lax.rem(row_col + (s + 1), F)
            mask_s0 = sidx == 0
            mask_sF1 = sidx == F - 1
        t = []
        for c in range(NSPEEDS):
            v_full = jnp.concatenate([junk, subs[c], wv[c]], axis=0)
            r = (sl + F * CY[c]) % (by + pad)
            precol = None
            if F > 1 and CX[c] == 1:
                precol = v_full[pad - 1 - r : pad - 1 - r + by + F, w - 1 : w]
            elif F > 1 and CX[c] == -1:
                precol = v_full[pad - F + 1 - r : pad - F + 1 - r + by + F, 0:1]
            if r:
                v = pltpu.roll(v_full, r, 0)[pad : pad + by, :]
            else:
                v = v_full[pad : pad + by, :]
            if CX[c] != 0:
                v_pre = v
                v = pltpu.roll(v, CX[c] % w, 1)
                if F > 1:
                    # strip-carry wrap re-aim (see module docstring)
                    if CX[c] == 1:
                        src = jnp.where(mask_s0, precol[F:], precol[:by])
                        v = window_step._patch_col(v, src, 0)
                    else:
                        src = jnp.where(mask_sF1, precol[:by], precol[F:])
                        v = window_step._patch_col(v, src, w - 1)
            t.append(v)
        o_win = pltpu.roll(o_win, sl, 0)
        blocked_c = o_win[pad_o : pad_o + by, :] != zero
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
            wv = [jnp.concatenate([o[c] for o in outs], axis=0)
                  for c in range(NSPEEDS)]
            speed = jnp.concatenate(speeds, axis=0)
        else:
            wv, speed = physics.collide(t, blocked_c, omega, pair_symmetric)
        # masked sum: keep global folded rows [E, HF - E); the fix kernel
        # recomputes [-E, E) clean and supplies the complement
        keep = (row_col >= E - new_base) & (row_col < hf - E - new_base)
        part = jnp.sum(jnp.where(keep, speed, zero), dtype=jnp.float32)

        @pl.when(i == 0)
        def _(s=s, part=part):
            acc[s, 0] = part

        @pl.when(i > 0)
        def _(s=s, part=part):
            acc[s, 0] += part

    for c in range(NSPEEDS):
        vstage[vslot, c] = wv[c]
    out_start(i, vslot)

    @pl.when(i == n - 1)
    def _():
        if out_slots >= 2 and n >= 2:
            out_wait(i - 1, nvslot)
        out_wait(i, vslot)
        for s in range(k):
            av_ref[s, 0] = acc[s, 0]


def make_fold(
    ny: int,
    nx: int,
    F: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    k_steps: int = FOLD_K,
    interpret: Optional[bool] = None,
    by: Optional[int] = None,
    slots: int = 2,
    out_slots: Optional[int] = None,
    alias_donor: bool = False,
    collide_split: int = 1,
    hf_global: Optional[int] = None,
):
    """Folded skewed K-step chunk over the FOLDED (9, ny*F, nx/F) state:
    ``chunk(g, obst_f, scal[, donor]) -> (g', av_main[k])``. Output rows
    [-E, E) (E = K*(2F-1)) are seam garbage/unwritten; the caller splices
    the fix kernel's values and adds its complementary av sums (see
    make_fold_runner). ``scal`` is int32 (1, 2): [accel_row * F, shard's
    global folded row offset — 0 on one device]. For a ring, ``ny`` is the
    LOCAL shard rows and ``hf_global`` the folded torus height (the
    shard offset must be an F-multiple; dist/runner._make_fold_ring)."""
    w = nx // F
    hf = ny * F
    if by is None:
        by = pick_by(hf, w, F)
    elif by % 8 or by % F or by < slab_rows(F):
        # an explicit by must satisfy the same admissibility pick_by
        # enforces (supported() only checks pick_by's own choice); the
        # VMEM budget is deliberately NOT enforced here so probe scripts
        # can take compile-FAIL measurements past it (ab_fold --fold-by)
        raise ValueError(
            f"fold kernel: explicit by={by} must be an 8- and F-multiple "
            f">= the slab height {slab_rows(F)}"
        )
    if by is None or not supported(ny, nx, F, k_steps) or hf % by:
        raise ValueError(
            f"fold kernel unsupported for ({ny}, {nx}) F={F}, K={k_steps}"
        )
    if interpret is None:
        interpret = window_step.default_interpret()
    k = k_steps
    pad = window_pad(F)
    pad_o = k * slide(F)
    if out_slots is None:
        out_slots = pick_out_slots(by, w, F, slots)

    kernel = functools.partial(
        _kernel, F=F, by=by, w=w, hf=hf, k_steps=k,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
        slots=slots, out_slots=out_slots, collide_split=collide_split,
        hf_global=hf_global,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec, any_spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
    kernel_fn = kernel
    io_aliases = {}
    if alias_donor:
        in_specs = [any_spec] + in_specs

        def kernel_fn(donor_ref, *rest):
            del donor_ref  # storage only; never read
            return kernel(*rest)

        io_aliases = {0: 0}

    call = pl.pallas_call(
        kernel_fn,
        grid=(hf // by,),
        in_specs=in_specs,
        input_output_aliases=io_aliases,
        out_specs=[any_spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, hf, w), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, NSPEEDS, by + pad, w), jnp.float32),
            pltpu.VMEM((slots, by + pad_o, w), jnp.float32),
            pltpu.VMEM((out_slots, NSPEEDS, by, w), jnp.float32),
            pltpu.VMEM((k * NSPEEDS * slab_rows(F), w), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((out_slots,)),
            pltpu.SMEM((k, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=85 * hf * w * k,
            bytes_accessed=2 * NSPEEDS * hf * w * 4,
            transcendentals=2 * hf * w * k,
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
        g_out, av = outs
        return g_out, av[:, 0]

    return prepare, chunk


def fix_band_half(F: int) -> int:
    """m: unfolded half-height of the seam band — folded rows [-E, E) are
    exactly unfolded rows [-m, m), m = E/F (integer for F | 8)."""
    return 8 * slide(F) // F


def fix_band_side(F: int, k: int = FOLD_K) -> int:
    """Per-side band rows: m + K rounded up to a 4-multiple so the band
    height 2*bh is 8-aligned — Mosaic rejects DMA slice shapes off the
    (8, 128) tiling (the F=4 band's natural 2*(14+8) = 44 rows failed to
    compile on hardware, round-5; F=2's 40 passed only by luck)."""
    return -(-(fix_band_half(F) + k) // 4) * 4


def fix_vals_rows(F: int, k: int = FOLD_K) -> int:
    """8-aligned row count of the fix kernel's vals output (covers the
    2m owned rows; 2m itself is not an 8-multiple for F in {4, 8})."""
    return -(-2 * fix_band_half(F) // 8) * 8


_FIX_MX = 128  # lane margin per tile side (garbage moves <= K lanes)


def _fix_kernel(
    band_ref,   # (9, HB, nx + 2*_FIX_MX) HBM: x-extended pre-chunk band,
                # unfolded global rows [-(m+K), m+K) (torus-contiguous)
    oband_ref,  # (HB, nx + 2*_FIX_MX) HBM float32
    scal_ref,   # (1, 2) SMEM: [global accel row, (ny - m - K) mod ny]
    vals_ref,   # (9, 2m, nx) HBM out: state-K values of rows [-m, m)
    av_ref,     # (K, 1) SMEM out: per-step |u| sums of rows [-m, m)
    fbuf, obuf, vstage,
    sem_f, sem_o, sem_out,
    acc,
    *,
    m: int,
    bh: int,
    vrows: int,
    bx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    w1: float,
    w2: float,
):
    """x-tiled classic recompute of the fold seam (the plain-semantics twin
    of pallas_kstep_skew._fix_tiled_kernel): band rows [-bh, bh) with
    bh >= m+K (padded to keep DMA shapes 8-aligned, fix_band_side), and a
    CONSTANT owned-row window [bh-m, bh+m) — the folded main kernel sums
    global folded rows [E, HF-E) at EVERY step, so the complement is the
    same unfolded rows [-m, m) at every step (owned_step_dy=0), unlike the
    F=1 skew whose coverage slides. vals stages the 8-aligned row window
    [K, K+vrows) — the clean region after K steps of edge roll-in —
    which contains [-m, m); the caller slices the exact 2m rows."""
    k = k_steps
    i = pl.program_id(0)
    n = pl.num_programs(0)
    hband = 2 * bh
    bxw = bx + 2 * _FIX_MX
    zero = np.float32(0.0)

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

    # in-window roll garbage moves 1 row / 1 lane per step from the band and
    # margin edges; the owned cells sit >= K rows / _FIX_MX >> K lanes
    # inside, so K steps leave them clean
    w, parts = window_step.fused_window_steps(
        w, blocked, accel_sel, k, omega, w1, w2,
        owned=(slice(bh - m, bh + m), slice(_FIX_MX, _FIX_MX + bx)),
    )
    for s, part in enumerate(parts):
        acc[s, 0] = acc[s, 0] + part
    for c in range(NSPEEDS):
        vstage[c] = w[c][k : k + vrows, _FIX_MX : _FIX_MX + bx]
    cp_out = pltpu.make_async_copy(
        vstage, vals_ref.at[:, :, pl.ds(x0, bx)], sem_out)
    cp_out.start()
    cp_out.wait()

    @pl.when(i == n - 1)
    def _():
        for s in range(k):
            av_ref[s, 0] = acc[s, 0]


def make_fold_fix(
    ny: int,
    nx: int,
    F: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    k_steps: int = FOLD_K,
    interpret: Optional[bool] = None,
    bx: Optional[int] = None,
):
    """Seam-band fix paired with the folded main kernel:
    ``chunk_fix(band, oband_f, scal) -> (vals (9, vrows, nx), av[k])`` with
    ``band`` the UNFOLDED pre-chunk rows [-bh, bh), bh = fix_band_side(F)
    (the caller reshapes the folded seam slab — free). The caller slices
    the exact [-m, m) rows out of vals (offset bh - m - K). The band is
    x-extended by 128 torus wrap columns per side inside this wrapper, as
    in make_skew_fix_tiled."""
    from tpulbm.ops.pallas_kstep_skew import pick_fix_bx

    if interpret is None:
        interpret = window_step.default_interpret()
    k = k_steps
    m = fix_band_half(F)
    bh = fix_band_side(F, k)
    vrows = fix_vals_rows(F, k)
    hband = 2 * bh
    if bx is None:
        bx = pick_fix_bx(nx)
    if nx % bx or bx % 128:
        raise ValueError(f"fix tile width {bx} must be a 128-multiple "
                         f"divisor of nx={nx}")
    kernel = functools.partial(
        _fix_kernel, m=m, bh=bh, vrows=vrows, bx=bx, k_steps=k, ny_global=ny,
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    call = pl.pallas_call(
        kernel,
        grid=(nx // bx,),
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
            jax.ShapeDtypeStruct((NSPEEDS, vrows, nx), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NSPEEDS, hband, bx + 2 * _FIX_MX), jnp.float32),
            pltpu.VMEM((hband, bx + 2 * _FIX_MX), jnp.float32),
            pltpu.VMEM((NSPEEDS, vrows, bx), jnp.float32),
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


def pick_fold(ny: int, nx: int, k: int = FOLD_K) -> Optional[int]:
    """Smallest F > 1 folding (ny, nx) to a width in the measured fused-roll
    regime (w <= 1536, where the 1-D skew's realignment rolls fuse — the
    residual the fold chases; docs/measurements/round4.md)."""
    for F in (2, 4, 8):
        if nx % F == 0 and nx // F <= 1536 and supported(ny, nx, F, k):
            return F
    return None


def pick_fold_ring(ny: int, nx: int, n_dev: int,
                   k: int = FOLD_K) -> Optional[int]:
    """Ring variant: each shard's LOCAL folded shape must ride the fold
    kernel (incl. its own fix band — the seam machinery doubles as the
    shard-boundary machinery, one band per shard). n_dev == 1 reduces to
    pick_fold; delegating keeps one F-selection policy."""
    if ny % n_dev:
        return None
    return pick_fold(ny // n_dev, nx, k)


def make_fold_runner(
    params,
    n_steps: int,
    F: Optional[int] = None,
    by: Optional[int] = None,
    out_slots: Optional[int] = None,
    collide_split: int = 1,
    interpret: Optional[bool] = None,
    alias_donor: bool = True,
):
    """Single-device runner over the folded kernel: unfolded
    ``(f, obstacles) -> (f', av[n_steps])``, donor-aliased scan ping-pong
    like dist/runner._make_skew_runner. Per K-step chunk: fold (a reshape),
    main folded kernel + unfolded seam fix, splice the fix values into
    folded rows [-E, E), sum the two av series. A sub-K remainder runs the
    folded jnp oracle (ops/fold.lbm_step_folded) — bitwise, paid once."""
    from tpulbm.ops import fold as fold_mod

    ny, nx = params.ny, params.nx
    if F is None:
        F = pick_fold(ny, nx)
    if F is None or not supported(ny, nx, F):
        raise ValueError(f"fold runner unsupported for ({ny}, {nx}) F={F}")
    k = FOLD_K
    w = nx // F
    hf = ny * F
    E = k * slide(F)
    m = fix_band_half(F)
    bh = fix_band_side(F, k)   # padded unfolded band rows per seam side
    ve = bh - m - k            # [-m, m) offset inside the vals row window
    n_outer, rem = divmod(n_steps, k)
    mk = functools.partial(
        make_fold, ny, nx, F, params.omega, params.accel_w1,
        params.accel_w2, k, interpret=interpret, by=by,
        out_slots=out_slots, collide_split=collide_split,
    )
    if alias_donor and n_outer >= 2:
        _, chunk_k = mk(alias_donor=True)
        _, chunk_plain = mk()
    else:
        alias_donor = False
        _, chunk_plain = mk()
        chunk_k = None
    chunk_fix = make_fold_fix(
        ny, nx, F, params.omega, params.accel_w1, params.accel_w2, k,
        interpret=interpret)
    free_inv = jnp.float32(params.free_cells_inv)
    scal = jnp.asarray([[params.accel_row * F, 0]], dtype=jnp.int32)
    scal_fix = jnp.asarray(
        [[params.accel_row, (ny - bh) % ny]], dtype=jnp.int32)

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        g = fold_mod.fold(f, F)
        og_bool = fold_mod.fold(obstacles, F)
        og = og_bool.astype(jnp.float32)
        obst_f = obstacles.astype(jnp.float32)
        ob_band = jnp.concatenate([obst_f[ny - bh :], obst_f[:bh]], axis=0)

        def do_chunk(gc, donor):
            if donor is None:
                g2, av = chunk_plain(gc, og, scal)
            else:
                g2, av = chunk_k(gc, og, scal, donor)
            if "foldfix" in window_step.COST_SKIP:
                # cost instrumentation only: physics WRONG (seam unspliced)
                return g2, av
            band = jnp.concatenate(
                [gc[:, hf - bh * F :, :], gc[:, : bh * F, :]], axis=1
            ).reshape(NSPEEDS, 2 * bh, nx)
            vals, av_f = chunk_fix(band, ob_band, scal_fix)
            vals_g = vals[:, ve : ve + 2 * m, :].reshape(NSPEEDS, 2 * E, w)
            g2 = jax.lax.dynamic_update_slice(g2, vals_g[:, E:, :], (0, 0, 0))
            g2 = jax.lax.dynamic_update_slice(
                g2, vals_g[:, :E, :], (0, hf - E, 0))
            return g2, av + av_f

        g_out = g
        if alias_donor:
            n_pairs, odd = divmod(n_outer, 2)
            av_head = None
            if odd:
                g_out, av0 = do_chunk(g, None)
                av_head = av0 * free_inv

            def body(carry, _):
                gc, scratch = carry
                t1, av1 = do_chunk(gc, scratch)
                t2, av2 = do_chunk(t1, gc)
                return (t2, t1), jnp.concatenate([av1, av2]) * free_inv

            (g_out, _), avs = jax.lax.scan(
                body, (g_out, jnp.zeros_like(g)), None, length=n_pairs)
            av = avs.reshape(-1)
            if av_head is not None:
                av = jnp.concatenate([av_head, av])
        else:
            def body(gc, _):
                g2, av_c = do_chunk(gc, None)
                return g2, av_c * free_inv

            g_out, avs = jax.lax.scan(body, g_out, None, length=n_outer)
            av = avs.reshape(-1)
        if rem:
            # remainder keeps the CHUNKS' equilibrium formulation (the
            # kernel remainder convention of every other tier)
            ps = window_step.PAIR_SYMMETRIC_DEFAULT

            def rbody(gc, _):
                g2, av1 = fold_mod.lbm_step_folded(
                    gc, og_bool, params, F, pair_symmetric=ps)
                return g2, av1

            g_out, av_r = jax.lax.scan(rbody, g_out, None, length=rem)
            av = jnp.concatenate([av, av_r]) if n_outer else av_r
        return fold_mod.unfold(g_out, F), av

    return runner
