"""K-step kernel with IN-KERNEL RDMA halo exchange (multi-chip path).

The ppermute-based runner exchanges halo slabs with an XLA collective between
kernel calls; each exchange is a separate launch and a scheduling barrier.
This variant performs the exchange INSIDE the kernel with
``make_async_remote_copy`` over ICI, overlapped with interior compute — the
TPU-native equivalent of the reference's persistent-request pipeline
(``MPI_Startall`` -> interior sweep -> ``MPI_Waitall`` -> boundary rows,
d2q9-bgk.c:326-366), including its block ordering:

- at the first grid program, each device RDMAs its top/bottom 8-row slabs of
  the CURRENT state (straight from HBM) into its ring neighbours' VMEM
  landing buffers;
- the grid is reordered to process interior row blocks FIRST and the two
  edge blocks LAST, so the transfers hide behind interior compute;
- the edge-block programs wait on their receive semaphores before
  assembling the window.

Synchronization: each call opens with a neighbour entry barrier
(``get_barrier_semaphore`` matched to ``collective_id`` — Mosaic requires
it for remote DMA, and it guarantees the receiver's landing allocation is
live before the first remote write). Across iterations the landing buffers
and semaphores are double-buffered by outer-iteration parity: a device can
run at most one outer iteration ahead of its neighbours (its own edge
blocks wait on slabs the neighbour sends at the head of the same
iteration), so parity slots never collide.

Requires K == 8 (the slab height must be the 8-row aligned margin) and at
least 2 devices; the runner falls back to the ppermute path otherwise.
Validated bitwise against the jnp oracle on a virtual CPU mesh in interpret
mode; real-ICI performance needs multi-chip hardware.
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
from tpulbm.ops.pallas_kstep import _MARGIN, pick_block_rows
from tpulbm.ops import window_step
from tpulbm.ops.window_step import fused_window_steps

MAX_K = _MARGIN


def supported(h: int, nx: int, k: int, n_dev: int) -> bool:
    return (
        1 <= k <= _MARGIN  # RDMA slabs are always the aligned 8-row margin;
                           # k < 8 uses the needed sub-slab (value slicing)
        and n_dev >= 2
        and nx % 128 == 0
        and h >= _MARGIN
        and h % _MARGIN == 0
        and pick_block_rows(h, nx) is not None
    )


def _kernel(
    f_ref,        # (9, H, nx) HBM
    obst_ref,     # (H, nx) HBM float32 mask
    olo_ref,      # (K, nx) VMEM: obstacle mask below the shard (static)
    ohi_ref,      # (K, nx) VMEM: obstacle mask above the shard (static)
    scal_ref,     # (1, 3) SMEM int32: [accel row, shard offset, parity]
    out_ref,      # (9, BY, nx) VMEM block (reordered)
    av_ref,       # (K, 1) SMEM
    fbuf,         # (2, 9, BY+16, nx) VMEM window slots
    obuf,         # (2, BY+16, nx) VMEM
    land_lo,      # (2, 9, 8, nx) VMEM RDMA landing, parity-slotted
    land_hi,      # (2, 9, 8, nx) VMEM
    sem_f, sem_o,            # window DMA semaphores (2,)
    send_fwd, recv_fwd,      # RDMA semaphores, (2,) parity-slotted
    send_bwd, recv_bwd,
    acc,          # (K, 1) SMEM
    *,
    by: int,
    nx: int,
    h: int,
    k_steps: int,
    ny_global: int,
    axis_name: str,
    omega: float,
    w1: float,
    w2: float,
    barrier: bool,
):
    m = _MARGIN
    win = by + 2 * m
    p = pl.program_id(0)
    n = pl.num_programs(0)
    n_static = h // by
    parity = scal_ref[0, 2]

    # Reordered schedule: interior blocks first, edge blocks (0, n-1) last.
    def block_of(q):
        if n_static <= 2:
            return q
        return jnp.where(q < n - 2, q + 1, jnp.where(q == n - 2, 0, n - 1))

    i = block_of(p)
    slot = jax.lax.rem(p, 2)
    nslot = jax.lax.rem(p + 1, 2)

    # -- RDMA of edge slabs to ring neighbours (program 0) ------------------
    my = jax.lax.axis_index(axis_name)
    ndev = jax.lax.axis_size(axis_name)
    nxt = jax.lax.rem(my + 1, ndev)
    prv = jax.lax.rem(my - 1 + ndev, ndev)

    def rdma_fwd():
        # my last slab -> next device's landing_lo
        return pltpu.make_async_remote_copy(
            src_ref=f_ref.at[:, pl.ds(h - m, m), :],
            dst_ref=land_lo.at[parity],
            send_sem=send_fwd.at[parity],
            recv_sem=recv_fwd.at[parity],
            device_id=nxt,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def rdma_bwd():
        # my first slab -> previous device's landing_hi
        return pltpu.make_async_remote_copy(
            src_ref=f_ref.at[:, pl.ds(0, m), :],
            dst_ref=land_hi.at[parity],
            send_sem=send_bwd.at[parity],
            recv_sem=recv_bwd.at[parity],
            device_id=prv,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    @pl.when(p == 0)
    def _():
        if barrier:
            # Entry barrier with the ring neighbours (matched to
            # collective_id; required by Mosaic for remote DMA): guarantees
            # the receiver's kernel instance — and so its landing-buffer
            # allocation — is live before the first remote write lands.
            # Skipped in interpret mode (get_barrier_semaphore has no CPU
            # lowering; the interpreter serializes devices anyway).
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                bar, inc=1, device_id=nxt,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            pltpu.semaphore_signal(
                bar, inc=1, device_id=prv,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            pltpu.semaphore_wait(bar, 2)
        rdma_fwd().start()
        rdma_bwd().start()

    # -- window DMAs (same scheme as pallas_kstep, but indexed by block) ----
    def case_copies(b):
        first = b == 0
        last = b == n - 1
        cases = []
        if n_static == 1:
            cases.append((first & last, 0, by, m))
        else:
            cases.append((first, 0, by + m, m))
            if n_static > 2:
                cases.append(((b != 0) & (b != n - 1), b * by - m, win, 0))
            cases.append(((b != 0) & last, b * by - m, by + m, 0))
        return cases

    def make_pair(src_lo, src_sz, dst_lo, s):
        src_lo = pl.multiple_of(jnp.clip(src_lo, 0, h - src_sz), _MARGIN)
        fc = pltpu.make_async_copy(
            f_ref.at[:, pl.ds(src_lo, src_sz), :],
            fbuf.at[s, :, pl.ds(dst_lo, src_sz), :],
            sem_f.at[s],
        )
        oc = pltpu.make_async_copy(
            obst_ref.at[pl.ds(src_lo, src_sz), :],
            obuf.at[s, pl.ds(dst_lo, src_sz), :],
            sem_o.at[s],
        )
        return fc, oc

    def start_dmas(b, s):
        for pred, src_lo, src_sz, dst_lo in case_copies(b):
            @pl.when(pred)
            def _():
                fc, oc = make_pair(src_lo, src_sz, dst_lo, s)
                fc.start()
                oc.start()

    def wait_dmas(b, s):
        for pred, src_lo, src_sz, dst_lo in case_copies(b):
            @pl.when(pred)
            def _():
                fc, oc = make_pair(src_lo, src_sz, dst_lo, s)
                fc.wait()
                oc.wait()

    @pl.when(p == 0)
    def _():
        start_dmas(block_of(jnp.int32(0)), 0)

    @pl.when(p + 1 < n)
    def _():
        start_dmas(block_of(p + 1), nslot)

    wait_dmas(i, slot)

    # -- halo arrival: edge-block programs wait their RDMA ------------------
    # .wait() waits both the local send and the symmetric receive; every
    # parity semaphore is consumed exactly once per call.
    @pl.when(i == 0)
    def _():
        rdma_fwd().wait()  # my landing_lo arrived (and my fwd send done)

    @pl.when(i == n - 1)
    def _():
        rdma_bwd().wait()  # my landing_hi arrived (and my bwd send done)

    # -- window assembly ----------------------------------------------------
    zero = np.float32(0.0)
    is_first = i == 0
    is_last = i == n - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (win, nx), 0)

    def assemble(buf_plane, lo_plane, hi_plane):
        v = buf_plane
        lo_full = jnp.pad(lo_plane, ((m - k_steps, win - m), (0, 0)))
        hi_full = jnp.pad(hi_plane, ((by + m, m - k_steps), (0, 0)))
        v = jnp.where(is_first & (row_ids < m) & (row_ids >= m - k_steps),
                      lo_full, v)
        v = jnp.where(is_last & (row_ids >= by + m)
                      & (row_ids < by + m + k_steps), hi_full, v)
        return v

    # The RDMA slabs are always the full 8-row margin (aligned DMA); with
    # k_steps < 8 only the k rows adjacent to the shard edge are real halo —
    # value-level slicing (not a ref slice) keeps sublane alignment rules out
    # of the picture.
    w = [
        assemble(
            fbuf[slot, c],
            land_lo[parity, c][m - k_steps :, :],
            land_hi[parity, c][:k_steps, :],
        )
        for c in range(NSPEEDS)
    ]
    o = assemble(obuf[slot], olo_ref[:], ohi_ref[:])
    blocked = o != zero

    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    win_start = shard_off + i * by - m
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    w, parts = fused_window_steps(
        w, blocked, accel_sel, k_steps, omega, w1, w2,
        owned=(slice(m, m + by), slice(None)),
    )
    for s, part in enumerate(parts):
        @pl.when(p == 0)
        def _(s=s, part=part):
            acc[s, 0] = part

        @pl.when(p > 0)
        def _(s=s, part=part):
            acc[s, 0] += part

    for c in range(NSPEEDS):
        out_ref[c] = w[c][m : m + by, :]

    @pl.when(p == n - 1)
    def _():
        for s in range(k_steps):
            av_ref[s, 0] = acc[s, 0]


def make_kstep_rdma(
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    axis_name: str = "y",
    collective_id: int = 0,
    interpret: Optional[bool] = None,
):
    """Returns ``(prepare, chunk)`` like make_kstep, but ``chunk`` takes no
    f-halo slabs (exchanged in-kernel): ``chunk(f, aux, scal) -> (f', av)``
    with ``scal`` int32 (1, 3) = [accel row, shard offset, parity]."""
    by = pick_block_rows(h, nx)
    if by is None or not 1 <= k_steps <= _MARGIN or h % _MARGIN:
        raise ValueError(
            f"rdma kstep unsupported for local shape ({h}, {nx}), K={k_steps}"
        )
    if interpret is None:
        interpret = window_step.default_interpret()
    n_blocks = h // by
    n_static = n_blocks

    def block_index(q):
        if n_static <= 2:
            return q
        return jnp.where(q < n_blocks - 2, q + 1,
                         jnp.where(q == n_blocks - 2, 0, n_blocks - 1))

    kernel = functools.partial(
        _kernel, by=by, nx=nx, h=h, k_steps=k_steps, ny_global=ny_global,
        axis_name=axis_name, omega=float(omega), w1=float(accel_w1),
        w2=float(accel_w2), barrier=not interpret,
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # f
            pl.BlockSpec(memory_space=pl.ANY),   # obstacles
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obst halo lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obst halo hi
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=[
            pl.BlockSpec((NSPEEDS, by, nx), lambda i: (0, block_index(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, by + 2 * _MARGIN, nx), jnp.float32),
            pltpu.VMEM((2, by + 2 * _MARGIN, nx), jnp.float32),
            pltpu.VMEM((2, NSPEEDS, _MARGIN, nx), jnp.float32),  # land_lo
            pltpu.VMEM((2, NSPEEDS, _MARGIN, nx), jnp.float32),  # land_hi
            pltpu.SemaphoreType.DMA((2,)),  # sem_f
            pltpu.SemaphoreType.DMA((2,)),  # sem_o
            pltpu.SemaphoreType.DMA((2,)),  # send_fwd
            pltpu.SemaphoreType.DMA((2,)),  # recv_fwd
            pltpu.SemaphoreType.DMA((2,)),  # send_bwd
            pltpu.SemaphoreType.DMA((2,)),  # recv_bwd
            pltpu.SMEM((k_steps, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            collective_id=collective_id,
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

    def chunk(f, aux, scal):
        obst_f, olo_f, ohi_f = aux
        f_out, av = call(f, obst_f, olo_f, ohi_f, scal)
        return f_out, av[:, 0]

    return prepare, chunk
