"""Multi-device VMEM-resident kernel: the shard never touches HBM.

The single-device resident kernel (ops/pallas_resident.py) holds the whole
grid in VMEM across hundreds of fused steps. This is its multi-device
counterpart for 1-D row sharding: each device's (h, nx) shard ping-pongs
between two VMEM buffers while ONE kernel call advances ``n_outer * K``
timesteps; every K steps the 8-row edge slabs are RDMA'd to the ring
neighbours with ``make_async_remote_copy`` (ICI), overlapped with nothing to
hide — the transfer is tiny and the state never round-trips through HBM
(the K-step kernels pay ~2 HBM passes per K steps; here it is zero between
chunk boundaries). The x wrap is the real torus (shards are full-width);
y halos are the exchanged slabs.

Cross-iteration safety: landing buffers and semaphores are double-buffered
by outer-iteration parity, continued ACROSS kernel calls via a base-parity
scalar (the same argument as ops/pallas_kstep_rdma.py's cross-call safety —
a device can run at most one outer iteration ahead of its ring neighbours,
because its own edge rows wait on the slab the neighbour sends at the head
of the same iteration).

The reference analog is the persistent-request MPI pipeline
(d2q9-bgk.c:295-313,326-366) — but with the whole working set pinned
on-chip, something a 2016 Xeon cluster could only approximate with L2.
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
from tpulbm.ops import window_step
from tpulbm.ops.window_step import fused_window_steps

_MARGIN = 8   # RDMA slab height (sublane-aligned); bounds K at 8
MAX_K = _MARGIN
# VMEM cells cap per shard: two ping-pong copies + in/out refs + landing
# buffers + the (h+2K, nx) window temporaries of the fused steps. 48K cells
# keeps the total well under the ~16 MB budget (cf. pallas_resident's 100K
# with the same four-copies-plus-temps structure).
_MAX_CELLS = 48 * 1024


def supported(h: int, nx: int, k: int, n_dev: int) -> bool:
    return (
        1 <= k <= MAX_K
        and n_dev >= 2
        and nx % 128 == 0
        and h % _MARGIN == 0
        and h >= _MARGIN
        and h * nx <= _MAX_CELLS
    )


def _kernel(
    f_ref,       # (9, h, nx) VMEM input: state at the chunk start
    obst_ref,    # (h, nx) VMEM f32 mask
    olo_ref,     # (K, nx) VMEM: obstacle mask below the shard (static)
    ohi_ref,     # (K, nx) VMEM: obstacle mask above the shard (static)
    scal_ref,    # (1, 3) SMEM int32: [accel row, shard offset, base parity]
    out_ref,     # (9, h, nx) VMEM output: state after n_outer*K steps
    av_ref,      # (n_outer*K, 1) SMEM: per-step |u| sums over the shard
    buf,         # (2, 9, h, nx) VMEM ping-pong state
    land_lo,     # (2, 9, 8, nx) VMEM RDMA landing, parity-slotted
    land_hi,     # (2, 9, 8, nx) VMEM
    send_fwd, recv_fwd,  # RDMA semaphores, (2,) parity-slotted
    send_bwd, recv_bwd,
    *,
    h: int,
    nx: int,
    k_steps: int,
    ny_global: int,
    axis_name: str,
    omega: float,
    w1: float,
    w2: float,
    barrier: bool,
):
    m = _MARGIN
    t = pl.program_id(0)
    n_outer = pl.num_programs(0)
    parity = jax.lax.rem(t + scal_ref[0, 2], 2)
    p = jax.lax.rem(t, 2)       # ping-pong slot holding state(t) for t > 0
    q = jax.lax.rem(t + 1, 2)   # slot receiving state(t+1)

    my = jax.lax.axis_index(axis_name)
    ndev = jax.lax.axis_size(axis_name)
    nxt = jax.lax.rem(my + 1, ndev)
    prv = jax.lax.rem(my - 1 + ndev, ndev)

    # -- RDMA the 8-row edge slabs of state(t) to the ring neighbours -------
    # The source ref differs on the first iteration (input ref vs ping
    # buffer), so both variants exist statically under predicates.
    def rdma(src_slab, land, ssem, rsem, dev):
        return pltpu.make_async_remote_copy(
            src_ref=src_slab,
            dst_ref=land.at[parity],
            send_sem=ssem.at[parity],
            recv_sem=rsem.at[parity],
            device_id=dev,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def starts(src):
        # my last slab -> next device's landing_lo; first -> previous's hi
        rdma(src.at[:, pl.ds(h - m, m), :], land_lo, send_fwd, recv_fwd,
             nxt).start()
        rdma(src.at[:, pl.ds(0, m), :], land_hi, send_bwd, recv_bwd,
             prv).start()

    def waits(src):
        rdma(src.at[:, pl.ds(h - m, m), :], land_lo, send_fwd, recv_fwd,
             nxt).wait()
        rdma(src.at[:, pl.ds(0, m), :], land_hi, send_bwd, recv_bwd,
             prv).wait()

    # Wait for this iteration's slabs (and our own sends) before assembly;
    # consuming both parity semaphores exactly once per iteration keeps the
    # double-buffer invariant.
    @pl.when(t == 0)
    def _():
        if barrier:
            # Entry barrier with the ring neighbours (matched to
            # collective_id; required by Mosaic for remote DMA): the
            # receiver's landing allocation must be live before the first
            # remote write lands. Once per kernel call (not per outer
            # iteration); skipped in interpret mode (no CPU lowering).
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
        starts(f_ref)
        waits(f_ref)

    @pl.when(t > 0)
    def _():
        starts(buf.at[p])
        waits(buf.at[p])

    # -- assemble the (h + 2K, nx) window ------------------------------------
    zero = np.float32(0.0)
    src = [jnp.where(t == 0, f_ref[c], buf[p, c]) for c in range(NSPEEDS)]
    k = k_steps
    w = [
        jnp.concatenate(
            [land_lo[parity, c][m - k :, :], src[c], land_hi[parity, c][:k, :]],
            axis=0,
        )
        for c in range(NSPEEDS)
    ]
    o = jnp.concatenate([olo_ref[:], obst_ref[:], ohi_ref[:]], axis=0)
    blocked = o != zero

    a_glob = scal_ref[0, 0]
    shard_off = scal_ref[0, 1]
    win_start = shard_off - k
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h + 2 * k, nx), 0)
    a_off = jax.lax.rem(a_glob - win_start + 2 * ny_global, ny_global)
    accel_sel = jax.lax.rem(row_ids - a_off + 2 * ny_global, ny_global) == 0

    w, parts = fused_window_steps(
        w, blocked, accel_sel, k, omega, w1, w2,
        owned=(slice(k, k + h), slice(None)),
    )
    for s, part in enumerate(parts):
        av_ref[t * k + s, 0] = part

    for c in range(NSPEEDS):
        buf[q, c] = w[c][k : k + h, :]

    @pl.when(t == n_outer - 1)
    def _():
        for c in range(NSPEEDS):
            out_ref[c] = buf[q, c]


def make_resident_rdma(
    h: int,
    nx: int,
    k_steps: int,
    n_outer: int,
    ny_global: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    axis_name: str = "y",
    collective_id: int = 0,
    interpret: Optional[bool] = None,
):
    """Returns ``(prepare, chunk)``: ``chunk(f, aux, scal) -> (f', av)``
    advancing ``n_outer * k_steps`` timesteps in ONE kernel call with the
    shard resident in VMEM throughout. ``scal`` is int32 (1, 3) =
    [global accel row, shard row offset, base parity]; ``aux`` comes from
    ``prepare(obstacles_f32, olo, ohi)`` (obstacle halos are loop-invariant
    and exchanged once outside)."""
    if not 1 <= k_steps <= MAX_K or h % _MARGIN or h * nx > _MAX_CELLS:
        raise ValueError(
            f"resident-rdma unsupported for shard ({h}, {nx}), K={k_steps}"
        )
    if interpret is None:
        interpret = window_step.default_interpret()

    kernel = functools.partial(
        _kernel, h=h, nx=nx, k_steps=k_steps, ny_global=ny_global,
        axis_name=axis_name, omega=float(omega), w1=float(accel_w1),
        w2=float(accel_w2), barrier=not interpret,
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_outer,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # f
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obst halo lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obst halo hi
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, h, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_outer * k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, h, nx), jnp.float32),
            pltpu.VMEM((2, NSPEEDS, _MARGIN, nx), jnp.float32),  # land_lo
            pltpu.VMEM((2, NSPEEDS, _MARGIN, nx), jnp.float32),  # land_hi
            pltpu.SemaphoreType.DMA((2,)),  # send_fwd
            pltpu.SemaphoreType.DMA((2,)),  # recv_fwd
            pltpu.SemaphoreType.DMA((2,)),  # send_bwd
            pltpu.SemaphoreType.DMA((2,)),  # recv_bwd
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            collective_id=collective_id,
        ),
        cost_estimate=pl.CostEstimate(
            flops=85 * h * nx * k_steps * n_outer,
            bytes_accessed=2 * NSPEEDS * h * nx * 4,
            transcendentals=2 * h * nx * k_steps * n_outer,
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
