"""VMEM-resident multi-step Pallas kernel for small grids.

For grids that fit on-chip (9 * ny * nx * 4 B * 2 buffers within VMEM), the
entire state ping-pongs between two VMEM scratch buffers while ONE kernel
call advances K timesteps — zero HBM traffic and zero dispatch overhead per
step. Periodicity needs no halo machinery at all: both axes wrap with lane /
sublane rotates over the full grid. This is the small-grid complement of the
HBM-streaming block kernel (tpulbm.ops.pallas_step); the reference has no
analog (its 128x128 working set also fit in L2, which is part of why its
serial-optimized build was memory-friendly — SURVEY.md section 6).

Single-device only (the grid is global here); the sharded runner keeps using
the block kernel.
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

# VMEM holds four f32 copies of the state at once (ping + pong scratch +
# input + output block): 4 * 9 * 4 B = 144 B/cell against the ~16 MB budget,
# i.e. ~116K cells; 100K leaves headroom. (A 256x512 deck at the previous
# 160K cap compiled to a 19 MB stack and OOM'd — caught by examples/.)
_MAX_CELLS = 100 * 1024
# The HBM-edge variant keeps in/out in HBM (one DMA per chunk boundary) so
# VMEM holds only the ping-pong pair + obstacles + the nine rolled planes
# of one step = ~112 B/cell — raising the resident ceiling to ~135K cells
# (e.g. 256x512; 384^2 = 147K measured 16.2-16.8 MB scoped VMEM in every
# formulation, over the 16 MB budget — it routes to the skew tier). Per-step
# traffic is still zero; the chunk-boundary DMAs amortize over k_chunk.
_MAX_CELLS_HBM = 135 * 1024


def supported(ny: int, nx: int) -> bool:
    return (
        nx % 128 == 0
        and ny % 8 == 0
        and ny * nx <= _MAX_CELLS
        and ny >= 8
    )


def supported_hbm(ny: int, nx: int) -> bool:
    return (
        nx % 128 == 0
        and ny % 8 == 0
        and _MAX_CELLS < ny * nx <= _MAX_CELLS_HBM
        and ny >= 8
    )


def _kernel(
    f_ref,       # (9, ny, nx) VMEM input: state at the chunk start
    obst_ref,    # (ny, nx) VMEM f32 mask (1.0 = blocked)
    out_ref,     # (9, ny, nx) VMEM output: state after K steps
    av_ref,      # (K, 1) SMEM output: per-step sum of |u| over free cells
    buf,         # (2, 9, ny, nx) VMEM scratch: ping-pong state
    *,
    ny: int,
    nx: int,
    accel_row: int,
    omega: float,
    w1: float,
    w2: float,
):
    t = pl.program_id(0)
    k_steps = pl.num_programs(0)
    p = jax.lax.rem(t, 2)
    zero = np.float32(0.0)

    # Source state: the input ref on the first step, else the ping buffer.
    src = [
        jnp.where(t == 0, f_ref[k], buf[p, k]) for k in range(NSPEEDS)
    ]

    # One fused step over the whole grid: the "window" IS the torus, so the
    # rotates wrap correctly and every cell is owned (see ops.window_step).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    blocked = obst_ref[:] != zero
    out, parts = fused_window_steps(
        src, blocked, row_ids == accel_row, 1, omega, w1, w2,
        owned=(slice(None), slice(None)),
    )

    q = jax.lax.rem(t + 1, 2)
    for k in range(NSPEEDS):
        buf[q, k] = out[k]
    av_ref[t, 0] = parts[0]

    @pl.when(t == k_steps - 1)
    def _():
        for k in range(NSPEEDS):
            out_ref[k] = buf[q, k]


def _kernel_hbm(
    f_ref,       # (9, ny, nx) HBM input
    obst_ref,    # (ny, nx) HBM f32 mask
    out_ref,     # (9, ny, nx) HBM output
    av_ref,      # (K, 1) SMEM
    buf,         # (2, 9, ny, nx) VMEM ping-pong
    obuf,        # (ny, nx) VMEM
    sem,         # DMA semaphore
    *,
    ny: int,
    nx: int,
    accel_row: int,
    omega: float,
    w1: float,
    w2: float,
    collide_split: int = 2,
):
    t = pl.program_id(0)
    k_steps = pl.num_programs(0)
    p = jax.lax.rem(t, 2)
    q = jax.lax.rem(t + 1, 2)
    zero = np.float32(0.0)

    def edge_copies():
        return [
            pltpu.make_async_copy(f_ref, buf.at[0], sem),
            pltpu.make_async_copy(obst_ref, obuf, sem),
        ]

    @pl.when(t == 0)
    def _():
        for c in edge_copies():
            c.start()
        for c in edge_copies():
            c.wait()

    src = [buf[p, k] for k in range(NSPEEDS)]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    blocked = obuf[:] != zero
    # collide_split caps the collide's live temporaries; the hard floor is
    # the ping-pong pair (72 B/cell) + nine rolled planes (36 B/cell),
    # which is what sets _MAX_CELLS_HBM (384^2 = 147K cells needs 16.2 MB
    # scoped VMEM — measured over budget in every formulation tried,
    # including static pl.when ping-pong branches at 16.8 MB).
    out, parts = fused_window_steps(
        src, blocked, row_ids == accel_row, 1, omega, w1, w2,
        owned=(slice(None), slice(None)), collide_split=collide_split,
    )
    for k in range(NSPEEDS):
        buf[q, k] = out[k]
    av_ref[t, 0] = parts[0]

    @pl.when(t == k_steps - 1)
    def _():
        cp = pltpu.make_async_copy(buf.at[q], out_ref, sem)
        cp.start()
        cp.wait()


def make_resident_step_hbm(
    ny: int,
    nx: int,
    k_steps: int,
    accel_row: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
):
    """HBM-edge variant of make_resident_step for grids past the 4-copy
    gate (see ``supported_hbm``): same chunk contract, state DMA'd into the
    VMEM ping-pong once per chunk and out once at its end."""
    if not supported_hbm(ny, nx):
        raise ValueError(
            f"resident-hbm kernel unsupported for grid ({ny}, {nx})"
        )
    if interpret is None:
        interpret = window_step.default_interpret()

    kernel = functools.partial(
        _kernel_hbm, ny=ny, nx=nx, accel_row=int(accel_row),
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
    )

    call = pl.pallas_call(
        kernel,
        grid=(k_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, ny, nx), jnp.float32),
            pltpu.VMEM((ny, nx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=85 * ny * nx * k_steps,
            bytes_accessed=2 * NSPEEDS * ny * nx * 4,
            transcendentals=2 * ny * nx * k_steps,
        ),
        interpret=interpret,
    )

    def chunk(f, obst_f32):
        f_out, av = call(f, obst_f32)
        return f_out, av[:, 0]

    return chunk


def make_resident_step(
    ny: int,
    nx: int,
    k_steps: int,
    accel_row: int,
    omega: float,
    accel_w1: float,
    accel_w2: float,
    interpret: Optional[bool] = None,
):
    """Returns ``chunk(f, obst_f32) -> (f', av_sums[k_steps])`` advancing
    k_steps timesteps in one kernel call."""
    if not supported(ny, nx):
        raise ValueError(f"resident kernel unsupported for grid ({ny}, {nx})")
    if interpret is None:
        interpret = window_step.default_interpret()

    kernel = functools.partial(
        _kernel, ny=ny, nx=nx, accel_row=int(accel_row),
        omega=float(omega), w1=float(accel_w1), w2=float(accel_w2),
    )

    call = pl.pallas_call(
        kernel,
        grid=(k_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSPEEDS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((k_steps, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NSPEEDS, ny, nx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=85 * ny * nx * k_steps,
            bytes_accessed=2 * NSPEEDS * ny * nx * 4,
            transcendentals=2 * ny * nx * k_steps,
        ),
        interpret=interpret,
    )

    def chunk(f, obst_f32):
        f_out, av = call(f, obst_f32)
        return f_out, av[:, 0]

    return chunk
