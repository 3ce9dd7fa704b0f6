"""The sharded step-loop runner.

Composes the whole distributed architecture in one ``shard_map`` over a 1-D
mesh:

- halo slabs move between ring neighbours — K rows once per K fused steps
  via ``lax.ppermute`` (or in-kernel RDMA with ``backend='pallas-rdma'``),
  replacing the persistent per-step MPI requests of
  d2q9-bgk.c:295-313,326-366; the periodic y-boundary is the ring
  wrap-around, exactly as the reference's neighbour arithmetic
  (d2q9-bgk.c:245-247);
- the per-step average-velocity series accumulates locally inside the scan
  and is reduced with ONE deferred ``psum`` after the loop, mirroring the
  reference's single post-loop ``MPI_Reduce`` (d2q9-bgk.c:367-374,396).

Backend tiering under ``backend='pallas'`` (auto on TPU):

1. ``ops.pallas_resident`` — small grids, whole state in VMEM, 512 fused
   steps per kernel call (single device only; the HBM-edge variant extends
   the gate to ~180K cells);
2. ``ops.pallas_kstep_skew`` — skewed zero-recompute K-step blocks with the
   seam fix fused into the same kernel (fastest 1-D tier measured);
3. ``ops.pallas_kstep_skew2d`` — wide grids: 2-D tiled skew;
4. ``ops.pallas_kstep`` — classic K=8-step temporal blocking over
   full-width row blocks (donor-aliased scan ping-pong, exact-bottom);
5. ``ops.pallas_kstep2d`` / ``ops.pallas_kstep_bands`` — classic wide-grid
   tilings (fallback / A-B alternatives);
6. periodic-extension padding — ANY (ny, nx, n_devices): row extension for
   uneven/unaligned ny (``_make_kstep_runner(padded=True)``, multi-hop
   wrap slabs when the pad exceeds a shard) and column extension for
   nx % 128 != 0 (``_make_xpad_runner`` — in-register wrap re-aim,
   window_step.x_wrap_patch), composable;
7. ``ops.pallas_step`` — 1-step streaming fallback (retained as a safety
   net and as the simplest-possible reference kernel);
8. ``ops.step_local`` — pure-jnp fallback for unsupported shapes
   (also ``backend='jnp'``, the differential-test oracle).

``backend='pallas-rdma'`` moves the halo exchange in-kernel over ICI:
``ops.pallas_resident_rdma`` (shard resident in VMEM across ~512 steps)
when the shard fits, else ``ops.pallas_kstep_rdma``; 2-D meshes route to
the x-halo torus kstep tier (``_make_runner_2d_kstep``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpulbm.core.params import LBMParams
from tpulbm.dist.mesh import AXIS, get_mesh
from tpulbm.dist.sharding import validate_even_col_split, validate_even_split
from tpulbm.ops import step_local


def _select_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    platform = jax.devices()[0].platform
    if platform == "tpu" or platform == "axon":
        return "pallas"
    return "jnp"


def _make_resident_runner(params: LBMParams, n_steps: int, k_chunk: int = 512):
    """Single-device runner over the VMEM-resident multi-step kernel (the
    HBM-edge variant past the 4-copy VMEM gate — see
    pallas_resident.supported_hbm)."""
    from tpulbm.ops import pallas_resident

    k = min(n_steps, k_chunk)
    n_full, rem = divmod(n_steps, k)
    maker = (
        pallas_resident.make_resident_step
        if pallas_resident.supported(params.ny, params.nx)
        else pallas_resident.make_resident_step_hbm
    )
    mk = functools.partial(
        maker,
        params.ny, params.nx,
        accel_row=params.accel_row, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2,
    )
    chunk_k = mk(k_steps=k)
    chunk_rem = mk(k_steps=rem) if rem else None
    free_inv = jnp.float32(params.free_cells_inv)

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        obst_f = obstacles.astype(jnp.float32)

        def body(g, _):
            g2, av = chunk_k(g, obst_f)
            return g2, av * free_inv

        f_out, avs = jax.lax.scan(body, f, None, length=n_full)
        av_flat = avs.reshape(-1)
        if chunk_rem is not None:
            f_out, av_r = chunk_rem(f_out, obst_f)
            av_flat = jnp.concatenate([av_flat, av_r * free_inv])
        return f_out, av_flat

    return runner


def _ring_slabs(n_dev: int, axis_name: str):
    """(slab2, slab3): functions returning the (lo, hi) edge slabs of a
    2-D/3-D per-shard array from the ring neighbours. Forward permutation
    carries each shard's LAST rows to the next device (whose halo-below they
    become); backward carries first rows to the previous device."""
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def slab2(x, w):
        lo = jax.lax.ppermute(x[-w:], axis_name, perm_fwd)
        hi = jax.lax.ppermute(x[:w], axis_name, perm_bwd)
        return lo, hi

    def slab3(g, w):
        lo = jax.lax.ppermute(g[:, -w:, :], axis_name, perm_fwd)
        hi = jax.lax.ppermute(g[:, :w, :], axis_name, perm_bwd)
        return lo, hi

    return slab2, slab3


def _make_kstep_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    k: int,
    axis_name: str = AXIS,
    maker=None,
    alias_donor: bool = False,
    padded: bool = False,
    exact_all: bool = False,
    canon_nx: int = 0,
):
    """Runner over a K-step temporal-blocking kernel (1-D row blocks, or 2-D
    row-x-column tiles for wide grids): K fused timesteps per HBM pass, halo
    slabs of K rows exchanged once per K steps.

    ``alias_donor=True`` removes the scan-carry copy (xprof: ~6 us/step at
    1024^2): each scan iteration advances TWO chunks through a stationary
    ping-pong — g -> scratch-buffer, then -> g's buffer — with the kernel's
    input_output_aliases pinning each output into the donated buffer, so both
    scan carries keep a fixed buffer assignment and XLA inserts no copies.

    ``padded=True`` runs ANY (ny, n_devices) on the fast kernel via
    PERIODIC-EXTENSION padding: the grid is padded to ``rows * n_dev`` rows
    (rows a multiple of 8) where padded row i holds a copy of real row
    i - ny. Because row i's neighbours then also mirror row (i - ny)'s
    neighbours, every mirror evolves bitwise-identically to its original and
    the final crop is exact — no masking of the dynamics, unlike the jnp
    padded runner's dead-row scheme (_make_padded_runner). Only three
    adjustments are needed: (a) the ring wrap slabs come from shifted static
    positions — the last shard sends its last K *canonical* rows down to
    shard 0, and shard 0 sends rows [pad, pad+K) up to the last shard (the
    rows that globally follow G[ny_pad-1] = F[pad-1]); (b) the kernels'
    modular accel selection (ny_global = real ny) hits the accelerated row's
    mirror automatically; (c) mirror rows are excluded from the |u| series
    via the kernel's canon_ny mask. The reference achieves shape generality
    with remainder-balanced uneven shards (d2q9-bgk.c:834-862) — uneven
    shapes defeat SPMD/XLA, so padding is the TPU-native equivalent.
    """
    from tpulbm.ops import pallas_kstep

    if maker is None:
        maker = pallas_kstep.make_kstep
    n_dev = mesh.devices.size
    if padded:
        from tpulbm.dist.sharding import padded_split_aligned

        h, ny_pad = padded_split_aligned(params.ny, n_dev)
        pad = ny_pad - params.ny
        nl = params.ny - (n_dev - 1) * h  # canonical rows on the last shard
        extra = {"canon_ny": params.ny}
    else:
        h = params.ny // n_dev
        pad = 0
        nl = h
        extra = {}
    if canon_nx:
        # params.nx is the periodic x-extension width; canon_nx the real nx
        # (window_step.x_wrap_patch keeps mirrors exact). 1-D kernel only.
        extra["canon_nx"] = canon_nx
    n_outer, rem = divmod(n_steps, k)
    mk = functools.partial(
        maker,
        h, params.nx, ny_global=params.ny, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2, **extra,
    )
    from tpulbm.ops import pallas_kstep as _pk
    from tpulbm.ops import pallas_kstep2d as _pk2

    # exact_all: the K-step kernel runs ONE exact-substitution body for
    # every row block (~6% faster than the classic+exact pair at 1024^2);
    # block 0's first K owned rows come out contaminated and excluded from
    # its sums, and a tiny classic fix kernel recomputes them (values and
    # sums) from the chunk's input + ring halo each chunk. For the 2-D
    # tiling the same contract is the row_inner kernel (row blocks chain
    # within each column strip; every strip's block 0 is contaminated over
    # the same global rows [0, K), so the one full-width fix covers all).
    base_maker = maker.func if isinstance(maker, functools.partial) else maker
    extra_k = {}
    if exact_all and not padded and k == _pk.MAX_K:
        if base_maker is _pk.make_kstep:
            by_pick = _pk.pick_block_rows(h, params.nx)
            if (by_pick and by_pick >= _pk._MARGIN + k
                    and h // by_pick >= 2):
                extra_k = {"exact_bottom_all": True}
        elif base_maker is _pk2.make_kstep2d:
            tile = (maker.keywords.get("tile")
                    if isinstance(maker, functools.partial) else None)
            if tile is None:
                tile = _pk2.pick_tile(h, params.nx)
            if tile and tile[0] >= _pk2._MY + k and h // tile[0] >= 2:
                extra_k = {"row_inner": True}
    exact_all = bool(extra_k)
    if alias_donor:
        prepare, chunk_k = mk(k_steps=k, alias_donor=True, **extra_k)
        _, chunk_plain = mk(k_steps=k, **extra_k)
    else:
        prepare, chunk_k = mk(k_steps=k, **extra_k)
    chunk_r = mk(k_steps=rem)[1] if rem else None
    chunk_fix = None
    if exact_all:
        # the fix kernel is a single K-row classic block over the full
        # width: 1-D when the window fits, 2-D column tiles otherwise
        if _pk.supported(k, params.nx, k):
            _, chunk_fix = _pk.make_kstep(
                k, params.nx, k_steps=k, ny_global=params.ny,
                omega=params.omega, accel_w1=params.accel_w1,
                accel_w2=params.accel_w2, by=k, row_reuse=False,
                exact_bottom=False, canon_nx=canon_nx,
            )
        else:
            # tile=None lets pick_tile choose a valid (k, bx) with bx a
            # 128-multiple divisor of nx — a hardcoded bx crashes for any
            # nx % bx != 0 (e.g. nx=2304 passes the nx%128 gate).
            _, chunk_fix = _pk2.make_kstep2d(
                k, params.nx, k_steps=k, ny_global=params.ny,
                omega=params.omega, accel_w1=params.accel_w1,
                accel_w2=params.accel_w2, tile=None,
                exact_left=False,
            )
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row

    def run_local(f, obst_bool, shard_off, slab, psl):
        """slab(x, w): the w-row halo slabs (lo, hi) for array x."""
        scal = jnp.stack([jnp.int32(accel_glob), shard_off]).reshape(1, 2)
        obst_f = obst_bool.astype(jnp.float32)

        def aux_for(width):
            olo, ohi = slab(obst_f, width)
            return (obst_f, olo, ohi)

        aux_k = aux_for(k)

        if chunk_fix is not None:
            # exact_all fix pass: recompute block 0's first K rows (values
            # AND per-step sums) classically from the chunk's INPUT state +
            # the same ring halo, then splice them over the contaminated
            # rows. ~K/h of a chunk's compute.
            aux_fix = (obst_f[:k], aux_k[1], obst_f[k : 2 * k])

            def fixed(g_in, hlo, g_out, av_c):
                f_fix, av_f = chunk_fix(
                    g_in[:, :k, :], hlo, g_in[:, k : 2 * k, :], aux_fix,
                    scal,
                )
                g_out = jax.lax.dynamic_update_slice(g_out, f_fix, (0, 0, 0))
                return g_out, av_c + av_f
        else:
            def fixed(g_in, hlo, g_out, av_c):
                return g_out, av_c

        if alias_donor:
            n_pairs, odd = divmod(n_outer, 2)
            av_head = None
            if odd:
                hlo, hhi = psl(f, k)
                f0, av0 = chunk_plain(f, hlo, hhi, aux_k, scal)
                f, av0 = fixed(f, hlo, f0, av0)
                av_head = av0 * free_inv

            def body(carry, _):
                g, scratch = carry
                hlo, hhi = psl(g, k)
                t1, av1 = chunk_k(g, hlo, hhi, aux_k, scal, scratch)
                t1, av1 = fixed(g, hlo, t1, av1)
                hlo, hhi = psl(t1, k)
                t2, av2 = chunk_k(t1, hlo, hhi, aux_k, scal, g)
                t2, av2 = fixed(t1, hlo, t2, av2)
                return (t2, t1), jnp.concatenate([av1, av2]) * free_inv

            (f_out, _), avs = jax.lax.scan(
                body, (f, jnp.zeros_like(f)), None, length=n_pairs
            )
            av = avs.reshape(-1)
            if av_head is not None:
                av = jnp.concatenate([av_head, av])
        else:
            def body(g, _):
                hlo, hhi = psl(g, k)
                g2, av = chunk_k(g, hlo, hhi, aux_k, scal)
                g2, av = fixed(g, hlo, g2, av)
                return g2, av * free_inv

            f_out, avs = jax.lax.scan(body, f, None, length=n_outer)
            av = avs.reshape(-1)
        if chunk_r is not None:
            hlo, hhi = psl(f_out, rem)
            f_out, av_r = chunk_r(f_out, hlo, hhi, aux_for(rem), scal)
            av = jnp.concatenate([av, av_r * free_inv])
        return f_out, av

    ny = params.ny
    if n_dev == 1:
        # lo halo = the K rows globally above row 0 = the last canonical
        # rows; hi halo = the rows globally after G[ny_pad-1] = F[pad-1],
        # i.e. rows [pad, pad+w). For pad == 0 both reduce to the plain
        # self-wrap.
        def self_slab2(x, w):
            return x[ny - w : ny], x[pad : pad + w]

        def self_slab3(g, w):
            return g[:, ny - w : ny, :], g[:, pad : pad + w, :]

        @functools.partial(jax.jit, donate_argnums=0)
        def runner_single(f, obstacles):
            if pad:
                f = jnp.concatenate([f, f[:, :pad, :]], axis=1)
                obstacles = jnp.concatenate(
                    [obstacles, obstacles[:pad]], axis=0
                )
            f_out, av = run_local(
                f, obstacles, jnp.int32(0), self_slab2, self_slab3
            )
            return (f_out[:, :ny, :] if pad else f_out), av

        return runner_single

    if padded:
        perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        # Shifted wrap slabs need their source rows resident on the edge
        # shards (last shard's canonical tail, shard 0's rows [pad, pad+K));
        # otherwise (large pad relative to rows) the general multi-hop form
        # below gathers them from whichever shard(s) hold them.
        simple_wrap = pad + k <= h and nl >= k

        def body(f_loc, obst_loc):
            d = jax.lax.axis_index(axis_name)

            def slab_simple(x, w, axis):
                # Shifted wrap slabs (see the padded docstring above): the
                # last shard forwards its last CANONICAL w rows; shard 0
                # sends rows [pad, pad+w) backward. All interior slabs are
                # the plain edge slabs.
                start_f = jnp.where(d == n_dev - 1, nl - w, h - w)
                start_b = jnp.where(d == 0, pad, 0)
                lo = jax.lax.ppermute(
                    jax.lax.dynamic_slice_in_dim(x, start_f, w, axis=axis),
                    axis_name, perm_fwd,
                )
                hi = jax.lax.ppermute(
                    jax.lax.dynamic_slice_in_dim(x, start_b, w, axis=axis),
                    axis_name, perm_bwd,
                )
                return lo, hi

            def wrap_rows(x, g0, w, recv, axis):
                # Deliver padded-global rows [g0, g0+w) (static range, may
                # span two shards) to shard ``recv``; zeros elsewhere.
                s0 = g0 // h
                o0 = g0 - s0 * h
                la = min(w, h - o0)
                start = jnp.where(d == s0, o0, 0)
                a = jax.lax.dynamic_slice_in_dim(x, start, la, axis=axis)
                parts = [jax.lax.ppermute(a, axis_name, [(s0, recv)])]
                if la < w:
                    b = jax.lax.slice_in_dim(x, 0, w - la, axis=axis)
                    parts.append(
                        jax.lax.ppermute(b, axis_name, [(s0 + 1, recv)]))
                return (parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=axis))

            def slab_general(x, w, axis):
                # Interior edge slabs ride the open chains (no wrap pair),
                # so the edge shards receive zeros there; the wrap slabs
                # are gathered from their true owners and ADDED (disjoint
                # receivers — ppermute zero-fills non-participants).
                lo = jax.lax.ppermute(
                    jax.lax.slice_in_dim(x, h - w, h, axis=axis),
                    axis_name, perm_fwd[:-1],
                )
                hi = jax.lax.ppermute(
                    jax.lax.slice_in_dim(x, 0, w, axis=axis),
                    axis_name, perm_bwd[1:],
                )
                lo = lo + wrap_rows(x, ny - w, w, 0, axis)
                hi = hi + wrap_rows(x, pad, w, n_dev - 1, axis)
                return lo, hi

            slab = slab_simple if simple_wrap else slab_general
            f_out, av = run_local(
                f_loc, obst_loc, (d * h).astype(jnp.int32),
                lambda x, w: slab(x, w, 0), lambda g, w: slab(g, w, 1),
            )
            return f_out, jax.lax.psum(av, axis_name)
    else:
        ring_slab2, ring_slab3 = _ring_slabs(n_dev, axis_name)

        def body(f_loc, obst_loc):
            d = jax.lax.axis_index(axis_name)
            f_out, av = run_local(
                f_loc, obst_loc, (d * h).astype(jnp.int32),
                ring_slab2, ring_slab3,
            )
            return f_out, jax.lax.psum(av, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )

    if pad:
        from jax.sharding import NamedSharding

        f_spec = NamedSharding(mesh, P(None, axis_name, None))
        o_spec = NamedSharding(mesh, P(axis_name, None))

        @functools.partial(jax.jit, donate_argnums=0)
        def runner(f, obstacles):
            f_pad = jnp.concatenate([f, f[:, :pad, :]], axis=1)
            obst_pad = jnp.concatenate([obstacles, obstacles[:pad]], axis=0)
            f_pad = jax.lax.with_sharding_constraint(f_pad, f_spec)
            obst_pad = jax.lax.with_sharding_constraint(obst_pad, o_spec)
            f_out, av = sharded(f_pad, obst_pad)
            return f_out[:, :ny, :], av
    else:
        @functools.partial(jax.jit, donate_argnums=0)
        def runner(f, obstacles):
            return sharded(f, obstacles)

    return runner


def _make_skew_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    axis_name: str = AXIS,
    alias_donor: bool = True,
    by: int | None = None,
    collide_split: int = 1,
    maker=None,
    tile=None,
    fused_fix: bool | None = None,
    canon_nx: int = 0,
    kernel_kw: dict | None = None,
):
    """Runner over the skewed zero-recompute K-step kernel
    (ops/pallas_kstep_skew.py). Per K-step chunk: the main kernel advances
    every row block with compute/owned ratio 1.0 (the parallelogram skew),
    then the 4K-row seam fix recomputes the torus/shard seam band from the
    chunk's input and splices its values into rows [0, K) locally and rows
    [H-K, H) of the ring neighbour below (the skew shifts each block's
    output down K rows, so the shard-top rows are produced across the
    seam). With ``fused_fix`` (default for the 1-D kernel) the seam fix
    runs as an extra trailing program of the SAME pallas_call — no second
    kernel launch, band concat, or value splices; on one device the whole
    chunk is a single kernel call. Collective count per chunk matches the
    classic runner either way: one 2K-row slab forward (fix band input) +
    one K-row slab backward (fix output), plus the single deferred
    post-loop psum of the |u| series.
    """
    from tpulbm.ops import pallas_kstep, pallas_kstep_skew as pks

    n_dev = mesh.devices.size
    h = params.ny // n_dev
    k = pks.SKEW_K
    ny = params.ny
    n_outer, rem = divmod(n_steps, k)
    if fused_fix is None:
        fused_fix = maker is None
    if maker is None:
        fused_kw = {}
        if fused_fix:
            fused_kw = dict(
                fused_fix=True, self_band=n_dev == 1,
                top_local=n_dev == 1,
                fix_collide_split=max(1, params.nx // 1024),
            )
        mk = functools.partial(
            pks.make_skew,
            h, params.nx, k, ny_global=ny, omega=params.omega,
            accel_w1=params.accel_w1, accel_w2=params.accel_w2,
            by=by, collide_split=collide_split, canon_nx=canon_nx,
            **fused_kw, **(kernel_kw or {}),
        )
    else:
        # 2-D tiled skew (wide grids): same chunk/fix/runner contract
        mk = functools.partial(
            maker,
            h, params.nx, k, ny_global=ny, omega=params.omega,
            accel_w1=params.accel_w1, accel_w2=params.accel_w2,
            tile=tile, collide_split=collide_split,
            **(kernel_kw or {}),
        )
    if alias_donor:
        prepare, chunk_k = mk(alias_donor=True)
        _, chunk_plain = mk()
    else:
        prepare, chunk_k = mk()
        chunk_plain = chunk_k
    chunk_fix = None
    if not fused_fix:
        if params.nx <= pks.MONO_FIX_NX_MAX or canon_nx:
            if canon_nx and params.nx > pks.MONO_FIX_NX_MAX:
                # the x-extension composes with the monolithic fix only (the
                # tiled fix's per-window rolls can't carry the canonical
                # wrap re-aim); unaligned decks this wide fall back earlier
                raise ValueError(
                    f"skew runner: x-extended width {params.nx} exceeds the "
                    f"monolithic fix envelope ({pks.MONO_FIX_NX_MAX})"
                )
            chunk_fix = pks.make_skew_fix(
                params.nx, ny, params.omega, params.accel_w1,
                params.accel_w2, k,
                collide_split=max(1, params.nx // 1024), canon_nx=canon_nx,
            )
        else:
            # wider than the monolithic fix's VMEM envelope: x-tiled fix
            # (ops/pallas_kstep_skew.make_skew_fix_tiled), same contract
            chunk_fix = pks.make_skew_fix_tiled(
                params.nx, ny, params.omega, params.accel_w1,
                params.accel_w2, k,
            )
    chunk_r = None
    if rem:
        # classic fallback kernel for the sub-K tail: 1-D where it fits,
        # 2-D column tiling on wide grids
        from tpulbm.ops import pallas_kstep2d

        rem_kw = dict(
            ny_global=ny, omega=params.omega,
            accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        )
        if pallas_kstep.supported(h, params.nx, rem):
            chunk_r = pallas_kstep.make_kstep(
                h, params.nx, k_steps=rem, canon_nx=canon_nx, **rem_kw)[1]
        elif canon_nx:
            raise ValueError(
                f"skew runner: no x-extended remainder kernel for local "
                f"shape ({h}, {params.nx}), rem={rem}"
            )
        elif pallas_kstep2d.supported(h, params.nx, rem):
            chunk_r = pallas_kstep2d.make_kstep2d(
                h, params.nx, k_steps=rem, **rem_kw)[1]
        else:
            raise ValueError(
                f"skew runner: no remainder kernel for local shape "
                f"({h}, {params.nx}), rem={rem}"
            )
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row

    def run_local(f, obst_bool, shard_off, lo2, lo3, send_down, psl2, psl3):
        """lo2/lo3(x, w): the w rows globally BELOW the shard (2-D / 3-D);
        send_down(x): deliver x to the ring neighbour below, returning what
        arrived from above; psl2/psl3: full (lo, hi) slabs (remainder-chunk
        classic kernel only)."""
        scal = jnp.stack([jnp.int32(accel_glob), shard_off]).reshape(1, 2)
        fix_base = jnp.mod(shard_off - 2 * k, ny).astype(jnp.int32)
        scal_fix = jnp.stack([jnp.int32(accel_glob), fix_base]).reshape(1, 2)
        obst_f = obst_bool.astype(jnp.float32)
        oband = jnp.concatenate([lo2(obst_f, 2 * k), obst_f[: 2 * k]], axis=0)

        if fused_fix:
            scal3 = jnp.stack(
                [jnp.int32(accel_glob), shard_off, fix_base]).reshape(1, 3)

            def do_chunk(g, donor):
                if n_dev == 1:
                    args = (g, obst_f, oband, scal3)
                else:
                    args = (g, lo3(g, 2 * k), obst_f, oband, scal3)
                fn = chunk_plain if donor is None else chunk_k
                if donor is not None:
                    args = args + (donor,)
                if n_dev == 1:
                    return fn(*args)
                g2, av, top = fn(*args)
                top = send_down(top)
                g2 = jax.lax.dynamic_update_slice(g2, top, (0, h - k, 0))
                return g2, av
        else:
            def do_chunk(g, donor):
                band = jnp.concatenate(
                    [lo3(g, 2 * k), g[:, : 2 * k, :]], axis=1)
                if donor is None:
                    g2, av = chunk_plain(g, obst_f, scal)
                else:
                    g2, av = chunk_k(g, obst_f, scal, donor)
                vals, av_f = chunk_fix(band, oband, scal_fix)
                g2 = jax.lax.dynamic_update_slice(
                    g2, vals[:, k:, :], (0, 0, 0))
                top = send_down(vals[:, :k, :])
                g2 = jax.lax.dynamic_update_slice(g2, top, (0, h - k, 0))
                return g2, av + av_f

        if alias_donor:
            n_pairs, odd = divmod(n_outer, 2)
            av_head = None
            f_out = f
            if odd:
                f_out, av0 = do_chunk(f, None)
                av_head = av0 * free_inv

            def body(carry, _):
                g, scratch = carry
                t1, av1 = do_chunk(g, scratch)
                t2, av2 = do_chunk(t1, g)
                return (t2, t1), jnp.concatenate([av1, av2]) * free_inv

            (f_out, _), avs = jax.lax.scan(
                body, (f_out, jnp.zeros_like(f)), None, length=n_pairs
            )
            av = avs.reshape(-1)
            if av_head is not None:
                av = jnp.concatenate([av_head, av])
        else:
            def body(g, _):
                g2, av_c = do_chunk(g, None)
                return g2, av_c * free_inv

            f_out, avs = jax.lax.scan(body, f, None, length=n_outer)
            av = avs.reshape(-1)
        if chunk_r is not None:
            hlo, hhi = psl3(f_out, rem)
            olo, ohi = psl2(obst_f, rem)
            f_out, av_r = chunk_r(
                f_out, hlo, hhi, (obst_f, olo, ohi), scal
            )
            av = jnp.concatenate([av, av_r * free_inv])
        return f_out, av

    if n_dev == 1:
        @functools.partial(jax.jit, donate_argnums=0)
        def runner_single(f, obstacles):
            return run_local(
                f, obstacles, jnp.int32(0),
                lambda x, w: x[ny - w : ny],
                lambda g, w: g[:, ny - w : ny, :],
                lambda x: x,
                lambda x, w: (x[ny - w : ny], x[:w]),
                lambda g, w: (g[:, ny - w : ny, :], g[:, :w, :]),
            )

        return runner_single

    ring_slab2, ring_slab3 = _ring_slabs(n_dev, axis_name)
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        f_out, av = run_local(
            f_loc, obst_loc, (d * h).astype(jnp.int32),
            lambda x, w: jax.lax.ppermute(x[-w:], axis_name, perm_fwd),
            lambda g, w: jax.lax.ppermute(g[:, -w:, :], axis_name, perm_fwd),
            lambda x: jax.lax.ppermute(x, axis_name, perm_bwd),
            ring_slab2, ring_slab3,
        )
        return f_out, jax.lax.psum(av, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def _make_fold_ring_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    axis_name: str = AXIS,
    F: int | None = None,
    by: int | None = None,
    collide_split: int = 1,
):
    """Multi-device lane-folded skew (ops/pallas_kstep_skew_fold.py): each
    shard evolves its LOCAL folded rows with the fold kernel; the kernel's
    seam-fix machinery doubles as the shard-boundary machinery — one
    unfolded fix band per shard boundary, so NO state halo is exchanged for
    the main kernel at all. Collective count per K-step chunk matches the
    skew ring: one bh·F-row band slab forward (fix input from the shard
    above) + one E-row slab backward (the fix's below-boundary values, the
    neighbour's shard-top), plus the single deferred post-loop psum of the
    |u| series. Requires n_steps % K == 0 (routing gates this; the folded
    jnp remainder is single-device-only)."""
    from tpulbm.core.lattice import NSPEEDS
    from tpulbm.ops import fold as fold_mod
    from tpulbm.ops import pallas_kstep_skew_fold as pkf

    n_dev = mesh.devices.size
    ny, nx = params.ny, params.nx
    if F is None:
        F = pkf.pick_fold_ring(ny, nx, n_dev)
    k = pkf.FOLD_K
    n_outer, rem = divmod(n_steps, k)
    if F is None or rem or n_outer < 1:
        raise ValueError(
            f"fold ring unsupported for ({ny}, {nx}) on {n_dev} devices, "
            f"n_steps={n_steps}"
        )
    w = nx // F
    ny_loc = ny // n_dev
    hf_loc = ny_loc * F
    hf_glob = ny * F
    E = k * pkf.slide(F)
    m = pkf.fix_band_half(F)
    bh = pkf.fix_band_side(F, k)
    ve = bh - m - k
    mk = functools.partial(
        pkf.make_fold, ny_loc, nx, F, params.omega, params.accel_w1,
        params.accel_w2, k, by=by, collide_split=collide_split,
        hf_global=hf_glob,
    )
    alias_donor = n_outer >= 2
    if alias_donor:
        _, chunk_k = mk(alias_donor=True)
        _, chunk_plain = mk()
    else:
        _, chunk_plain = mk()
        chunk_k = None
    chunk_fix = pkf.make_fold_fix(
        ny, nx, F, params.omega, params.accel_w1, params.accel_w2, k)
    free_inv = jnp.float32(params.free_cells_inv)
    a_fold = params.accel_row * F
    accel_glob = params.accel_row
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        g = fold_mod.fold(f_loc, F)
        og = fold_mod.fold(obst_loc, F).astype(jnp.float32)
        shard_off = (d * hf_loc).astype(jnp.int32)
        scal = jnp.stack(
            [jnp.int32(a_fold), shard_off]).reshape(1, 2)
        band_base = jnp.mod(d * ny_loc - bh, ny).astype(jnp.int32)
        scal_fix = jnp.stack(
            [jnp.int32(accel_glob), band_base]).reshape(1, 2)
        # obstacle band of MY lower-boundary fix: unfolded global rows
        # [d*ny_loc - bh, d*ny_loc + bh) — lower half from the shard above
        ob_lo = jax.lax.ppermute(
            og[hf_loc - bh * F :, :], axis_name, perm_fwd)
        ob_band = jnp.concatenate(
            [ob_lo, og[: bh * F, :]], axis=0).reshape(2 * bh, nx)

        def do_chunk(gc, donor):
            lo = jax.lax.ppermute(
                gc[:, hf_loc - bh * F :, :], axis_name, perm_fwd)
            band = jnp.concatenate(
                [lo, gc[:, : bh * F, :]], axis=1
            ).reshape(NSPEEDS, 2 * bh, nx)
            if donor is None:
                g2, av = chunk_plain(gc, og, scal)
            else:
                g2, av = chunk_k(gc, og, scal, donor)
            vals, av_f = chunk_fix(band, ob_band, scal_fix)
            vals_g = vals[:, ve : ve + 2 * m, :].reshape(NSPEEDS, 2 * E, w)
            # upper band half = my rows [0, E); lower half = the shard
            # above's rows [hf_loc - E, hf_loc) — send it back up
            top = jax.lax.ppermute(vals_g[:, :E, :], axis_name, perm_bwd)
            g2 = jax.lax.dynamic_update_slice(g2, vals_g[:, E:, :], (0, 0, 0))
            g2 = jax.lax.dynamic_update_slice(g2, top, (0, hf_loc - E, 0))
            return g2, av + av_f

        g_out = g
        if alias_donor:
            n_pairs, odd = divmod(n_outer, 2)
            av_head = None
            if odd:
                g_out, av0 = do_chunk(g, None)
                av_head = av0 * free_inv

            def sbody(carry, _):
                gc, scratch = carry
                t1, av1 = do_chunk(gc, scratch)
                t2, av2 = do_chunk(t1, gc)
                return (t2, t1), jnp.concatenate([av1, av2]) * free_inv

            (g_out, _), avs = jax.lax.scan(
                sbody, (g_out, jnp.zeros_like(g)), None, length=n_pairs)
            av = avs.reshape(-1)
            if av_head is not None:
                av = jnp.concatenate([av_head, av])
        else:
            g_out, av0 = do_chunk(g_out, None)
            av = (av0 * free_inv).reshape(-1)
        return fold_mod.unfold(g_out, F), jax.lax.psum(av, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def _make_kstep_bands_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    k: int,
    axis_name: str = AXIS,
    tile=None,
    narrow_cols: bool = False,
):
    """Runner over the band-major K-step kernel (wide grids): the state lives
    as (NB, 9, H, BW) contiguous column bands for the whole runner call
    (one transpose in, one out — amortized over all steps), so the kernel's
    main window DMA piece is contiguous instead of 2 KB segments on a 16 KB
    stride. See ops/pallas_kstep_bands.py."""
    from tpulbm.ops import pallas_kstep_bands as pkb

    n_dev = mesh.devices.size
    h = params.ny // n_dev
    if tile is None:
        tile = pkb.pick_bands(h, params.nx, narrow_cols)
    by, bw = tile
    nb = params.nx // bw
    n_outer, rem = divmod(n_steps, k)
    mk = functools.partial(
        pkb.make_kstep_bands,
        h, params.nx, ny_global=params.ny, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2, tile=tile,
        narrow_cols=narrow_cols,
    )
    prepare, chunk_k = mk(k_steps=k)
    chunk_r = mk(k_steps=rem)[1] if rem else None
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row

    def run_local(f, obst_bool, shard_off, slab4, slab3):
        """slab4/slab3: (x, w) -> (lo, hi) row slabs of band-major arrays
        with 4/3 dims (rows are axis -2)."""
        scal = jnp.stack([jnp.int32(accel_glob), shard_off]).reshape(1, 2)
        fb = pkb.to_bands(f, bw)
        ob = obst_bool.astype(jnp.float32).reshape(h, nb, bw).transpose(1, 0, 2)

        def aux_for(width):
            olo, ohi = slab3(ob, width)
            return (ob, olo, ohi)

        aux_k = aux_for(k)

        def body(g, _):
            ylo, yhi = slab4(g, k)
            g2, av = chunk_k(g, ylo, yhi, aux_k, scal)
            return g2, av * free_inv

        fb_out, avs = jax.lax.scan(body, fb, None, length=n_outer)
        av = avs.reshape(-1)
        if chunk_r is not None:
            ylo, yhi = slab4(fb_out, rem)
            fb_out, av_r = chunk_r(fb_out, ylo, yhi, aux_for(rem), scal)
            av = jnp.concatenate([av, av_r * free_inv])
        return pkb.from_bands(fb_out), av

    if n_dev == 1:
        def self_slab(x, w):
            return (
                jax.lax.slice_in_dim(x, h - w, h, axis=-2),
                jax.lax.slice_in_dim(x, 0, w, axis=-2),
            )

        @functools.partial(jax.jit, donate_argnums=0)
        def runner_single(f, obstacles):
            return run_local(f, obstacles, jnp.int32(0), self_slab, self_slab)

        return runner_single

    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def ring_slab(x, w):
        lo = jax.lax.ppermute(
            jax.lax.slice_in_dim(x, h - w, h, axis=-2), axis_name, perm_fwd
        )
        hi = jax.lax.ppermute(
            jax.lax.slice_in_dim(x, 0, w, axis=-2), axis_name, perm_bwd
        )
        return lo, hi

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        f_out, av = run_local(
            f_loc, obst_loc, (d * h).astype(jnp.int32), ring_slab, ring_slab
        )
        return f_out, jax.lax.psum(av, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def _make_rdma_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    axis_name: str = AXIS,
):
    """Runner over the in-kernel-RDMA K-step kernel (multi-chip path): halo
    slabs ride ICI via make_async_remote_copy inside the kernel, overlapped
    with interior compute; no XLA collectives in the step loop (only the
    one-time obstacle-halo exchange and the final deferred psum)."""
    from tpulbm.ops import pallas_kstep, pallas_kstep_rdma

    n_dev = mesh.devices.size
    h = params.ny // n_dev
    k = min(pallas_kstep_rdma.MAX_K, n_steps)
    n_outer, rem = divmod(n_steps, k)
    prepare, chunk = pallas_kstep_rdma.make_kstep_rdma(
        h, params.nx, k, ny_global=params.ny, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        axis_name=axis_name,
    )
    chunk_rem = None
    if rem:
        # Remainder steps go through the ppermute-slab kstep kernel.
        _, chunk_rem = pallas_kstep.make_kstep(
            h, params.nx, rem, ny_global=params.ny, omega=params.omega,
            accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        )
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row
    slab2, slab3 = _ring_slabs(n_dev, axis_name)

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        off = (d * h).astype(jnp.int32)
        obst_f = obst_loc.astype(jnp.float32)
        olo, ohi = slab2(obst_f, k)
        aux = (obst_f, olo, ohi)

        def one(g, par):
            scal = jnp.stack(
                [jnp.int32(accel_glob), off, par]
            ).reshape(1, 3)
            g2, av = chunk(g, aux, scal)
            return g2, av * free_inv

        parities = (jnp.arange(n_outer) % 2).astype(jnp.int32)
        f_out, avs = jax.lax.scan(one, f_loc, parities)
        av = avs.reshape(-1)
        if chunk_rem is not None:
            hlo, hhi = slab3(f_out, rem)
            scal2 = jnp.stack([jnp.int32(accel_glob), off]).reshape(1, 2)
            aux_r = (obst_f, olo[-rem:], ohi[:rem])
            f_out, av_r = chunk_rem(f_out, hlo, hhi, aux_r, scal2)
            av = jnp.concatenate([av, av_r * free_inv])
        return f_out, jax.lax.psum(av, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def _make_resident_rdma_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    axis_name: str = AXIS,
    max_outer_per_call: int = 64,
):
    """Runner over the multi-device VMEM-resident kernel: the shard stays in
    VMEM across ``n_outer`` K-step iterations per kernel call, edge slabs
    riding ICI in-kernel (ops/pallas_resident_rdma.py). HBM sees the state
    only at call boundaries (~512 steps), vs 2 passes per K steps for the
    kstep tiers. Remainder steps (< K) go through the ppermute kstep kernel."""
    from tpulbm.ops import pallas_kstep, pallas_resident_rdma

    n_dev = mesh.devices.size
    h = params.ny // n_dev
    k = min(pallas_resident_rdma.MAX_K, n_steps)
    total_outer, rem = divmod(n_steps, k)
    c_outer = min(total_outer, max_outer_per_call)
    n_calls, rem_outer = divmod(total_outer, c_outer) if c_outer else (0, 0)
    mk = functools.partial(
        pallas_resident_rdma.make_resident_rdma,
        h, params.nx, ny_global=params.ny, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        axis_name=axis_name,
    )
    prepare, chunk = mk(k_steps=k, n_outer=c_outer)
    chunk_ro = mk(k_steps=k, n_outer=rem_outer)[1] if rem_outer else None
    chunk_rem = None
    if rem:
        _, chunk_rem = pallas_kstep.make_kstep(
            h, params.nx, rem, ny_global=params.ny, omega=params.omega,
            accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        )
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row
    slab2, slab3 = _ring_slabs(n_dev, axis_name)

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        off = (d * h).astype(jnp.int32)
        obst_f = obst_loc.astype(jnp.float32)
        olo, ohi = slab2(obst_f, k)
        aux = prepare(obst_f, olo, ohi)

        def scal_for(par):
            return jnp.stack([jnp.int32(accel_glob), off, par]).reshape(1, 3)

        def one(g, par):
            g2, av = chunk(g, aux, scal_for(par))
            return g2, av * free_inv

        # base parity of each call continues the alternation across calls
        parities = ((jnp.arange(n_calls) * c_outer) % 2).astype(jnp.int32)
        f_out, avs = jax.lax.scan(one, f_loc, parities)
        av = avs.reshape(-1)
        if chunk_ro is not None:
            par = jnp.int32((n_calls * c_outer) % 2)
            f_out, av_ro = chunk_ro(f_out, aux, scal_for(par))
            av = jnp.concatenate([av, av_ro * free_inv])
        if chunk_rem is not None:
            hlo, hhi = slab3(f_out, rem)
            scal2 = jnp.stack([jnp.int32(accel_glob), off]).reshape(1, 2)
            aux_r = (obst_f, olo[-rem:], ohi[:rem])
            f_out, av_r = chunk_rem(f_out, hlo, hhi, aux_r, scal2)
            av = jnp.concatenate([av, av_r * free_inv])
        return f_out, jax.lax.psum(av, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def _make_padded_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    axis_name: str = AXIS,
):
    """Sharded runner for any (ny, n_devices): pad-to-divisible with masked
    dead rows (SURVEY.md §7), the static-shape counterpart of the reference's
    remainder-balanced any--np split (d2q9-bgk.c:834-862).

    The grid is padded at the end to ``rows * n_dev`` rows; dead rows are
    marked as obstacles (excluded from the av series, bounded by bounce-back)
    and initialized to the rest equilibrium. Real shards 0..L form the halo
    ring; shard L sends its *last real* row down to shard 0 (the periodic
    wrap), and the received wrap row is placed immediately after each shard's
    last real row before the pull, so row ny-1 pulls the true global row 0.
    Acceleration happens before the halo capture so the scheme stays correct
    even when global row ny-2 lands on a shard edge (the case the reference
    excludes via its last-rank >=3-rows rule).
    """
    from jax.sharding import NamedSharding

    from tpulbm.core.lattice import CX, CY, NSPEEDS, W0, W1 as LW1, W2 as LW2
    from tpulbm.core import physics
    from tpulbm.dist.sharding import padded_split

    n_dev = mesh.devices.size
    ny, nx = params.ny, params.nx
    rows, ny_pad = padded_split(ny, n_dev)
    pad = ny_pad - ny
    last = (ny - 1) // rows  # last shard holding real rows
    n_real = [min(max(ny - j * rows, 0), rows) for j in range(n_dev)]
    perm_fwd = [(j, j + 1) for j in range(last)] + [(last, 0)]
    perm_bwd = [(j + 1, j) for j in range(last)] + [(0, last)]
    idx_last_real = jnp.asarray(
        [max(r - 1, 0) for r in n_real], dtype=jnp.int32
    )
    n_real_arr = jnp.asarray(n_real, dtype=jnp.int32)
    omega = float(params.omega)
    w1 = float(params.accel_w1)
    w2 = float(params.accel_w2)
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row
    rest = jnp.asarray(
        np.array([W0, LW1, LW1, LW1, LW1, LW2, LW2, LW2, LW2], np.float32)
        * np.float32(params.density),
    )

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        r = accel_glob - d * rows
        accel_row_local = jnp.where(
            (r >= 0) & (r < rows), r, jnp.int32(-1)
        ).astype(jnp.int32)
        nr = n_real_arr[d]
        send_idx = idx_last_real[d]

        def one_step(f, _):
            f = step_local.accelerate_local(f, obst_loc, accel_row_local, w1, w2)
            last_real = jax.lax.dynamic_slice_in_dim(f, send_idx, 1, axis=1)
            halo_lo = jax.lax.ppermute(last_real[:, 0, :], axis_name, perm_fwd)
            halo_hi = jax.lax.ppermute(f[:, 0, :], axis_name, perm_bwd)
            ext = jnp.concatenate(
                [halo_lo[:, None, :], f, halo_hi[:, None, :]], axis=1
            )
            # Wrap row placed right after the last real row (a no-op for full
            # shards, where 1 + nr is already the bottom-halo slot).
            ext = jax.lax.dynamic_update_slice_in_dim(
                ext, halo_hi[:, None, :], 1 + nr, axis=1
            )
            t = [
                jnp.roll(ext[k, 1 - CY[k] : 1 - CY[k] + rows, :], CX[k], axis=1)
                for k in range(NSPEEDS)
            ]
            out, speed = physics.collide(t, obst_loc, omega)
            return jnp.stack(out), jnp.sum(speed, dtype=jnp.float32) * free_inv

        f_out, av_local = jax.lax.scan(one_step, f_loc, None, length=n_steps)
        return f_out, jax.lax.psum(av_local, axis_name)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        check_vma=False,
    )
    f_spec = NamedSharding(mesh, P(None, axis_name, None))
    o_spec = NamedSharding(mesh, P(axis_name, None))

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        # Dead rows: rest equilibrium (strictly positive, so densities stay
        # positive under pure bounce-back) and obstacle-masked.
        f_pad = jnp.concatenate(
            [f, jnp.broadcast_to(rest[:, None, None], (NSPEEDS, pad, nx))],
            axis=1,
        )
        obst_pad = jnp.pad(
            obstacles, ((0, pad), (0, 0)), constant_values=True
        )
        f_pad = jax.lax.with_sharding_constraint(f_pad, f_spec)
        obst_pad = jax.lax.with_sharding_constraint(obst_pad, o_spec)
        f_out, av = sharded(f_pad, obst_pad)
        return f_out[:, :ny, :], av

    return runner


_XPAD = 128  # lane-aligned x-halo pad of the torus kstep local block


def _make_runner_2d_kstep(params: LBMParams, n_steps: int, mesh: Mesh, k: int):
    """Pallas K-step compute on the 2-D ('y', 'x') torus mesh.

    Each shard owns an (h, w) block. Every K steps it runs the corner-carrying
    two-phase slab exchange at K-step granularity — K-wide column slabs over
    the x ring (delivered to the kernel as lane-aligned 128-wide margin
    arrays), then K-row slabs of the x-extended row band over the y ring —
    and advances K fused steps with the kstep window kernel in ``x_halo``
    mode: the window is assembled from three DMA pieces (left margin, block,
    right margin) directly in VMEM, so no x-extended copy of the block is
    ever materialized in HBM, and the compute runs on a narrow w+2K slice
    (see pallas_kstep.make_kstep x_halo).

    This turns the decomposition the reference's report declined for layout
    reasons (report.odt "MPI Design") into a fused-kernel path: 2 collectives
    per K steps instead of 2 per step, and one HBM pass per K steps.
    """
    from tpulbm.ops import pallas_kstep

    ay, ax = mesh.axis_names
    dy, dx = mesh.devices.shape
    h = validate_even_split(params.ny, dy)
    w = validate_even_col_split(params.nx, dx)
    n_outer, rem = divmod(n_steps, k)
    mk = functools.partial(
        pallas_kstep.make_kstep,
        h, w, ny_global=params.ny, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        x_halo=True,
    )
    prepare, chunk_k = mk(k_steps=k)
    chunk_r = mk(k_steps=rem)[1] if rem else None
    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row
    perm = {
        a: (
            [(i, (i + 1) % n) for i in range(n)],
            [(i, (i - 1) % n) for i in range(n)],
        )
        for a, n in ((ay, dy), (ax, dx))
    }

    def exchange(g, kk):
        """(xlo, xhi, ylo, yhi): 128-wide padded x margins holding kk valid
        halo columns, and corner-carrying kk-row y slabs of the x-extended
        band (width 128 + w + 128, matching the kernel's window)."""
        fwd, bwd = perm[ax]
        xlo = jax.lax.ppermute(
            jax.lax.slice_in_dim(g, w - kk, w, axis=-1), ax, fwd
        )
        xhi = jax.lax.ppermute(jax.lax.slice_in_dim(g, 0, kk, axis=-1), ax, bwd)
        pad = [(0, 0)] * (g.ndim - 1)
        xlo_p = jnp.pad(xlo, pad + [(_XPAD - kk, 0)])
        xhi_p = jnp.pad(xhi, pad + [(0, _XPAD - kk)])

        def band(lo, hi):
            return jnp.concatenate(
                [
                    jax.lax.slice_in_dim(xlo_p, lo, hi, axis=-2),
                    jax.lax.slice_in_dim(g, lo, hi, axis=-2),
                    jax.lax.slice_in_dim(xhi_p, lo, hi, axis=-2),
                ],
                axis=-1,
            )

        fwd, bwd = perm[ay]
        ylo = jax.lax.ppermute(band(h - kk, h), ay, fwd)
        yhi = jax.lax.ppermute(band(0, kk), ay, bwd)
        return xlo_p, xhi_p, ylo, yhi

    def body_sharded(f_loc, obst_loc):
        d = jax.lax.axis_index(ay)
        scal = jnp.stack(
            [jnp.int32(accel_glob), (d * h).astype(jnp.int32)]
        ).reshape(1, 2)
        obst_f = obst_loc.astype(jnp.float32)

        def aux_for(kk):
            oxlo, oxhi, oylo, oyhi = exchange(obst_f, kk)
            return prepare(obst_f, oylo, oyhi, oxlo, oxhi)

        aux_k = aux_for(k)

        def one(g, _):
            xlo, xhi, ylo, yhi = exchange(g, k)
            g2, av = chunk_k(g, ylo, yhi, aux_k, scal, xlo, xhi)
            return g2, av * free_inv

        f_out, avs = jax.lax.scan(one, f_loc, None, length=n_outer)
        av = avs.reshape(-1)
        if chunk_r is not None:
            xlo, xhi, ylo, yhi = exchange(f_out, rem)
            f_out, av_r = chunk_r(f_out, ylo, yhi, aux_for(rem), scal, xlo, xhi)
            av = jnp.concatenate([av, av_r * free_inv])
        return f_out, jax.lax.psum(jax.lax.psum(av, ay), ax)

    sharded = jax.shard_map(
        body_sharded,
        mesh=mesh,
        in_specs=(P(None, ay, ax), P(ay, ax)),
        out_specs=(P(None, ay, ax), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def _make_kstep_strips_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    k: int,
    bx: int = 1024,
    by: int = 32,
    fused: bool = True,
):
    """Single-device wide grids as column STRIPS: band-major state
    ((NS, 9, H, BX)), strip-edge x margins materialized per K-chunk as
    lane-aligned 128-wide pads, corner-carrying self-wrap y slabs, and the
    1-D kernel's row machinery (row-overlap DMA reuse + exact bottom-margin
    substitution) down each strip. ``fused=True`` (default) runs ONE
    pallas_call whose grid spans (strips, row blocks) with row blocks
    innermost — the pipeline never drains between strips
    (ops/pallas_kstep_strips.py); ``fused=False`` is the per-strip-call
    variant over the x_halo 1-D kernel (measured 1.38x slower — kept as
    the A/B baseline, docs/measurements/round2.md)."""
    from tpulbm.ops import pallas_kstep, pallas_kstep_strips
    from tpulbm.ops import pallas_kstep_bands as pkb

    assert mesh.devices.size == 1
    h = params.ny
    ns = params.nx // bx
    n_outer, rem = divmod(n_steps, k)
    if fused:
        mk = functools.partial(
            pallas_kstep_strips.make_kstep_strips, h, params.nx,
            ny_global=params.ny, omega=params.omega,
            accel_w1=params.accel_w1, accel_w2=params.accel_w2,
            bx=bx, by=by,
        )
    else:
        mk = functools.partial(
            pallas_kstep.make_kstep, h, bx, ny_global=params.ny,
            omega=params.omega, accel_w1=params.accel_w1,
            accel_w2=params.accel_w2, x_halo=True, by=by, x_narrow=False,
        )
    prepare, chunk_k = mk(k_steps=k)
    chunk_r = mk(k_steps=rem)[1] if rem else None
    free_inv = jnp.float32(params.free_cells_inv)
    scal = jnp.stack([jnp.int32(params.accel_row),
                      jnp.int32(0)]).reshape(1, 2)

    def margins(gb, kk):
        """Padded (NS, ..., 128) x margins from the strip ring; only kk
        columns are valid halo data (the kernel's contract)."""
        lo_cols = jax.lax.slice_in_dim(gb, bx - kk, bx, axis=-1)
        hi_cols = jax.lax.slice_in_dim(gb, 0, kk, axis=-1)
        xlo = jnp.concatenate([lo_cols[-1:], lo_cols[:-1]], axis=0)
        xhi = jnp.concatenate([hi_cols[1:], hi_cols[:1]], axis=0)
        pad = [(0, 0)] * (gb.ndim - 1)
        return (
            jnp.pad(xlo, pad + [(_XPAD - kk, 0)]),
            jnp.pad(xhi, pad + [(0, _XPAD - kk)]),
        )

    def bands_of(gb, xlo_p, xhi_p, lo, hi):
        # corner-carrying row slabs of the x-extended strips (self-wrap y)
        return jnp.concatenate(
            [
                jax.lax.slice_in_dim(xlo_p, lo, hi, axis=-2),
                jax.lax.slice_in_dim(gb, lo, hi, axis=-2),
                jax.lax.slice_in_dim(xhi_p, lo, hi, axis=-2),
            ],
            axis=-1,
        )

    def step_strips(gb, aux, chunk, kk):
        xlo_p, xhi_p = margins(gb, kk)
        ylo = bands_of(gb, xlo_p, xhi_p, h - kk, h)
        yhi = bands_of(gb, xlo_p, xhi_p, 0, kk)
        if fused:
            return chunk(gb, ylo, yhi, aux, scal, xlo_p, xhi_p)
        outs, avs = [], 0.0
        for b in range(ns):
            g2, av_b = chunk(gb[b], ylo[b], yhi[b], aux[b], scal,
                             xlo_p[b], xhi_p[b])
            outs.append(g2)
            avs = avs + av_b
        return jnp.stack(outs, axis=0), avs

    def aux_for(ob, kk):
        oxlo, oxhi = margins(ob, kk)
        oylo = bands_of(ob, oxlo, oxhi, h - kk, h)
        oyhi = bands_of(ob, oxlo, oxhi, 0, kk)
        if fused:
            return prepare(ob, oylo, oyhi, oxlo, oxhi)
        return [
            prepare(ob[b], oylo[b], oyhi[b], oxlo[b], oxhi[b])
            for b in range(ns)
        ]

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        gb = pkb.to_bands(f, bx)
        ob = obstacles.astype(jnp.float32).reshape(h, ns, bx).transpose(1, 0, 2)
        aux = aux_for(ob, k)

        def body(g, _):
            g2, av = step_strips(g, aux, chunk_k, k)
            return g2, av * free_inv

        gb_out, avs = jax.lax.scan(body, gb, None, length=n_outer)
        av = avs.reshape(-1)
        if chunk_r is not None:
            gb_out, av_r = step_strips(gb_out, aux_for(ob, rem), chunk_r, rem)
            av = jnp.concatenate([av, av_r * free_inv])
        return pkb.from_bands(gb_out), av

    return runner


def supported_strips(params: LBMParams, n_dev: int, k: int,
                     bx: int = 1024, by: int = 32) -> bool:
    from tpulbm.ops import pallas_kstep

    return (
        n_dev == 1
        and params.nx % bx == 0
        and params.nx > bx            # >= 2 strips for the ring
        and params.ny % by == 0
        and params.ny >= by
        and 1 <= k <= pallas_kstep.MAX_K
        and bx % 128 == 0
    )


def _make_xpad_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Mesh,
    axis_name: str = AXIS,
):
    """Periodic X-EXTENSION runner for nx % 128 != 0: pad the columns to the
    next 128-multiple with mirror copies of columns [0, padx), re-aim the
    kernels' lane-roll wrap at the true torus column in-register
    (window_step.x_wrap_patch — the lane analog of the padded row runner's
    shifted wrap slabs), mask mirrors out of the |u| series, and crop the
    output. Mirrors evolve bitwise-identically to their canonicals, so the
    result is exact — no seam recompute. Composes with the periodic row
    extension for uneven (ny, n_devices). Returns None when no x-extended
    tier takes the shape (padx >= nx, or rows/VMEM gates fail).

    Reference parity: the reference runs any nx directly on uneven C loops
    (d2q9-bgk.c:834-862); lane-tiled TPU windows need 128-multiples, so the
    extension is the TPU-native equivalent.
    """
    import dataclasses as _dc

    from tpulbm.ops import pallas_kstep, pallas_kstep_skew

    nx = params.nx
    nxp = -(-nx // 128) * 128
    padx = nxp - nx
    if padx == 0 or padx >= nx:
        return None
    xp = _dc.replace(params, nx=nxp)
    n_dev = mesh.devices.size
    inner = None
    k = min(pallas_kstep.MAX_K, n_steps)
    if params.ny % n_dev == 0:
        rows = params.ny // n_dev
        rem = n_steps % pallas_kstep_skew.SKEW_K
        skew_rem_ok = rem == 0 or pallas_kstep.supported(rows, nxp, rem)
        if (n_steps >= pallas_kstep_skew.SKEW_K and skew_rem_ok
                and pallas_kstep_skew.supported(
                    rows, nxp, pallas_kstep_skew.SKEW_K)):
            inner = _make_skew_runner(
                xp, n_steps, mesh, axis_name, canon_nx=nx)
        elif pallas_kstep.supported(rows, nxp, k):
            inner = _make_kstep_runner(
                xp, n_steps, mesh, k, axis_name, alias_donor=True,
                exact_all=True, canon_nx=nx,
            )
    if inner is None and supported_padded_kstep(xp, n_dev, k):
        # row extension handles the y side; column extension the x side
        inner = _make_kstep_runner(
            xp, n_steps, mesh, k, axis_name, alias_donor=True, padded=True,
            canon_nx=nx,
        )
    if inner is None:
        return None

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        f = jnp.concatenate([f, f[:, :, :padx]], axis=2)
        obst = jnp.concatenate([obstacles, obstacles[:, :padx]], axis=1)
        f_out, av = inner(f, obst)
        return f_out[:, :, :nx], av

    return runner


def supported_padded_kstep(params: LBMParams, n_dev: int, k: int) -> bool:
    """Whether the periodic-extension padded K-step runner takes this shape.
    Only the kernel gate remains: wrap slabs whose source rows live off the
    edge shards (pad + K > rows, or < K canonical rows on the last shard)
    are gathered from their true owners by the general multi-hop slab form
    (_make_kstep_runner slab_general)."""
    from tpulbm.dist.sharding import padded_split_aligned
    from tpulbm.ops import pallas_kstep

    rows, ny_pad = padded_split_aligned(params.ny, n_dev)
    return pallas_kstep.supported(rows, params.nx, k)


def supported_2d_kstep(params: LBMParams, mesh: Mesh, k: int) -> bool:
    from tpulbm.ops import pallas_kstep

    dy, dx = mesh.devices.shape
    if params.ny % dy or params.nx % dx:
        return False
    h = params.ny // dy
    w = params.nx // dx
    return (
        w >= 128
        and h >= 3
        and pallas_kstep.supported_x_halo(h, w, min(k, MAX_K_2D))
    )


MAX_K_2D = 8


def _make_runner_2d(params: LBMParams, n_steps: int, mesh: Mesh):
    """Runner over a 2-D ('y', 'x') torus mesh: both grid axes sharded, with
    a two-phase width-1 halo exchange per step (columns first, then rows of
    the column-extended block, so corner cells ride along) — the tiled
    decomposition the reference's report declined (report.odt "MPI Design").
    Pure-jnp local compute; pull-streaming needs no rolls at all because
    both wraps come from the ring permutations."""
    ay, ax = mesh.axis_names
    dy, dx = mesh.devices.shape
    h = validate_even_split(params.ny, dy)
    validate_even_col_split(params.nx, dx)
    from tpulbm.core.lattice import CX, CY, NSPEEDS
    from tpulbm.core import physics

    free_inv = jnp.float32(params.free_cells_inv)
    accel_glob = params.accel_row
    omega = float(params.omega)
    w1 = float(params.accel_w1)
    w2 = float(params.accel_w2)
    perm = {
        a: (
            [(i, (i + 1) % n) for i in range(n)],
            [(i, (i - 1) % n) for i in range(n)],
        )
        for a, n in ((ay, dy), (ax, dx))
    }

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(ay)
        r = accel_glob - d * h
        accel_row_local = jnp.where(
            (r >= 0) & (r < h), r, jnp.int32(-1)
        ).astype(jnp.int32)

        def one_step(f, _):
            f = step_local.accelerate_local(
                f, obst_loc, accel_row_local, w1, w2
            )
            # phase 1: x halo columns
            fwd, bwd = perm[ax]
            xlo = jax.lax.ppermute(f[:, :, -1:], ax, fwd)
            xhi = jax.lax.ppermute(f[:, :, :1], ax, bwd)
            fx = jnp.concatenate([xlo, f, xhi], axis=2)
            # phase 2: y halo rows of the x-extended block (corners included)
            fwd, bwd = perm[ay]
            ylo = jax.lax.ppermute(fx[:, -1:, :], ay, fwd)
            yhi = jax.lax.ppermute(fx[:, :1, :], ay, bwd)
            ext = jnp.concatenate([ylo, fx, yhi], axis=1)
            # pull-streaming by pure slicing — both wraps came off the rings
            hh, ww = f.shape[1], f.shape[2]
            t = [
                ext[k, 1 - CY[k] : 1 - CY[k] + hh,
                    1 - CX[k] : 1 - CX[k] + ww]
                for k in range(NSPEEDS)
            ]
            out, speed = physics.collide(t, obst_loc, omega)
            return jnp.stack(out), jnp.sum(speed, dtype=jnp.float32) * free_inv

        f_out, av_local = jax.lax.scan(one_step, f_loc, None, length=n_steps)
        av = jax.lax.psum(jax.lax.psum(av_local, ay), ax)
        return f_out, av

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, ay, ax), P(ay, ax)),
        out_specs=(P(None, ay, ax), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner


def make_runner(
    params: LBMParams,
    n_steps: int,
    mesh: Optional[Mesh] = None,
    backend: str = "auto",
    axis_name: str = AXIS,
) -> Callable:
    """Builds a jitted ``runner(f, obstacles) -> (f', av_vels)``.

    ``f`` is the global (9, ny, nx) float32 state (sharded or not — jit will
    respect/install the row sharding), ``obstacles`` the global (ny, nx) bool
    mask. ``av_vels`` is the (n_steps,) float32 series, fully reduced.

    A 2-D mesh (two axis names) selects the torus decomposition — both grid
    axes sharded; jnp compute path.
    """
    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    if len(mesh.axis_names) == 2:
        if backend == "pallas-rdma":
            raise ValueError(
                "backend='pallas-rdma' is not available on a 2-D mesh "
                "(use 'pallas', 'jnp' or 'auto')"
            )
        sel = _select_backend(backend)
        k2 = min(MAX_K_2D, n_steps)
        if sel == "pallas":
            if supported_2d_kstep(params, mesh, k2):
                return _make_runner_2d_kstep(params, n_steps, mesh, k2)
            if backend == "pallas":
                dy, dx = mesh.devices.shape
                raise ValueError(
                    f"pallas backend unsupported for torus shard shape "
                    f"({params.ny // dy if params.ny % dy == 0 else '?'}, "
                    f"{params.nx // dx if params.nx % dx == 0 else '?'})"
                )
        return _make_runner_2d(params, n_steps, mesh)
    n_dev = mesh.devices.size
    requested = backend
    backend = _select_backend(backend)
    if params.ny % n_dev != 0 or params.ny // n_dev < 3:
        if n_dev == 1:
            # ny < 3 on one device is physically degenerate; keep the error.
            validate_even_split(params.ny, n_dev)
        if backend == "pallas":
            from tpulbm.ops import pallas_kstep

            kp = min(pallas_kstep.MAX_K, n_steps)
            if supported_padded_kstep(params, n_dev, kp):
                return _make_kstep_runner(
                    params, n_steps, mesh, kp, axis_name,
                    alias_donor=True, padded=True,
                )
            r = _make_xpad_runner(params, n_steps, mesh, axis_name)
            if r is not None:
                # combined periodic row + column extension
                return r
        if requested not in ("auto", "jnp"):
            raise ValueError(
                f"backend {requested!r} does not support the shape: "
                f"ny={params.ny} over {n_dev} devices needs the "
                "periodic-extension padded K-step runner (nx % 128 == 0, "
                "pad + K <= rows) or the jnp padded path "
                "(backend='auto' or 'jnp')"
            )
        return _make_padded_runner(params, n_steps, mesh, axis_name)
    rows_local = params.ny // n_dev
    if backend == "pallas-rdma":
        from tpulbm.ops import pallas_kstep_rdma, pallas_resident_rdma

        if pallas_resident_rdma.supported(
            rows_local, params.nx,
            min(pallas_resident_rdma.MAX_K, n_steps), n_dev,
        ):
            # Shard fits VMEM: hold it there across ~512 steps per kernel
            # call, edge slabs riding ICI in-kernel (zero HBM state traffic
            # between call boundaries).
            return _make_resident_rdma_runner(params, n_steps, mesh, axis_name)
        if pallas_kstep_rdma.supported(
            rows_local, params.nx, min(pallas_kstep_rdma.MAX_K, n_steps), n_dev
        ):
            return _make_rdma_runner(params, n_steps, mesh, axis_name)
        # Graceful fallback instead of raising (r1 review item 8): the
        # ppermute-slab runner computes the identical physics.
        import sys

        print(
            f"tpulbm: pallas-rdma unsupported for local shape "
            f"({rows_local}, {params.nx}) on {n_dev} devices; falling back "
            "to the ppermute halo runner",
            file=sys.stderr,
        )
        backend = "pallas"
    if backend == "pallas":
        from tpulbm.ops import pallas_kstep, pallas_resident, pallas_step

        if n_dev == 1 and (
            pallas_resident.supported(params.ny, params.nx)
            or pallas_resident.supported_hbm(params.ny, params.nx)
        ):
            # Small grid: the whole state lives in VMEM across K fused steps
            # per kernel call — zero HBM traffic per step (HBM-edge variant
            # up to ~180K cells: chunk-boundary DMAs only).
            return _make_resident_runner(params, n_steps)
        k = min(pallas_kstep.MAX_K, n_steps)
        from tpulbm.ops import pallas_kstep2d as _pk2d_gate
        from tpulbm.ops import pallas_kstep_skew

        rem_steps = n_steps % pallas_kstep_skew.SKEW_K
        skew_rem_ok = (
            rem_steps == 0
            or pallas_kstep.supported(rows_local, params.nx, rem_steps)
            or _pk2d_gate.supported(rows_local, params.nx, rem_steps)
        )
        if (n_steps >= pallas_kstep_skew.SKEW_K and skew_rem_ok
                and pallas_kstep_skew.supported(
                    rows_local, params.nx, pallas_kstep_skew.SKEW_K)):
            # Skewed parallelogram schedule: zero margin recompute
            # (compute/owned ratio 1.0 in y) — fastest 1-D tier measured.
            return _make_skew_runner(params, n_steps, mesh, axis_name)
        from tpulbm.ops import pallas_kstep_skew_fold

        if (n_dev == 1 and n_steps >= pallas_kstep_skew_fold.FOLD_K
                and pallas_kstep_skew_fold.pick_fold(
                    params.ny, params.nx) is not None):
            # Wide grids that fold onto the 1-D window budget: evolve the
            # lane-folded (ny*F, nx/F) layout (a free reshape) — measured
            # +9.1%/+6.8% device over the 2-D tiled skew at 2048²/4096²
            # (docs/measurements/round5.md; sub-K remainder runs the folded
            # jnp oracle inside the same jit).
            return pallas_kstep_skew_fold.make_fold_runner(params, n_steps)
        if (n_dev > 1 and n_steps >= pallas_kstep_skew_fold.FOLD_K
                and n_steps % pallas_kstep_skew_fold.FOLD_K == 0
                and pallas_kstep_skew_fold.pick_fold_ring(
                    params.ny, params.nx, n_dev) is not None):
            # Fold ring: the seam-fix machinery doubles as the shard
            # boundary (one unfolded band per shard, NO main-kernel halo);
            # two slabs per chunk like the skew ring. Sub-K remainders
            # stay on the skew2d ring (the folded jnp remainder is
            # single-device-only).
            return _make_fold_ring_runner(params, n_steps, mesh, axis_name)
        from tpulbm.ops import pallas_kstep_skew2d

        if (n_steps >= pallas_kstep_skew.SKEW_K and skew_rem_ok
                and pallas_kstep_skew2d.supported(
                    rows_local, params.nx, pallas_kstep_skew.SKEW_K)):
            # Wide grids: 2-D tiled skew (y ratio 1.0, x narrow compute).
            return _make_skew_runner(
                params, n_steps, mesh, axis_name,
                maker=pallas_kstep_skew2d.make_skew2d,
            )
        if pallas_kstep.supported(rows_local, params.nx, k):
            return _make_kstep_runner(
                params, n_steps, mesh, k, axis_name, alias_donor=True,
                exact_all=True,
            )
        from tpulbm.ops import pallas_kstep2d

        if pallas_kstep2d.supported(rows_local, params.nx, k):
            # Wide grids: full rows no longer fit the VMEM window — 2-D
            # row-major tiling. Measured faster than the band-major tier in
            # every hardware window sampled so far (three same-process
            # sweeps, docs/measurements/round2.md); the bands tier remains
            # available via _make_kstep_bands_runner for tuning/A-B.
            return _make_kstep_runner(
                params, n_steps, mesh, k, axis_name,
                maker=pallas_kstep2d.make_kstep2d, exact_all=True,
            )
        from tpulbm.ops import pallas_kstep_bands

        if pallas_kstep_bands.supported(rows_local, params.nx, k):
            # Band-major layout: the main window DMA is contiguous (the x
            # torus is the band ring); covers shapes the row-major tiling
            # can't take.
            return _make_kstep_bands_runner(params, n_steps, mesh, k, axis_name)
        if supported_padded_kstep(params, n_dev, k):
            # Even split but rows not 8-aligned (e.g. ny=1001 on 1 device):
            # periodic-extension padding puts it back on the fast kernel.
            return _make_kstep_runner(
                params, n_steps, mesh, k, axis_name,
                alias_donor=True, padded=True,
            )
        r = _make_xpad_runner(params, n_steps, mesh, axis_name)
        if r is not None:
            # nx % 128 != 0: periodic column extension (exact; optionally
            # combined with the row extension) instead of the jnp cliff
            return r
        if not pallas_step.supported(rows_local, params.nx):
            if requested == "pallas":
                raise ValueError(
                    f"pallas backend unsupported for local shape "
                    f"({rows_local}, {params.nx})"
                )
            backend = "jnp"

    if backend == "pallas":
        from tpulbm.ops import pallas_step

        prepare, local_step = pallas_step.make_local_step(
            rows_local, params.nx, params.omega, params.accel_w1, params.accel_w2
        )
    elif backend == "jnp":
        omega = float(params.omega)
        w1 = float(params.accel_w1)
        w2 = float(params.accel_w2)

        def prepare(obst, accel_row):
            return obst

        def local_step(f_loc, halo_lo, halo_hi, obst, accel_row):
            return step_local.local_step_jnp(
                f_loc, halo_lo, halo_hi, obst, accel_row, omega, w1, w2
            )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    free_inv = jnp.float32(params.free_cells_inv)
    accel_row_global = params.accel_row
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    if n_dev == 1:
        # Single-device fast path: the ring degenerates to self-wrap, so the
        # halo rows are the block's own edge rows and no collectives are
        # needed. (Measured: per-step ppermute+psum through shard_map costs
        # ~300 us on a 1-device mesh — pure overhead there.) Equivalence with
        # the ring path is covered by the device-count invariance tests.
        accel_row_local = jnp.int32(accel_row_global)

        @functools.partial(jax.jit, donate_argnums=0)
        def runner_single(f, obstacles):
            aux = prepare(obstacles, accel_row_local)

            def one_step(g, _):
                f_new, tot_u = local_step(
                    g, g[:, -1, :], g[:, 0, :], aux, accel_row_local
                )
                return f_new, tot_u * free_inv

            return jax.lax.scan(one_step, f, None, length=n_steps)

        return runner_single

    def body(f_loc, obst_loc):
        d = jax.lax.axis_index(axis_name)
        r = accel_row_global - d * rows_local
        accel_row_local = jnp.where(
            (r >= 0) & (r < rows_local), r, jnp.int32(-1)
        ).astype(jnp.int32)
        aux = prepare(obst_loc, accel_row_local)

        def one_step(f, _):
            # My last interior row becomes the next device's halo_lo; my
            # first interior row becomes the previous device's halo_hi.
            halo_lo = jax.lax.ppermute(f[:, -1, :], axis_name, perm_fwd)
            halo_hi = jax.lax.ppermute(f[:, 0, :], axis_name, perm_bwd)
            f_new, tot_u = local_step(f, halo_lo, halo_hi, aux, accel_row_local)
            return f_new, tot_u * free_inv

        f_out, av_local = jax.lax.scan(one_step, f_loc, None, length=n_steps)
        av = jax.lax.psum(av_local, axis_name)
        return f_out, av

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name, None), P()),
        # pallas_call outputs carry no varying-mesh-axes annotation; skip the
        # vma check (correctness is covered by the device-count invariance
        # tests).
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        return sharded(f, obstacles)

    return runner
