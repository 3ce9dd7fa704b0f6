"""Row-merged skewed K-step runner (round-5 verdict item 6).

The unaligned-deck layout escape: decks whose nx is not a 128-multiple
(320², 448², …) currently run via the periodic column extension — mirror
columns that are provably bound at 83-88 % of the aligned neighbour's
speed (BENCHMARKS.md tier sweep). Merging G consecutive physical rows into
one wide row, (ny, nx) -> (ny/G, W = G*nx) — a free reshape (ops/fold.py
merge family) — makes 320² an exactly lane-aligned (160, 640) grid with
ZERO dead compute.

The merged stencil (one combined lane roll per channel + a boundary-block
row carry + G x-wrap lane patches; window_step.merged_stream_channel)
keeps the dependence cone at 1 merged row/step, so the UNCHANGED skewed
zero-recompute schedule of ops/pallas_kstep_skew carries it: this module
only wires ``make_skew(merge_g=G, phys_nx=nx, accel_block=…)`` — the
fused seam fix included — into a single-device runner (donor-aliased scan
ping-pong, jnp-merged remainder), mirroring make_fold_runner.

Reference parity: same fused accelerate+propagate+collide+av semantics
(d2q9-bgk.c:442-704); the merge changes only the layout, never a cell's
arithmetic — state output is bitwise the jnp oracle's under the merge
(tests/test_pallas_merge.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpulbm.core.lattice import NSPEEDS  # noqa: F401  (re-export convention)
from tpulbm.ops import pallas_kstep_skew as pks
from tpulbm.ops import fold as fold_mod


def supported(ny: int, nx: int, G: int, k: int = pks.SKEW_K) -> bool:
    """The merged (ny/G, G*nx) shape must ride the 1-D skew tier with its
    in-kernel monolithic seam fix."""
    if G < 2 or G > 8 or ny % G or (nx * G) % 128:
        return False
    h, W = ny // G, nx * G
    return W <= pks.MONO_FIX_NX_MAX and pks.supported(h, W, k)


def pick_merge(ny: int, nx: int, k: int = pks.SKEW_K) -> Optional[int]:
    """Smallest merge depth aligning the lanes; None when no G works (or
    nx is already lane-aligned — the plain tiers are strictly better)."""
    if nx % 128 == 0:
        return None
    for G in (2, 4, 8):
        if supported(ny, nx, G, k):
            return G
    return None


def make_merge_runner(
    params,
    n_steps: int,
    G: Optional[int] = None,
    by: Optional[int] = None,
    collide_split: int = 1,
    interpret: Optional[bool] = None,
    alias_donor: bool = True,
):
    """Single-device runner over the merged skew kernel: physical
    ``(f, obstacles) -> (f', av[n_steps])``, donor-aliased scan ping-pong
    like dist/runner._make_skew_runner's single-device fused path. A sub-K
    remainder runs the merged jnp oracle (ops/fold.lbm_step_merged) —
    bitwise, paid once."""
    ny, nx = params.ny, params.nx
    if G is None:
        G = pick_merge(ny, nx) or 0
    if not supported(ny, nx, G):
        raise ValueError(f"merge runner unsupported for ({ny}, {nx}) G={G}")
    k = pks.SKEW_K
    h = ny // G
    W = nx * G
    n_outer, rem = divmod(n_steps, k)
    mk = functools.partial(
        pks.make_skew,
        h, W, k, ny_global=h, omega=params.omega,
        accel_w1=params.accel_w1, accel_w2=params.accel_w2,
        by=by, collide_split=collide_split, interpret=interpret,
        fused_fix=True, self_band=True, top_local=True,
        fix_collide_split=max(1, W // 1024),
        merge_g=G, phys_nx=nx, accel_block=params.accel_row % G,
    )
    if alias_donor and n_outer >= 2:
        _, chunk_k = mk(alias_donor=True)
        _, chunk_plain = mk()
    else:
        alias_donor = False
        _, chunk_plain = mk()
        chunk_k = None
    free_inv = jnp.float32(params.free_cells_inv)
    a_row_m = params.accel_row // G
    fix_base = (h - 2 * k) % h
    scal3 = jnp.asarray([[a_row_m, 0, fix_base]], dtype=jnp.int32)

    @functools.partial(jax.jit, donate_argnums=0)
    def runner(f, obstacles):
        m = fold_mod.merge(f, G)
        om_bool = fold_mod.merge(obstacles, G)
        om = om_bool.astype(jnp.float32)
        oband = jnp.concatenate([om[h - 2 * k :], om[: 2 * k]], axis=0)

        def do_chunk(mc, donor):
            if donor is None:
                return chunk_plain(mc, om, oband, scal3)
            return chunk_k(mc, om, oband, scal3, donor)

        m_out = m
        if alias_donor:
            n_pairs, odd = divmod(n_outer, 2)
            av_head = None
            if odd:
                m_out, av0 = do_chunk(m, None)
                av_head = av0 * free_inv

            def body(carry, _):
                mc, scratch = carry
                t1, av1 = do_chunk(mc, scratch)
                t2, av2 = do_chunk(t1, mc)
                return (t2, t1), jnp.concatenate([av1, av2]) * free_inv

            (m_out, _), avs = jax.lax.scan(
                body, (m_out, jnp.zeros_like(m)), None, length=n_pairs)
            av = avs.reshape(-1)
            if av_head is not None:
                av = jnp.concatenate([av_head, av])
        else:
            def body(mc, _):
                m2, av_c = do_chunk(mc, None)
                return m2, av_c * free_inv

            m_out, avs = jax.lax.scan(body, m_out, None, length=n_outer)
            av = avs.reshape(-1)
        if rem:
            # remainder keeps the CHUNKS' equilibrium formulation (the
            # kernel remainder convention of every other tier)
            from tpulbm.ops import window_step

            ps = window_step.PAIR_SYMMETRIC_DEFAULT

            def rbody(mc, _):
                m2, av1 = fold_mod.lbm_step_merged(
                    mc, om_bool, params, G, nx, pair_symmetric=ps)
                return m2, av1

            m_out, av_r = jax.lax.scan(rbody, m_out, None, length=rem)
            av = jnp.concatenate([av, av_r]) if n_outer else av_r
        return fold_mod.unmerge(m_out, G), av

    return runner
