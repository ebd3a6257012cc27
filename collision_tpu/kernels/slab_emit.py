"""Streaming in-kernel pair emission over a slab plan.

The 1-D counterpart of kernels/stream_emit.py: the rolled 2-offset slab
sweep (kernels/slab_sweep.py) fused with the sequential-cursor extraction
machinery (PairEmitter / extract_hits — one SMEM cursor made race-free by
the sequential Pallas grid, hits resolved with one-hot selects, pairs
double-buffer-DMAed to HBM). Emission cost is O(hits); empty windows pay
one predicate. Totals stay exact past capacity (collision.cl:203-207
contract) with the f32 anti-wrap guard.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..columns import CHUNK, LANE
from ..slabs import SLAB_OFFSETS, SlabPlan
from .stream_emit import (
    _FLUSH, NO_PAIR, PairEmitter, extract_hits, pack_mask_words,
)


def _make_slab_fill_kernel(gx, mc, slab_rows, rpw, capacity,
                           direct_stream):
    """capacity must be a positive multiple of 2 * _FLUSH (caller pads)."""

    def kernel(starts_ref, r0_ref, w0_ref, wcap_ref, stream_ref,
               out_a, out_b, total_ref, totf_ref, *scratch):
        if direct_stream:
            cur, curf = scratch
            bufs = sems = stag_a = stag_b = fsem = None
        else:
            bufs, sems, stag_a, stag_b, fsem, cur, curf = scratch
        x = pl.program_id(0)
        emitter = PairEmitter(out_a, out_b, stag_a, stag_b, fsem, cur,
                              capacity, direct_stream)

        if not direct_stream:
            def start_slab(s, slot):
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[s], slab_rows)],
                    bufs.at[slot], sems.at[slot]).start()

            @pl.when(x == 0)
            def _init_dma():
                start_slab(0, 0)
                start_slab(1, 1)
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[0], slab_rows)],
                    bufs.at[0], sems.at[0]).wait()

            pltpu.make_async_copy(
                stream_ref.at[pl.ds(r0_ref[x + 1], slab_rows)],
                bufs.at[(x + 1) % 3], sems.at[(x + 1) % 3]).wait()

            @pl.when(x + 2 <= gx)
            def _prefetch():
                start_slab(x + 2, (x + 2) % 3)

        @pl.when(x == 0)
        def _init():
            emitter.init()
            cur[2] = 0
            curf[0] = 0.0

        lane_i = emitter.lane_i
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)

        def read_win(dx, g):
            """[8, 128] full components of spheres g..g+127, lane-rolled."""
            lrow = g // LANE
            lane0 = g % LANE
            if direct_stream:
                lr = jnp.clip(lrow, 0, stream_ref.shape[0] - 2)
                two = stream_ref[pl.ds(lr, 2)]
            else:
                slot = jax.lax.rem(x + dx, 3)
                lr = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - 2)
                two = bufs[slot, pl.ds(lr, 2)]
            rolled = pltpu.roll(two, -lane0, 2)
            return jnp.where(iota8 < LANE - lane0, rolled[0], rolled[1])

        a0 = starts_ref[x]
        a1 = starts_ref[x + 1]
        nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)

        def k_body(k, acc):
            g0 = a0 + k * CHUNK
            alen = jnp.minimum(a1 - g0, CHUNK)
            a8 = read_win(0, g0)
            aT = jnp.swapaxes(a8, 0, 1)              # [128, 8]
            aT6 = jnp.where(sub_full < alen, aT[:, :6], jnp.inf)
            axlo = aT6[:CHUNK, 0:1]
            aylo = aT6[:CHUNK, 1:2]
            azlo = aT6[:CHUNK, 2:3]
            axhi = aT6[:CHUNK, 3:4]
            ayhi = aT6[:CHUNK, 4:5]
            azhi = aT6[:CHUNK, 5:6]
            a_ids = jax.lax.bitcast_convert_type(
                aT[:CHUNK, 6:7], jnp.int32)          # [64, 1]
            tbase = k * 2

            for off, dx in enumerate(SLAB_OFFSETS):
                w0 = w0_ref[0, 0, tbase + off]
                wcap = wcap_ref[0, 0, tbase + off]
                for r in range(rpw):
                    b8 = read_win(dx, w0 + r * LANE)
                    jrel = r * LANE + lane_i
                    m = (axhi > b8[0:1, :]) & (axlo < b8[3:4, :])
                    m &= (ayhi > b8[1:2, :]) & (aylo < b8[4:5, :])
                    m &= (azhi > b8[2:3, :]) & (azlo < b8[5:6, :])
                    m &= jrel < wcap
                    if dx == 0:
                        m &= w0 + jrel > g0 + sub_c
                    b_ids = jax.lax.bitcast_convert_type(
                        b8[6:7, :], jnp.int32)       # [1, 128]

                    cnt = jnp.sum(m, dtype=jnp.int32)
                    acc = (acc[0] + cnt, acc[1] + cnt.astype(jnp.float32))

                    # Only windows with hits pay the pack + extraction;
                    # the register totals above stay exact regardless
                    # (count-past-capacity contract).
                    @pl.when(cnt > 0)
                    def _extract():
                        W0 = pack_mask_words(m)
                        trip = jnp.clip(emitter.remaining(), 0, cnt)
                        extract_hits(W0, trip, emitter, a_ids, b_ids,
                                     lane_i, sub_c)
            return acc

        acc = jax.lax.fori_loop(
            0, nchunks, k_body, (jnp.int32(0), jnp.float32(0.0)))
        cur[2] = cur[2] + acc[0]
        curf[0] = curf[0] + acc[1]

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cur[2]
            totf_ref[0] = curf[0]
            emitter.finish()

    return kernel


def slab_fill_pairs(plan: SlabPlan, capacity, rpw=1, interpret=False):
    """(ida[capacity], idb[capacity], total u32, no_overflow bool).

    In-kernel streaming emission over a slab plan. Exact iff
    ``plan.ok & (plan.rows_rolled <= rpw)`` (callers AND those in) and
    the returned ``no_overflow``; slots past min(total, capacity) hold
    NO_PAIR. Deterministic ascending sweep order.
    """
    cap_pad = max(-(-int(capacity) // (2 * _FLUSH)) * (2 * _FLUSH),
                  2 * _FLUSH)
    ida, idb, total, no_ovf = _slab_fill(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap,
        plan.gx, plan.mc, plan.slab_rows, rpw, cap_pad, interpret)
    return ida[:capacity], idb[:capacity], total, no_ovf


@partial(jax.jit, static_argnames=(
    "gx", "mc", "slab_rows", "rpw", "capacity", "interpret"))
def _slab_fill(stream, starts, slab_r0, w0_tab, wcap_tab,
               gx, mc, slab_rows, rpw, capacity, interpret=False):
    direct = bool(interpret)
    kernel = _make_slab_fill_kernel(gx, mc, slab_rows, rpw, capacity,
                                    direct)
    cap_rows = capacity // LANE

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # slab_r0
        pl.BlockSpec((1, 1, mc * 2), lambda s: (s, 0, 0),
                     memory_space=pltpu.SMEM),                 # w0
        pl.BlockSpec((1, 1, mc * 2), lambda s: (s, 0, 0),
                     memory_space=pltpu.SMEM),                 # wcap
        pl.BlockSpec(memory_space=pltpu.VMEM if direct else pl.ANY),
    ]
    out_space = pltpu.VMEM if direct else pltpu.ANY
    scratch = [pltpu.SMEM((3,), jnp.int32), pltpu.SMEM((1,), jnp.float32)]
    if not direct:
        scratch = [
            pltpu.VMEM((3, slab_rows, 8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((2 * (_FLUSH // LANE), LANE), jnp.int32),
            pltpu.VMEM((2 * (_FLUSH // LANE), LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] + scratch

    out_a, out_b, total, totf = pl.pallas_call(
        kernel,
        grid=(gx,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=out_space),
            pl.BlockSpec(memory_space=out_space),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((cap_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, slab_r0,
      w0_tab.reshape(gx, 1, mc * 2), wcap_tab.reshape(gx, 1, mc * 2),
      stream)

    out_a = jax.lax.bitcast_convert_type(out_a, jnp.uint32)
    out_b = jax.lax.bitcast_convert_type(out_b, jnp.uint32)
    total_u = total[0].astype(jnp.uint32)
    live = jnp.arange(capacity, dtype=jnp.uint32) \
        < jnp.minimum(total_u, jnp.uint32(capacity))
    ida = jnp.where(live, out_a.reshape(-1), jnp.uint32(NO_PAIR))
    idb = jnp.where(live, out_b.reshape(-1), jnp.uint32(NO_PAIR))
    no_ovf = totf[0] < float(2 ** 31 - 2 ** 26)
    return ida, idb, total_u, no_ovf
