"""Pallas slab-sweep count kernel: 2-offset banded window tests.

The 1-D counterpart of kernels/sweep.py's rolled count kernel, consuming
a :class:`~collision_tpu.slabs.SlabPlan`. Per 64-sphere chunk only two
window tiles are tested (self with the ``j > i`` dedup mask, and slab
x+1) instead of the 2-D engine's five — and the slab config widens each
z-window toward a full 128 lanes, so the same ~100-vreg-op row tile
covers ~2.5x more true candidates (slabs.py cost model). All reads are
lane-rolled: coverage is ``ceil(window/128)`` rows regardless of
alignment (plan.rows_rolled bounds the static ``rpw`` knob; the host
escalates on overflow — pairs are never silently dropped).

Contract parity: exact unordered unique pairs, strict-overlap semantics
(collision.cl:164-166); int32 totals carry a parallel f32 sum so a wrap
near 2^31 pairs is detected, strictly better than the reference's
uint32 atomic counter (collision.cl:203).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..columns import CHUNK, LANE
from ..slabs import SLAB_OFFSETS, SlabPlan


#: Stream rows per diagonal-kernel grid block. slabs._plan_from_sorted
#: rounds the stream's row count so every block has a full successor
#: block (the kernel reads blocks i and i+1).
DIAG_B = 32

#: Default diagonal span of :func:`slab_count_diag`. Uniform scenes at
#: the default slab config have per-sphere sorted-index reach of
#: ~slack/2 = 12 positions (plan slack 24), so 48 covers an 8-sigma
#: Poisson excursion; anything past it trips the in-kernel detector
#: (ok=False -> host retry), never a silent miss.
DEFAULT_DIAG = 48


def _make_diag_kernel(B, d_max):
    """Diagonal pair-count kernel: all pairs (i, i + d), 1 <= d <= d_max.

    Self-slab pairs cluster within a few dozen sorted positions (the
    sort is (x_slab, z): a sphere's partners sit next to it), so
    instead of chunk windows this kernel tests *static diagonals*: a
    block of B aligned stream rows against itself shifted by d lanes —
    one select + one lane-roll per component per diagonal, no
    transposes and no dynamic slices at all. Pairs are counted by pure
    index distance: same-slab and adjacent-slab alike (non-adjacent
    slabs can never overlap — slab width >= 2*r_max), each exactly once
    (d >= 1 is the j > i dedup).

    The companion windowed cross pass and residual jobs carry the
    ``j > i + d_max`` mask, so coverage partitions exactly; the one
    class nobody covers — same-slab pairs at distance > d_max — is
    *detected*: at diagonal d_max + 1 any lane whose z-low sits within
    ``thr`` of the a-side z-high in the same slab flags ok=False
    (z is slab-sorted, so distance-(d_max+1) z-separation bounds all
    farther partners). Mirrors the reference's count-past-capacity
    honesty (collision.cl:203-207) at the geometric level.
    """
    def kernel(thr_ref, a_ref, b_ref, total_ref, totf_ref, flag_ref,
               cursor, cursor_f, cflag):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            cursor[0] = 0
            cursor_f[0] = 0.0
            cflag[0] = 0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)

        # Component tiles of this block and their 1/2-row-shifted forms
        # (rows borrowed from block i+1); comps 0..5 are the AABB, 7 is
        # the slab id (slabs.py channel 7).
        comps = (0, 1, 2, 3, 4, 5, 7)
        A = {c: a_ref[:, c, :] for c in comps}
        nq = (d_max + 1) // LANE + 1
        sh = {c: [A[c]] for c in comps}
        for q in range(1, nq + 1):
            for c in comps:
                sh[c].append(jnp.concatenate(
                    [A[c][q:], b_ref[0:q, c, :]], axis=0))

        def shifted(c, d):
            """[B, 128] tile of component c at sorted offset +d."""
            q, s = divmod(d, LANE)
            if s == 0:
                return sh[c][q]
            w = jnp.where(lane_i < s, sh[c][q + 1], sh[c][q])
            return pltpu.roll(w, LANE - s, 1)

        acc = jnp.zeros((B, LANE), jnp.int32)
        for d in range(1, d_max + 1):
            m = (A[3] > shifted(0, d)) & (A[0] < shifted(3, d))
            m &= (A[4] > shifted(1, d)) & (A[1] < shifted(4, d))
            m &= (A[5] > shifted(2, d)) & (A[2] < shifted(5, d))
            acc = acc + jnp.where(m, 1, 0)
        cursor[0] = cursor[0] + jnp.sum(acc, dtype=jnp.int32)
        cursor_f[0] = cursor_f[0] + jnp.sum(
            acc.astype(jnp.float32), dtype=jnp.float32)

        # Missed-pair detector at distance d_max + 1. Pad rows carry
        # +inf z, so "inf < inf + thr" never flags them.
        dd = d_max + 1
        fm = (shifted(7, dd) == A[7]) \
            & (shifted(2, dd) < A[5] + thr_ref[0])
        cflag[0] = cflag[0] + jnp.sum(jnp.where(fm, 1, 0),
                                      dtype=jnp.int32)

        @pl.when(i == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]
            totf_ref[0] = cursor_f[0]
            flag_ref[0] = cflag[0]

    return kernel


@partial(jax.jit, static_argnames=("d_max", "interpret"))
def diag_count(stream, diag_thr, d_max=DEFAULT_DIAG, interpret=False):
    """(count, count_f32, flagged) over all pairs (i, i+d), d <= d_max.

    ``flagged`` > 0 means some same-slab pair beyond ``d_max`` may
    exist — the result is then a lower bound and the caller must retry
    (wider diagonals, more slabs, or the windowed self sweep).
    """
    Rp = stream.shape[0]
    nblocks = Rp // DIAG_B - 1
    kernel = _make_diag_kernel(DIAG_B, d_max)
    total, totf, flag = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((DIAG_B, 8, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIAG_B, 8, LANE), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(diag_thr, stream, stream)
    return total[0], totf[0], flag[0]


def _make_slab_kernel(gx, mc, slab_rows, rpw, direct_stream, unroll=1,
                      offsets=SLAB_OFFSETS, dmin=0):
    # Chunks sharing one a-side read + [aw*64, 6] transpose. The
    # transpose is the sweep's dominant machinery (exp_r3_strip.py);
    # QUAD pairing (4 chunks per 3-row read) measured 3.68 vs 5.27 ms
    # sweep-only at 1M/gx=125 (benchmarks/exp_r4_sweepvar.py, counts
    # matched). A 3-row read never clips live data because plan.ok
    # requires max_slab + 2 <= slab_rows (slabs.py) — same exact-iff-ok
    # contract. Retry rungs with rpw > 1 keep the 2-chunk pairing so the
    # statically inlined row-test count stays bounded (2 chunks x
    # |offsets| x rpw; see the scoped-VMEM note at the unroll cap).
    aw = 4 if rpw == 1 else 2
    arows = aw // 2 + 1

    def kernel(starts_ref, r0_ref, w0_ref, wcap_ref, stream_ref,
               total_ref, totf_ref, *scratch):
        if direct_stream:
            cursor, cursor_f = scratch
            bufs = sems = None
        else:
            bufs, sems, cursor, cursor_f = scratch
        x = pl.program_id(0)

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

            # Slab x+1 first becomes visible here; slab x was already
            # waited on at step x-1 (or in the init block above).
            pltpu.make_async_copy(
                stream_ref.at[pl.ds(r0_ref[x + 1], slab_rows)],
                bufs.at[(x + 1) % 3], sems.at[(x + 1) % 3]).wait()

            @pl.when(x + 2 <= gx)
            def _prefetch():
                start_slab(x + 2, (x + 2) % 3)

        @pl.when(x == 0)
        def _init():
            cursor[0] = 0
            cursor_f[0] = 0.0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        aw_full = jax.lax.broadcasted_iota(jnp.int32, (aw * CHUNK, 1), 0)
        iota6 = jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)

        def read_win(dx, g, rows=2):
            """[6, (rows-1)*128]: test components of spheres
            g..g+(rows-1)*128-1 (lane-rolled so sphere g is at lane 0),
            from the slab holding x+dx."""
            lrow = g // LANE
            lane0 = g % LANE
            if direct_stream:
                lr = jnp.clip(lrow, 0, stream_ref.shape[0] - rows)
                win = stream_ref[pl.ds(lr, rows), pl.ds(0, 6), :]
            else:
                slot = jax.lax.rem(x + dx, 3)
                lr = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - rows)
                win = bufs[slot, pl.ds(lr, rows), pl.ds(0, 6), :]
            rolled = pltpu.roll(win, -lane0, 2)
            first = jnp.where(iota6 < LANE - lane0, rolled[0], rolled[1])
            if rows == 2:
                return first
            mid = jnp.where(iota6 < LANE - lane0, rolled[1], rolled[2])
            return jnp.concatenate([first, mid], axis=1)

        a0 = starts_ref[x]
        a1 = starts_ref[x + 1]
        nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)
        ngroups = (nchunks + aw - 1) // aw

        def pair_tests(kk, acc):
            # One stream row holds TWO chunks, so one rolled a-read and
            # ONE transpose serve ``aw`` chunks (2 rows -> 2 chunks, or
            # 3 rows -> 4 chunks in the quad headline shape). The strip
            # microbench (exp_r3_strip.py) measured that transpose as
            # the sweep's dominant machinery (3.6 of 5.8 ms at 1M) and
            # the dynamic a-read+roll as the next (~2.6 ms) — sharing
            # divides both by aw/2.
            g0 = a0 + kk * (aw * CHUNK)
            alen = jnp.minimum(a1 - g0, aw * CHUNK)
            a6 = read_win(0, g0, rows=arows)
            aT = jnp.swapaxes(a6, 0, 1)
            # Rows past the chunk -> +inf lows: the strict test can never
            # pass (subsumes an explicit a-validity mask; dead unroll
            # slots with alen <= 0 vanish the same way).
            aT = jnp.where(aw_full < alen, aT, jnp.inf)

            for sub in range(aw):
                k = kk * aw + sub
                g0s = g0 + sub * CHUNK
                s0 = sub * CHUNK
                axlo = aT[s0:s0 + CHUNK, 0:1]
                aylo = aT[s0:s0 + CHUNK, 1:2]
                azlo = aT[s0:s0 + CHUNK, 2:3]
                axhi = aT[s0:s0 + CHUNK, 3:4]
                ayhi = aT[s0:s0 + CHUNK, 4:5]
                azhi = aT[s0:s0 + CHUNK, 5:6]
                # Dead slots clamp the SMEM table read into range (their
                # window values are real but the all-inf a side kills m).
                # One caveat when a slab OVERFLOWED col_capacity
                # (plan.ok=False) and mc is not a multiple of the group
                # width: the grouped loop then tests live lanes of
                # chunks >= mc against chunk mc-1's clamped window,
                # which can OVERcount — acceptable because a
                # plan.ok=False result is discarded and retried by the
                # host (the exact-iff-ok contract).
                tbase = jnp.minimum(k, mc - 1) * 2

                for dx in offsets:
                    # Window tables are laid out by SLAB_OFFSETS
                    # position, independent of which offsets this
                    # kernel runs.
                    off = SLAB_OFFSETS.index(dx)
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]
                    for r in range(rpw):
                        b6 = read_win(dx, w0 + r * LANE)
                        jrel = r * LANE + lane_i
                        m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                        m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                        m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                        m &= jrel < wcap
                        if dx == 0 or dmin:
                            # Index-distance dedup: j > i + dmin (plain
                            # j > i intra-slab when dmin == 0; w0 >= g0
                            # by the plan's self-window clip). With
                            # dmin > 0 it also excludes the diagonal
                            # pass's pairs from cross windows.
                            m &= w0 + jrel > g0s + sub_c + dmin
                        c = jnp.where(m, 1, 0)
                        fold = c[0:8]
                        for f in range(8, CHUNK, 8):
                            fold = fold + c[f:f + 8]
                        acc = acc + fold
            return acc

        if unroll == 1:
            acc = jax.lax.fori_loop(
                0, ngroups, pair_tests, jnp.zeros((8, LANE), jnp.int32))
        else:
            # Static unrolling lets Mosaic software-pipeline the
            # dynamic-slice reads across pairs: the rolled sweep
            # measured per-chunk *overhead* bound (~380 cycles/chunk at
            # any rpw — row tests are nearly free next to the loop
            # carry), so fewer, fatter iterations are the lever.
            def g_body(g, acc):
                for t in range(unroll):
                    acc = pair_tests(g * unroll + t, acc)
                return acc

            acc = jax.lax.fori_loop(
                0, (ngroups + unroll - 1) // unroll, g_body,
                jnp.zeros((8, LANE), jnp.int32))
        cursor[0] = cursor[0] + jnp.sum(acc, dtype=jnp.int32)
        cursor_f[0] = cursor_f[0] + jnp.sum(
            acc.astype(jnp.float32), dtype=jnp.float32)

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]
            totf_ref[0] = cursor_f[0]

    return kernel


#: Default pair-loop unroll (the kernel walks chunk PAIRS — one stream
#: row each). The rolled sweep is per-chunk *overhead* bound (~380
#: cycles/chunk at any rpw on v5e — the row tests are nearly free next
#: to the loop carry); unrolling lets Mosaic pipeline the dynamic-slice
#: reads across pairs. Measured at 1M/gx=128 pre-pairing: chunk unroll
#: 1/2/4/8 -> 6.3/5.4/4.2/6.0 ms sweep (4 = 2 pairs the sweet spot).
#: Post-pairing, full-step times at pair unroll 1/2/4 were
#: indistinguishable within the session's ~0.8 ms variance
#: (results_v5e_round3.jsonl; benchmarks/exp_r3_pair.py measures each
#: unroll's full step), so 1 is kept for the smallest kernel.
UNROLL = 1


def _make_slab_masks_kernel(gx, mc, slab_rows, rpw, kg, direct_stream,
                            unroll=1):
    """Mask-emitting slab sweep: the 2-offset analog of
    kernels/sweep.py's masks kernel. Each row-tile's [CHUNK, 128]
    overlap mask is bit-packed into two uint32 lane-rows and written to
    a per-(slab, chunk-group) HBM block — the input to the sparse
    mask-fill emission (fill.py). Unvisited tile slots stay zero."""
    # Same QUAD pairing as the count kernel: at rpw=1 four chunks share
    # one 3-row a-read + transpose (safe iff plan.ok — see
    # _make_slab_kernel; mask_groups keeps kg a multiple of 4 so quad
    # groups always divide the chunk range).
    aw = 4 if rpw == 1 else 2
    arows = aw // 2 + 1

    def kernel(starts_ref, r0_ref, w0_ref, wcap_ref, stream_ref,
               out_ref, *scratch):
        if direct_stream:
            bufs = sems = None
        else:
            bufs, sems = scratch
        x = pl.program_id(0)
        g = pl.program_id(1)

        if not direct_stream:
            def start_slab(s, slot):
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[s], slab_rows)],
                    bufs.at[slot], sems.at[slot]).start()

            @pl.when((x == 0) & (g == 0))
            def _init_dma():
                start_slab(0, 0)
                start_slab(1, 1)
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[0], slab_rows)],
                    bufs.at[0], sems.at[0]).wait()

            @pl.when(g == 0)
            def _ring_step():
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[x + 1], slab_rows)],
                    bufs.at[(x + 1) % 3], sems.at[(x + 1) % 3]).wait()

                @pl.when(x + 2 <= gx)
                def _prefetch():
                    start_slab(x + 2, (x + 2) % 3)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        aw_full = jax.lax.broadcasted_iota(jnp.int32, (aw * CHUNK, 1), 0)
        iota6 = jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)
        shift = jax.lax.broadcasted_iota(
            jnp.uint32, (CHUNK, LANE), 0) % 32

        def read_win(dx, gidx, rows=2):
            lrow = gidx // LANE
            lane0 = gidx % LANE
            if direct_stream:
                lr = jnp.clip(lrow, 0, stream_ref.shape[0] - rows)
                win = stream_ref[pl.ds(lr, rows), pl.ds(0, 6), :]
            else:
                slot = jax.lax.rem(x + dx, 3)
                lr = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - rows)
                win = bufs[slot, pl.ds(lr, rows), pl.ds(0, 6), :]
            rolled = pltpu.roll(win, -lane0, 2)
            first = jnp.where(iota6 < LANE - lane0, rolled[0], rolled[1])
            if rows == 2:
                return first
            mid = jnp.where(iota6 < LANE - lane0, rolled[1], rolled[2])
            return jnp.concatenate([first, mid], axis=1)

        a0 = starts_ref[x]
        a1 = starts_ref[x + 1]
        k_lo = g * kg

        def pair_masks(p):
            # One rolled a-read and ONE transpose serve ``aw`` chunks
            # (2 rows -> 2 chunks, 3 rows -> 4 in the quad headline
            # shape) — the transpose is the sweep's dominant machinery
            # (exp_r3_strip.py, exp_r4_sweepvar.py). Dead chunks pack
            # exact zeros through the all-inf a side, so every slot is
            # still written.
            g0 = a0 + p * (aw * CHUNK)
            alen = jnp.minimum(a1 - g0, aw * CHUNK)
            a6 = read_win(0, g0, rows=arows)
            aT = jnp.swapaxes(a6, 0, 1)
            aT = jnp.where(aw_full < alen, aT, jnp.inf)

            packed_all = []
            for sub in range(aw):
                k = p * aw + sub
                g0s = g0 + sub * CHUNK
                s0 = sub * CHUNK
                axlo = aT[s0:s0 + CHUNK, 0:1]
                aylo = aT[s0:s0 + CHUNK, 1:2]
                azlo = aT[s0:s0 + CHUNK, 2:3]
                axhi = aT[s0:s0 + CHUNK, 3:4]
                ayhi = aT[s0:s0 + CHUNK, 4:5]
                azhi = aT[s0:s0 + CHUNK, 5:6]
                # See the count kernel's dead-slot note: with an
                # overflowed slab (plan.ok=False) and odd mc, chunk mc
                # reads chunk mc-1's window — the garbage masks are
                # discarded on the host retry.
                tbase = jnp.minimum(k, mc - 1) * 2

                for off, dx in enumerate(SLAB_OFFSETS):
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]
                    for r in range(rpw):
                        # Rolled reads (unlike the 2-D masks kernel's
                        # aligned reads): lane l of row r is window
                        # element w0 + r*128 + l.
                        b6 = read_win(dx, w0 + r * LANE)
                        jrel = r * LANE + lane_i
                        m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                        m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                        m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                        m &= jrel < wcap
                        if dx == 0:
                            m &= w0 + jrel > g0s + sub_c
                        bits = jnp.where(m, jnp.uint32(1) << shift,
                                         jnp.uint32(0))
                        half0 = bits[0:32]
                        half1 = bits[32:64]
                        for hw in (16, 8, 4, 2, 1):
                            half0 = half0[:hw] + half0[hw:2 * hw]
                            half1 = half1[:hw] + half1[hw:2 * hw]
                        packed_all.append(half0)
                        packed_all.append(half1)
            return packed_all

        def g_body(gq, _):
            p0 = k_lo // aw + gq * unroll
            packed_all = []
            for t in range(unroll):
                packed_all += pair_masks(p0 + t)
            block = jnp.concatenate(packed_all, axis=0)
            out_ref[0, pl.ds(gq * unroll * aw * (2 * rpw * 2),
                             unroll * aw * 2 * rpw * 2)] = block
            return 0

        jax.lax.fori_loop(0, kg // (aw * unroll), g_body, 0)

    return kernel


def slab_sweep_masks(plan: SlabPlan, rpw=1, interpret=False):
    """Packed per-tile overlap bitmasks over a slab plan.

    Returns uint32[gx*NG, KG*2*rpw*2, 128] (layout as
    kernels/sweep.py sweep_masks, with the 2-offset slab stencil and
    *rolled* window rows: lane l of tile row r = window element
    w0 + r*128 + l). Exact iff ``plan.ok`` and
    ``plan.rows_rolled <= rpw``.
    """
    return _slab_masks(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap,
        plan.gx, plan.mc, plan.slab_rows, rpw, interpret)


@partial(jax.jit, static_argnames=(
    "gx", "mc", "slab_rows", "rpw", "interpret"))
def _slab_masks(stream, starts, slab_r0, w0_tab, wcap_tab,
                gx, mc, slab_rows, rpw=1, interpret=False):
    from .sweep import mask_groups

    kg, ng = mask_groups(mc, rpw)
    kgt2 = kg * 2 * rpw * 2
    direct = bool(interpret)
    # ``unroll`` counts chunk GROUPS per store (a group is 4 chunks at
    # rpw=1 — the quad pairing — else 2; mask_groups keeps kg a multiple
    # of 4 so one quad group per store always divides), capped by the
    # scoped-VMEM stack budget (group chunks x 2 offsets x rpw row units
    # per group; see kernels/sweep.py ROWS_STATIC_MAX). The
    # dual-dispatch fill path always runs this kernel at rpw=1.
    aw = 4 if rpw == 1 else 2
    u_max = max(1, 120 // max(rpw, 1))
    unroll = next(u for u in (2, 1)
                  if kg % (aw * u) == 0 and u <= u_max)
    kernel = _make_slab_masks_kernel(gx, mc, slab_rows, rpw, kg, direct,
                                     unroll)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # slab_r0
        pl.BlockSpec((1, 1, mc * 2), lambda x, g: (x, 0, 0),
                     memory_space=pltpu.SMEM),                 # w0
        pl.BlockSpec((1, 1, mc * 2), lambda x, g: (x, 0, 0),
                     memory_space=pltpu.SMEM),                 # wcap
        pl.BlockSpec(memory_space=pltpu.VMEM if direct else pl.ANY),
    ]
    scratch = []
    if not direct:
        scratch = [
            pltpu.VMEM((3, slab_rows, 8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(gx, ng),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kgt2, LANE),
            lambda x, g: (x * ng + g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((gx * ng, kgt2, LANE), jnp.uint32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, slab_r0,
      w0_tab.reshape(gx, 1, mc * 2), wcap_tab.reshape(gx, 1, mc * 2),
      stream)
    return out


def slab_count(plan: SlabPlan, rpw=1, interpret=False, unroll=UNROLL):
    """Exact pair count from a slab plan.

    Exact iff ``plan.ok`` and ``plan.rows_rolled <= rpw`` (the caller
    retries with escalated knobs otherwise). Returns int32 scalar.
    """
    return slab_count_guarded(plan, rpw, interpret, unroll)[0]


def slab_count_guarded(plan: SlabPlan, rpw=1, interpret=False,
                       unroll=UNROLL):
    """(count, no_overflow): the count plus an int32-wrap detector."""
    count, count_f = _slab_count(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap,
        plan.gx, plan.mc, plan.slab_rows, rpw, interpret, unroll,
    )
    return count, count_f < float(2 ** 31 - 2 ** 26)


def slab_count_dual(plan: SlabPlan, interpret=False, j_cap=None,
                    split_ok=False, base=1):
    """(count, ok) via dual dispatch: ``base``-row Pallas sweep + XLA
    residual.

    The static rows-per-window knob is brittle: one hot chunk whose
    window spans a second 128-lane row forces rpw=2 (2x the sweep cost)
    for the whole scene — measured at 1M, every gx from 48 to 192 has
    at least one such window. Here the Pallas sweep always runs at
    ``base`` rolled rows with ``wcap`` clamped to base*128 lanes, and
    the clipped remainders are counted by
    :func:`~collision_tpu.slabs.residual_count` — a dense vectorized
    pass over a compacted job list, one job per 128-lane residual
    segment (exact at any window width). The uniform flagship keeps
    base=1 (its windows target ~88 lanes, the residual tail is empty);
    the hetero engine's parked power-law plans have fat (128,256]
    tails — 871 jobs at n=1e5, past the 256-job default — and run
    base=2, which empties the tail instead (measured round-5). ``ok``
    is False when the residual job capacity overflowed; callers then
    retry via the escalated-rpw ladder. Overflow near 2^31 pairs is
    detected and folded in. ``split_ok`` returns the two components
    separately as (count, r_ok, no_ovf): r_ok is fixable by a finer
    slab grid (narrower windows -> fewer/narrower residual jobs), the
    int32 wrap guard is not — retry ladders use the split to stop
    escalating gx on failures gx cannot fix.
    """
    from ..slabs import RESIDUAL_JOBS, residual_count

    wcap_c = jnp.minimum(plan.wcap, base * LANE)
    count, count_f = _slab_count(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, wcap_c,
        plan.gx, plan.mc, plan.slab_rows, base, interpret, UNROLL,
    )
    rcount, r_ok = residual_count(
        plan, RESIDUAL_JOBS if j_cap is None else j_cap, base=base)
    no_ovf = count_f < float(2 ** 31 - 2 ** 26)
    if split_ok:
        return count + rcount, r_ok, no_ovf
    return count + rcount, r_ok & no_ovf


def slab_count_diag(plan: SlabPlan, d_max=DEFAULT_DIAG, interpret=False,
                    j_cap=None):
    """(count, ok): diagonal self pass + windowed cross pass.

    The round-3 flagship count. Pair coverage partitions by sorted
    index distance ``d = j - i``:

      d <= d_max              diagonal kernel (:func:`diag_count`) —
                              slab-agnostic, exact, no tables;
      d >  d_max, cross-slab  the windowed sweep, cross offset only,
                              windows clamped to 128 lanes with the
                              ``j > i + d_max`` mask, plus the residual
                              jobs for clipped lanes (same mask);
      d >  d_max, same-slab   impossible unless the in-kernel detector
                              flags (ok=False -> host retry).

    ``ok`` folds the detector, the residual-job capacity, and the int32
    overflow guard; a False result is a lower bound and the caller must
    escalate (more slabs, or :func:`slab_count_dual`).
    """
    from ..slabs import RESIDUAL_JOBS, residual_count

    dcount, dcount_f, flag = diag_count(
        plan.stream, plan.diag_thr, d_max, interpret)
    wcap_c = jnp.minimum(plan.wcap, LANE)
    ccount, ccount_f = _slab_count(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, wcap_c,
        plan.gx, plan.mc, plan.slab_rows, 1, interpret, UNROLL,
        offsets=(1,), dmin=d_max,
    )
    rcount, r_ok = residual_count(
        plan, RESIDUAL_JOBS if j_cap is None else j_cap, dmin=d_max)
    no_ovf = (dcount_f + ccount_f) < float(2 ** 31 - 2 ** 26)
    ok = r_ok & no_ovf & (flag == 0)
    return dcount + ccount + rcount, ok


@partial(jax.jit, static_argnames=(
    "gx", "mc", "slab_rows", "rpw", "interpret", "unroll", "offsets",
    "dmin"))
def _slab_count(stream, starts, slab_r0, w0_tab, wcap_tab,
                gx, mc, slab_rows, rpw=1, interpret=False, unroll=1,
                offsets=SLAB_OFFSETS, dmin=0):
    direct = bool(interpret)
    # Scoped-VMEM stack cap: unroll pairs x 2 chunks x |offsets| x rpw
    # inlined row tests (see kernels/sweep.py ROWS_STATIC_MAX).
    unroll = max(1, min(unroll, 120 // max(rpw, 1)))
    kernel = _make_slab_kernel(gx, mc, slab_rows, rpw, direct, unroll,
                               offsets, dmin)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # slab_r0
        pl.BlockSpec((1, 1, mc * 2), lambda s: (s, 0, 0),
                     memory_space=pltpu.SMEM),                 # w0
        pl.BlockSpec((1, 1, mc * 2), lambda s: (s, 0, 0),
                     memory_space=pltpu.SMEM),                 # wcap
        pl.BlockSpec(memory_space=pltpu.VMEM if direct else pl.ANY),
    ]
    scratch = [pltpu.SMEM((1,), jnp.int32), pltpu.SMEM((1,), jnp.float32)]
    if not direct:
        scratch = [
            pltpu.VMEM((3, slab_rows, 8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
        ]

    out, outf = pl.pallas_call(
        kernel,
        grid=(gx,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, slab_r0,
      w0_tab.reshape(gx, 1, mc * 2), wcap_tab.reshape(gx, 1, mc * 2),
      stream)
    return out[0], outf[0]
