"""Pallas column-sweep kernel: banded window tests over the sorted stream.

Consumes a :class:`~collision_tpu.columns.ColumnPlan` (z-sorted stream +
per-chunk window tables, see columns.py) and counts — or, in fill mode,
emits — every strictly-overlapping AABB pair. This is the round-2
replacement for the dense z-cell halo sweep (kernels/halo.py): work is
proportional to the number of z-plausible candidate pairs instead of
``cell_capacity**2`` per cell pair, and the binning gather disappears —
the kernel reads the sorted stream directly via a 3-slot ring of x-slab
DMAs (each slab is DMAed exactly once per sweep; per-DMA issue cost
measured ~6 us on v5e, paid gxy+1 times total).

Per grid step (one x-row of columns), for each column, for each 64-sphere
chunk, for each of the 5 half-stencil column offsets, the kernel tests the
chunk's transposed component tile against the ``rows_per_window`` raw
stream rows covering the chunk's precomputed z-window. The row count is a
*static* knob: dynamic inner loops measured 4.5x slower than this unrolled
form (per-iteration scalar/loop overhead dominates the ~50-cycle vector
body), and windows wider than the knob are detected in the plan
(``rows_needed``) so the host retries with a bigger one — pairs are never
silently dropped.

Contract parity (collider.py docstring): exact unordered unique pairs of
original ids, strict-overlap semantics (collision.cl:164-166); in fill
mode the true total keeps counting past capacity while only ``capacity``
pairs are materialized (collision.cl:203-215), in deterministic ascending
sweep order.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..columns import CHUNK, COLUMN_OFFSETS, LANE, ColumnPlan

NO_PAIR = np.uint32(0xFFFFFFFF)

#: Default static rows-per-window; the host escalates through this ladder
#: when plan.rows_needed exceeds it (one recompile per rung, like the
#: reference's reallocate-and-retry resize, collision.py:84-119).
RPW_LADDER = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)

#: Largest rpw the kernels fully unroll. Mosaic allocates every inlined
#: row test's temporaries on the scoped-VMEM stack (~22 KB per row-unit
#: measured at the 28.85M/16M OOM: rpw=64 x unroll=4 x 5 offsets, caught
#: by tests_tpu on the forced-retry scene); past this bound the row loop
#: goes dynamic (fori_loop), trading the unrolled form's ~4.5x speed for
#: a compile that always fits. High rungs are rare retry territory —
#: the host prefers escalating gxy (collider._retry_exact), which keeps
#: windows narrow instead of sweeping wide ones slowly.
ROWS_STATIC_MAX = 48

#: Scoped-VMEM stack budget in "row units" (one window-row test of one
#: chunk against one offset); caps the chunk-unroll so
#: unroll * offsets * rpw stays well under the 16M limit.
_ROW_UNIT_BUDGET = 480


def mask_groups(mc, rpw):
    """(KG, NG): chunks per mask-kernel grid step and number of groups.

    The mask kernel's output block is KG*5*rpw KiB of VMEM; grouping
    chunks keeps it under ~2 MiB for any rpw so the kernel never blows
    the scoped-VMEM budget (observed at rpw=16 with deep columns). KG is
    rounded up to a multiple of 4 so the chunk loop can unroll 4x (dead
    chunks pack exact zeros — at most 3 per group).
    """
    kg = max(1, (2 << 20) // (5 * rpw * 1024))
    kg = min(kg, mc)
    kg = -(-kg // 4) * 4
    return kg, -(-mc // kg)


def _make_kernel(gxy, mc, slab_rows, rpw, direct_stream):
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

            @pl.when(x + 2 <= gxy)
            def _prefetch():
                start_slab(x + 2, (x + 2) % 3)

        @pl.when(x == 0)
        def _init():
            cursor[0] = 0
            cursor_f[0] = 0.0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)

        def read_aligned(dx, g):
            """[6, 128]: test components of spheres g..g+127, sphere g
            rolled to lane 0 (used once per chunk for the a side)."""
            lrow = g // LANE
            lane0 = g % LANE
            if direct_stream:
                two = stream_ref[pl.ds(lrow, 2), pl.ds(0, 6), :]
            else:
                slot = jax.lax.rem(x, 3)
                two = bufs[slot, pl.ds(lrow - r0_ref[x], 2), pl.ds(0, 6), :]
            rolled = pltpu.roll(two, -lane0, 2)
            merged = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)
                < LANE - lane0,
                rolled[0], rolled[1])
            return merged

        def read_raw(dx, lrow):
            """[6, 128]: raw stream row lrow's test components."""
            if direct_stream:
                l = jnp.clip(lrow, 0, stream_ref.shape[0] - 1)
                return stream_ref[l, pl.ds(0, 6), :]
            slot = jax.lax.rem(x + dx, 3)
            l = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - 1)
            return bufs[slot, l, pl.ds(0, 6), :]

        def y_body(y, carry):
            tot_i, tot_f = carry
            col = x * gxy + y
            a0 = starts_ref[col]
            a1 = starts_ref[col + 1]
            nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)

            def k_body(k, acc):
                g0 = a0 + k * CHUNK
                alen = jnp.minimum(a1 - g0, CHUNK)
                a6 = read_aligned(0, g0)
                aT = jnp.swapaxes(a6, 0, 1)          # [128, 6]
                # Rows past the chunk -> +inf lows: the strict test can
                # never pass (subsumes an explicit a-validity mask).
                aT = jnp.where(sub_full < alen, aT, jnp.inf)
                axlo = aT[:CHUNK, 0:1]
                aylo = aT[:CHUNK, 1:2]
                azlo = aT[:CHUNK, 2:3]
                axhi = aT[:CHUNK, 3:4]
                ayhi = aT[:CHUNK, 4:5]
                azhi = aT[:CHUNK, 5:6]
                tbase = (y * mc + k) * 5

                for off, (dx, dy) in enumerate(COLUMN_OFFSETS):
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]
                    row_lo = w0 // LANE

                    def row_test(r, acc_in):
                        b6 = read_raw(dx, row_lo + r)
                        jglob = (row_lo + r) * LANE + lane_i
                        m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                        m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                        m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                        m &= (jglob >= w0) & (jglob < w0 + wcap)
                        if off == 0:
                            m &= jglob > g0 + sub_c
                        c = jnp.where(m, 1, 0)
                        fold = c[0:8]
                        for f in range(8, CHUNK, 8):
                            fold = fold + c[f:f + 8]
                        return acc_in + fold

                    if rpw <= ROWS_STATIC_MAX:
                        for r in range(rpw):
                            acc = row_test(r, acc)
                    else:
                        # Deep windows: a dynamic row loop bounds the
                        # Mosaic stack (see ROWS_STATIC_MAX).
                        acc = jax.lax.fori_loop(0, rpw, row_test, acc)
                return acc

            acc = jax.lax.fori_loop(
                0, nchunks, k_body, jnp.zeros((8, LANE), jnp.int32))
            # Fold per column: the int32 vector accumulator wraps at 2^31
            # hits per element with no error (the reference's uint32 atomic
            # counter is good to 2^32, collision.cl:203), but a wrap within
            # one column needs a >= 26M-sphere column (mc*5*rpw*8 >= 2^31)
            # — unreachable — so the f32 scalar total below is a faithful
            # overflow detector for the int32 grand total (XLA's tree sum
            # is ~2^-20-relative accurate; the host compares against a
            # 2^26 margin, mirroring the mask/run fill guards in fill.py).
            return (tot_i + jnp.sum(acc, dtype=jnp.int32),
                    tot_f + jnp.sum(acc.astype(jnp.float32),
                                    dtype=jnp.float32))

        tot_i, tot_f = jax.lax.fori_loop(
            0, gxy, y_body, (jnp.int32(0), jnp.float32(0.0)))
        cursor[0] = cursor[0] + tot_i
        cursor_f[0] = cursor_f[0] + tot_f

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]
            totf_ref[0] = cursor_f[0]

    return kernel


def _make_rolled_kernel(gxy, mc, slab_rows, rpw, direct_stream, unroll=1):
    """Count sweep with lane-rolled window reads.

    The plain kernel tests whole 128-lane stream rows, so a window of
    width w starting at an arbitrary lane spans ceil((w0%128 + w)/128)
    rows — at typical widths (~64-128) that is 2 rows ~78% of the time,
    forcing rpw=2 and testing ~2x the needed lanes. Here each window
    read is rolled so lane 0 = sphere w0 (the same two-row roll-merge
    read_aligned uses for the a side): coverage becomes ceil(w/128)
    rows, alignment-free, so rpw=1 suffices whenever every window is
    narrower than 128 — the plan reports this bound as ``rows_rolled``.
    The in-window test also simplifies: lane index < wcap replaces the
    two-sided jglob range check.
    """
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

            pltpu.make_async_copy(
                stream_ref.at[pl.ds(r0_ref[x + 1], slab_rows)],
                bufs.at[(x + 1) % 3], sems.at[(x + 1) % 3]).wait()

            @pl.when(x + 2 <= gxy)
            def _prefetch():
                start_slab(x + 2, (x + 2) % 3)

        @pl.when(x == 0)
        def _init():
            cursor[0] = 0
            cursor_f[0] = 0.0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
        iota6 = jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)

        def read_win(dx, g):
            """[6, 128]: test components of spheres g..g+127 (lane-rolled
            so sphere g is at lane 0), from the slab holding x+dx."""
            lrow = g // LANE
            lane0 = g % LANE
            if direct_stream:
                lr = jnp.clip(lrow, 0, stream_ref.shape[0] - 2)
                two = stream_ref[pl.ds(lr, 2), pl.ds(0, 6), :]
            else:
                slot = jax.lax.rem(x + dx, 3)
                lr = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - 2)
                two = bufs[slot, pl.ds(lr, 2), pl.ds(0, 6), :]
            rolled = pltpu.roll(two, -lane0, 2)
            return jnp.where(iota6 < LANE - lane0, rolled[0], rolled[1])

        def y_body(y, carry):
            tot_i, tot_f = carry
            col = x * gxy + y
            a0 = starts_ref[col]
            a1 = starts_ref[col + 1]
            nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)

            def chunk_tests(k, acc):
                g0 = a0 + k * CHUNK
                alen = jnp.minimum(a1 - g0, CHUNK)
                a6 = read_win(0, g0)
                aT = jnp.swapaxes(a6, 0, 1)
                # Dead unroll slots (alen <= 0) go all-inf and vanish.
                aT = jnp.where(sub_full < alen, aT, jnp.inf)
                axlo = aT[:CHUNK, 0:1]
                aylo = aT[:CHUNK, 1:2]
                azlo = aT[:CHUNK, 2:3]
                axhi = aT[:CHUNK, 3:4]
                ayhi = aT[:CHUNK, 4:5]
                azhi = aT[:CHUNK, 5:6]
                # Clamp keeps dead slots' SMEM table reads in range.
                tbase = (y * mc + jnp.minimum(k, mc - 1)) * 5

                for off, (dx, dy) in enumerate(COLUMN_OFFSETS):
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]

                    def row_test(r, acc_in):
                        b6 = read_win(dx, w0 + r * LANE)
                        jrel = r * LANE + lane_i
                        m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                        m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                        m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                        m &= jrel < wcap
                        if off == 0:
                            # Intra-column dedup: j > i. w0 >= g0 by the
                            # plan's self-window clip.
                            m &= w0 + jrel > g0 + sub_c
                        c = jnp.where(m, 1, 0)
                        fold = c[0:8]
                        for f in range(8, CHUNK, 8):
                            fold = fold + c[f:f + 8]
                        return acc_in + fold

                    if rpw <= ROWS_STATIC_MAX:
                        for r in range(rpw):
                            acc = row_test(r, acc)
                    else:
                        # Deep windows: a dynamic row loop bounds the
                        # Mosaic stack (see ROWS_STATIC_MAX).
                        acc = jax.lax.fori_loop(0, rpw, row_test, acc)
                return acc

            if unroll == 1:
                acc = jax.lax.fori_loop(
                    0, nchunks, chunk_tests,
                    jnp.zeros((8, LANE), jnp.int32))
            else:
                # Per-chunk overhead bound (see kernels/slab_sweep.py
                # UNROLL): fewer, fatter iterations pipeline the
                # dynamic-slice reads.
                def g_body(g, acc):
                    for t in range(unroll):
                        acc = chunk_tests(g * unroll + t, acc)
                    return acc

                acc = jax.lax.fori_loop(
                    0, (nchunks + unroll - 1) // unroll, g_body,
                    jnp.zeros((8, LANE), jnp.int32))
            return (tot_i + jnp.sum(acc, dtype=jnp.int32),
                    tot_f + jnp.sum(acc.astype(jnp.float32),
                                    dtype=jnp.float32))

        tot_i, tot_f = jax.lax.fori_loop(
            0, gxy, y_body, (jnp.int32(0), jnp.float32(0.0)))
        cursor[0] = cursor[0] + tot_i
        cursor_f[0] = cursor_f[0] + tot_f

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]
            totf_ref[0] = cursor_f[0]

    return kernel


def _make_masks_kernel(gxy, mc, slab_rows, rpw, kg, direct_stream,
                       unroll=1):
    """Mask-emitting sweep: same banded window walk as the count kernel,
    but every row-tile's [CHUNK, 128] overlap mask is bit-packed into two
    uint32 lane-words and written to a per-(x, y) HBM block — the input
    to the gather-free fill pipeline (fill.py mask_fill). Skipped /
    unvisited tile slots stay zero (the block is zeroed first), which is
    exact: their windows have no in-window lanes."""
    def kernel(starts_ref, r0_ref, w0_ref, wcap_ref, stream_ref,
               out_ref, *scratch):
        if direct_stream:
            bufs = sems = None
        else:
            bufs, sems = scratch
        x = pl.program_id(0)
        y = pl.program_id(1)
        g = pl.program_id(2)

        if not direct_stream:
            def start_slab(s, slot):
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[s], slab_rows)],
                    bufs.at[slot], sems.at[slot]).start()

            @pl.when((x == 0) & (y == 0) & (g == 0))
            def _init_dma():
                start_slab(0, 0)
                start_slab(1, 1)
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[0], slab_rows)],
                    bufs.at[0], sems.at[0]).wait()

            @pl.when((y == 0) & (g == 0))
            def _ring_step():
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(r0_ref[x + 1], slab_rows)],
                    bufs.at[(x + 1) % 3], sems.at[(x + 1) % 3]).wait()

                @pl.when(x + 2 <= gxy)
                def _prefetch():
                    start_slab(x + 2, (x + 2) % 3)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
        shift = jax.lax.broadcasted_iota(
            jnp.uint32, (CHUNK, LANE), 0) % 32

        def read_aligned(g):
            lrow = g // LANE
            lane0 = g % LANE
            if direct_stream:
                lr = jnp.clip(lrow, 0, stream_ref.shape[0] - 2)
                two = stream_ref[pl.ds(lr, 2), pl.ds(0, 6), :]
            else:
                # Clip: dead chunks (k >= nchunks, looped anyway so every
                # output slot is written) may index past the slab; their
                # tiles are exact zeros via the alen mask regardless of
                # what data this reads.
                slot = jax.lax.rem(x, 3)
                lr = jnp.clip(lrow - r0_ref[x], 0, slab_rows - 2)
                two = bufs[slot, pl.ds(lr, 2), pl.ds(0, 6), :]
            rolled = pltpu.roll(two, -lane0, 2)
            return jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)
                < LANE - lane0,
                rolled[0], rolled[1])

        def read_raw(dx, lrow):
            if direct_stream:
                l = jnp.clip(lrow, 0, stream_ref.shape[0] - 1)
                return stream_ref[l, pl.ds(0, 6), :]
            slot = jax.lax.rem(x + dx, 3)
            l = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - 1)
            return bufs[slot, l, pl.ds(0, 6), :]

        col = x * gxy + y
        a0 = starts_ref[col]
        a1 = starts_ref[col + 1]
        k_lo = g * kg

        def pair_masks(p):
            # One stream row holds TWO chunks: one rolled a-read and ONE
            # [6,128]->[128,6] transpose serve chunks 2p and 2p+1 (the
            # a-side transpose is the sweep's dominant machinery —
            # exp_r3_strip.py; the count kernel got this pairing in
            # round 3). Dead chunks pack exact zeros via the all-inf a
            # side, so every output slot is still written.
            g0 = a0 + p * (2 * CHUNK)
            alen = jnp.minimum(a1 - g0, 2 * CHUNK)
            a6 = read_aligned(g0)
            aT = jnp.swapaxes(a6, 0, 1)
            aT = jnp.where(sub_full < alen, aT, jnp.inf)

            packed_all = []
            for sub in range(2):
                k = p * 2 + sub
                g0s = g0 + sub * CHUNK
                s0 = sub * CHUNK
                axlo = aT[s0:s0 + CHUNK, 0:1]
                aylo = aT[s0:s0 + CHUNK, 1:2]
                azlo = aT[s0:s0 + CHUNK, 2:3]
                axhi = aT[s0:s0 + CHUNK, 3:4]
                ayhi = aT[s0:s0 + CHUNK, 4:5]
                azhi = aT[s0:s0 + CHUNK, 5:6]
                # Clamp: when kg does not divide mc the last group's
                # padded slots have k >= mc, which would read the window
                # table out of bounds (the values are masked out either
                # way — dead chunks carry all-inf a sides — but the
                # dynamic SMEM read itself must stay in range on
                # hardware). As in the count kernel, an OVERFLOWED slab
                # (plan.ok=False) with odd mc can pair live lanes of
                # chunk mc against chunk mc-1's window; the garbage is
                # discarded on the host retry.
                tbase = (y * mc + jnp.minimum(k, mc - 1)) * 5

                for off, (dx, dy) in enumerate(COLUMN_OFFSETS):
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]
                    row_lo = w0 // LANE

                    def row_masks(r):
                        # No row skipping and no zero-fill pass: rows
                        # past the window (and dead chunks) have no
                        # in-window lanes, so their packed words are
                        # exact zeros — straight-line vector code beats
                        # branches on this hardware (measured 2.1x on
                        # the count sweep).
                        b6 = read_raw(dx, row_lo + r)
                        jglob = (row_lo + r) * LANE + lane_i
                        m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                        m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                        m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                        m &= (jglob >= w0) & (jglob < w0 + wcap)
                        if off == 0:
                            m &= jglob > g0s + sub_c
                        bits = jnp.where(m, jnp.uint32(1) << shift,
                                         jnp.uint32(0))
                        half0 = bits[0:32]
                        half1 = bits[32:64]
                        for hw in (16, 8, 4, 2, 1):
                            half0 = half0[:hw] + half0[hw:2 * hw]
                            half1 = half1[:hw] + half1[hw:2 * hw]
                        return half0, half1

                    if rpw <= ROWS_STATIC_MAX:
                        for r in range(rpw):
                            h0, h1 = row_masks(r)
                            packed_all.append(h0)
                            packed_all.append(h1)
                    else:
                        # Deep windows: dynamic row loop with direct
                        # per-row stores bounds the Mosaic stack (see
                        # ROWS_STATIC_MAX); the caller forces unroll=1
                        # here so g_body has no fat store to merge.
                        base = (k - k_lo) * (5 * rpw * 2) \
                            + off * rpw * 2

                        def row_store(r, _):
                            h0, h1 = row_masks(r)
                            out_ref[0, pl.ds(base + r * 2, 1)] = h0
                            out_ref[0, pl.ds(base + r * 2 + 1, 1)] = h1
                            return 0

                        jax.lax.fori_loop(0, rpw, row_store, 0)
            return packed_all

        def g_body(gq, _):
            # ``unroll`` chunk PAIRS per iteration (the sweep is
            # per-chunk overhead bound — see kernels/slab_sweep.py
            # UNROLL), merged into ONE dynamic store: consecutive
            # chunks' block rows are adjacent in the output. Layout is
            # [rows, 128] with rows = chunk-major, tile-slot,
            # half-minor: a trailing [2, 128] axis pair would tile to
            # (8, 128) on TPU and pad 4x.
            p0 = k_lo // 2 + gq * unroll
            packed_all = []
            for t in range(unroll):
                packed_all += pair_masks(p0 + t)
            if rpw <= ROWS_STATIC_MAX:
                block = jnp.concatenate(packed_all, axis=0)
                out_ref[0, pl.ds(gq * unroll * 2 * (5 * rpw * 2),
                                 unroll * 2 * 5 * rpw * 2)] = block
            return 0

        jax.lax.fori_loop(0, kg // (2 * unroll), g_body, 0)

    return kernel


def sweep_masks(plan: ColumnPlan, rpw=2, interpret=False):
    """Packed per-tile overlap bitmasks for the whole scene.

    Returns uint32[ncols*NG, KG*5*rpw*2, 128] with (KG, NG) from
    :func:`mask_groups`: for column ``c = x*gxy+y``, group ``gq``
    (chunks ``gq*KG..``), row ``((kk*5 + off)*rpw + r)*2 + h``, the
    128 words hold the chunk-sublane mask of stream row ``w0//128 + r``
    vs chunk ``gq*KG + kk`` of the column under stencil offset ``off``
    (half ``h`` bit ``b`` = sublane ``h*32+b``). Exact iff ``plan.ok``
    and ``plan.rows_needed <= rpw``.
    """
    return _sweep_masks(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap,
        plan.gxy, plan.mc, plan.slab_rows, rpw, interpret,
    )


@partial(jax.jit, static_argnames=(
    "gxy", "mc", "slab_rows", "rpw", "interpret"))
def _sweep_masks(stream, starts, slab_r0, w0_tab, wcap_tab,
                 gxy, mc, slab_rows, rpw=2, interpret=False):
    K = gxy * mc * 5
    kg, ng = mask_groups(mc, rpw)
    kgt = kg * 5 * rpw
    direct = bool(interpret)
    # ``unroll`` counts chunk PAIRS per store (mask_groups keeps kg a
    # multiple of 4, so 2 pairs = 4 chunks per store always divides),
    # capped by the scoped-VMEM stack budget; past ROWS_STATIC_MAX the
    # kernel stores row-by-row with a dynamic loop (unroll must be 1).
    if rpw > ROWS_STATIC_MAX:
        unroll = 1
    else:
        u_max = max(1, _ROW_UNIT_BUDGET // (2 * 5 * rpw))
        unroll = next(u for u in (2, 1)
                      if kg % (2 * u) == 0 and u <= u_max)
    kernel = _make_masks_kernel(gxy, mc, slab_rows, rpw, kg, direct,
                                unroll)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # slab_r0
        pl.BlockSpec((1, 1, K), lambda x, y, g: (x, 0, 0),
                     memory_space=pltpu.SMEM),                 # w0
        pl.BlockSpec((1, 1, K), lambda x, y, g: (x, 0, 0),
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
        grid=(gxy, gxy, ng),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kgt * 2, LANE),
            lambda x, y, g: ((x * gxy + y) * ng + g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (gxy * gxy * ng, kgt * 2, LANE), jnp.uint32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, slab_r0,
      w0_tab.reshape(gxy, 1, K), wcap_tab.reshape(gxy, 1, K),
      stream)
    return out


#: Default chunk-loop unroll of the rolled kernel (see
#: kernels/slab_sweep.py UNROLL for the measured rationale).
UNROLL = 4


def column_residual_count(plan: ColumnPlan, j_cap=None, dmin=0, base=1):
    """(count, ok) for column-plan window lanes beyond the first
    ``base``*128 — the 5-offset analog of slabs.residual_count, via the
    shared residual-job machinery (slabs._residual_mask_tables; the
    column window tables share the ``(col*mc + k)*noff + off`` flat
    layout)."""
    from ..slabs import RESIDUAL_JOBS, _residual_mask_tables

    if j_cap is None:
        j_cap = RESIDUAL_JOBS
    m, _, _, ok = _residual_mask_tables(
        plan.stream, plan.starts, plan.w0.reshape(-1),
        plan.wcap.reshape(-1), plan.mc, 5, j_cap, dmin, base=base)
    return jnp.sum(m, dtype=jnp.int32), ok


def default_column_j_cap(plan: ColumnPlan, base=1):
    """Static residual-job capacity for a column dual count: at base=1
    the reference 1M power-law plan needs ~5k jobs (~6% of its window
    table — windows average ~110 lanes, so the >128 tail is fat); at
    base>=2 the tail collapses and the slab default suffices. Derived
    from static plan shapes only, so the jit signature is stable."""
    from ..slabs import RESIDUAL_JOBS

    if base >= 2:
        return RESIDUAL_JOBS
    T = int(np.prod(plan.w0.shape))
    return max(RESIDUAL_JOBS, -(-T // (16 * 256)) * 256)


def sweep_count_dual(plan: ColumnPlan, interpret=False, j_cap=None,
                     base=1):
    """(count, ok) — dual-dispatch column count with NO rows-per-window
    knob: the rolled kernel runs at a static ``base`` rows per window
    (wcap clamped to base*128 lanes) and the clipped remainders are
    counted by the vectorized residual path (one job per 128-lane
    segment — arbitrarily wide windows stay exact given j_cap). The
    slab engine's round-3 trick (kernels/slab_sweep.slab_count_dual)
    applied to the 5-offset column stencil: windows on the hetero
    engine's parked power-law scene average ~110 lanes but their MAX
    forced rpw=3 — the dual runs the sweep at a third of those row
    tests. ``ok`` folds the plan capacities, the residual-job bound,
    and the int32 guard; exact iff True (host retries otherwise,
    exactly as for the rpw ladder)."""
    if j_cap is None:
        j_cap = default_column_j_cap(plan, base=base)
    sweep_plan = plan._replace(wcap=jnp.minimum(plan.wcap, base * LANE))
    cnt, no_wrap = sweep_count_guarded(sweep_plan, rpw=base,
                                       interpret=interpret, rolled=True)
    rcnt, r_ok = column_residual_count(plan, j_cap=j_cap, base=base)
    return cnt + rcnt, plan.ok & r_ok & no_wrap


def sweep_count(plan: ColumnPlan, rpw=2, interpret=False, rolled=False):
    """Exact pair count from a column plan.

    Exact iff ``plan.ok`` and the window-row bound holds:
    ``plan.rows_needed <= rpw`` for the plain kernel, or the weaker
    ``plan.rows_rolled <= rpw`` with ``rolled=True`` (the caller retries
    with escalated knobs otherwise). Returns int32 scalar.
    """
    return sweep_count_guarded(plan, rpw, interpret, rolled)[0]


def sweep_count_guarded(plan: ColumnPlan, rpw=2, interpret=False,
                        rolled=False):
    """(count, no_overflow): the count plus an int32-wrap detector.

    ``no_overflow`` is False when the scene's true pair total is near or
    past 2^31 (the kernel's parallel f32 accumulation, margined by 2^26)
    — the count-only analog of the fill paths' popcount guard; callers
    AND it into ``ok``.
    """
    count, count_f = _sweep_count(
        plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap,
        plan.gxy, plan.mc, plan.slab_rows, rpw, interpret, rolled,
    )
    return count, count_f < float(2 ** 31 - 2 ** 26)


@partial(jax.jit, static_argnames=(
    "gxy", "mc", "slab_rows", "rpw", "interpret", "rolled", "unroll"))
def _sweep_count(stream, starts, slab_r0, w0_tab, wcap_tab,
                 gxy, mc, slab_rows, rpw=2, interpret=False, rolled=False,
                 unroll=UNROLL):
    K = gxy * mc * 5
    direct = bool(interpret)
    if rolled:
        # Stack budget: unroll * 5 offsets * min(rpw, static max) row
        # units must fit scoped VMEM (see _ROW_UNIT_BUDGET).
        unroll = max(1, min(unroll, _ROW_UNIT_BUDGET
                            // (5 * min(rpw, ROWS_STATIC_MAX))))
        kernel = _make_rolled_kernel(gxy, mc, slab_rows, rpw, direct,
                                     unroll)
    else:
        kernel = _make_kernel(gxy, mc, slab_rows, rpw, direct)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # slab_r0
        pl.BlockSpec((1, 1, K), lambda s: (s, 0, 0),
                     memory_space=pltpu.SMEM),                 # w0
        pl.BlockSpec((1, 1, K), lambda s: (s, 0, 0),
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
        grid=(gxy,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, slab_r0,
      w0_tab.reshape(gxy, 1, K), wcap_tab.reshape(gxy, 1, K),
      stream)
    return out[0], outf[0]
