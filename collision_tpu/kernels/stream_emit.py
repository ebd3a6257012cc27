"""Streaming pair-emission machinery: the cursor restored, TPU-style.

The reference emits each hit through a global atomic cursor into a buffer
bounded only by device memory (/root/reference/collision/collision.cl:202-215).
A Pallas TPU grid executes *sequentially* on the core, so one SMEM cursor
is race-free by construction; :class:`PairEmitter` owns that cursor plus a
double-buffered VMEM staging ring whose 1024-pair halves flush to the HBM
output by async DMA — emission traffic is O(pairs), overlapped with
compute. :func:`extract_hits` walks a packed mask's set bits (masked
min-reductions + one-hot selects, no gathers) and stores each pair through
the emitter; :func:`pack_mask_words` bit-packs a [64, 128] overlap mask
into its two uint32 lane-words.

The big-vs-stream pass (kernels/bigpass.py) is the production consumer.
A full streaming *sweep* fill built on this machinery (the round-3
``stream_fill_pairs``) was deleted in round 4: the sparse mask-fill
pipeline (fill.py + kernels/pair_emit.py) measured 2.3x faster at 1M
and the streaming kernel's dense full-capacity configuration (rpw=12,
110M pairs) crashed the TPU worker — a configuration known to kill the
device has no place in tree (VERDICT r3 item 5); see
results_v5e_round4.jsonl "stream_fill_removed".
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..columns import CHUNK, LANE

NO_PAIR = np.uint32(0xFFFFFFFF)

#: Pairs per staging half / DMA flush (multiple of 128).
_FLUSH = 1024
_FROWS = _FLUSH // LANE

_BIG = np.int32(2 ** 30)


class PairEmitter:
    """Sequential-cursor pair emission shared by the streaming kernels.

    Owns the store-at-cursor + double-buffered staging flush logic: call
    :meth:`store` once per pair (guarded internally by capacity) and
    :meth:`finish` once at the end of the last grid step. ``cur`` is an
    SMEM int32[>=2] scratch: [0] = stored-pair cursor, [1] = completed
    flush events. In ``direct`` mode (interpreter / CPU tests) pairs go
    straight into VMEM-resident outputs and no staging or semaphores are
    used.
    """

    def __init__(self, out_a, out_b, stag_a, stag_b, fsem, cur, capacity,
                 direct):
        self.out_a, self.out_b = out_a, out_b
        self.stag_a, self.stag_b = stag_a, stag_b
        self.fsem = fsem
        self.cur = cur
        self.capacity = capacity
        self.direct = direct
        self.lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def init(self):
        self.cur[0] = 0
        self.cur[1] = 0

    def remaining(self):
        """Stores left before capacity (use as the per-tile trip bound)."""
        return self.capacity - self.cur[0]

    def store(self, ida, idb):
        """Lane-merge one pair at the cursor; flush full halves."""
        cur, lane_i = self.cur, self.lane_i
        c = cur[0]
        if self.direct:
            row = c // LANE
            lnc = c - (c // LANE) * LANE
            self.out_a[pl.ds(row, 1), :] = jnp.where(
                lane_i == lnc, ida, self.out_a[pl.ds(row, 1), :])
            self.out_b[pl.ds(row, 1), :] = jnp.where(
                lane_i == lnc, idb, self.out_b[pl.ds(row, 1), :])
            cur[0] = c + 1
            return
        stag_a, stag_b, fsem = self.stag_a, self.stag_b, self.fsem
        out_a, out_b = self.out_a, self.out_b
        rp = c - (c // (2 * _FLUSH)) * (2 * _FLUSH)
        row = rp // LANE
        lnc = rp - (rp // LANE) * LANE
        stag_a[pl.ds(row, 1), :] = jnp.where(
            lane_i == lnc, ida, stag_a[pl.ds(row, 1), :])
        stag_b[pl.ds(row, 1), :] = jnp.where(
            lane_i == lnc, idb, stag_b[pl.ds(row, 1), :])
        cur[0] = c + 1

        @pl.when((c + 1) - ((c + 1) // _FLUSH) * _FLUSH == 0)
        def _flush():
            # Flush event ni (1-based): DMA the just-completed half
            # (ni-1)%2 at base (c+1-_FLUSH); then, before writes re-enter
            # half ni%2, drain its in-flight DMA from event ni-1 (if any).
            ni = cur[1] + 1
            half = (ni - 1) - ((ni - 1) // 2) * 2
            base_row = (c + 1 - _FLUSH) // LANE
            pltpu.make_async_copy(
                stag_a.at[pl.ds(half * _FROWS, _FROWS)],
                out_a.at[pl.ds(base_row, _FROWS)],
                fsem.at[0, half]).start()
            pltpu.make_async_copy(
                stag_b.at[pl.ds(half * _FROWS, _FROWS)],
                out_b.at[pl.ds(base_row, _FROWS)],
                fsem.at[1, half]).start()

            @pl.when(ni >= 2)
            def _drain_entering():
                other = ni - (ni // 2) * 2
                prev_row = (c + 1 - 2 * _FLUSH) // LANE
                pltpu.make_async_copy(
                    stag_a.at[pl.ds(other * _FROWS, _FROWS)],
                    out_a.at[pl.ds(prev_row, _FROWS)],
                    fsem.at[0, other]).wait()
                pltpu.make_async_copy(
                    stag_b.at[pl.ds(other * _FROWS, _FROWS)],
                    out_b.at[pl.ds(prev_row, _FROWS)],
                    fsem.at[1, other]).wait()

            cur[1] = ni

    def finish(self):
        """Drain in-flight flushes and DMA the final partial half."""
        if self.direct:
            return
        cur, fsem = self.cur, self.fsem
        stag_a, stag_b = self.stag_a, self.stag_b
        out_a, out_b = self.out_a, self.out_b
        nf = cur[1]

        @pl.when(nf >= 1)
        def _drain_last():
            half = (nf - 1) - ((nf - 1) // 2) * 2
            base_row = (nf - 1) * _FROWS
            pltpu.make_async_copy(
                stag_a.at[pl.ds(half * _FROWS, _FROWS)],
                out_a.at[pl.ds(base_row, _FROWS)],
                fsem.at[0, half]).wait()
            pltpu.make_async_copy(
                stag_b.at[pl.ds(half * _FROWS, _FROWS)],
                out_b.at[pl.ds(base_row, _FROWS)],
                fsem.at[1, half]).wait()

        # The unflushed tail [nf*F, stored) lies entirely within one
        # half; DMA that whole half (trailing garbage is masked host-side
        # past the total).
        stored = cur[0]
        tail = stored - nf * _FLUSH

        @pl.when(tail > 0)
        def _final():
            half = nf - (nf // 2) * 2
            base_row = nf * _FROWS
            pltpu.make_async_copy(
                stag_a.at[pl.ds(half * _FROWS, _FROWS)],
                out_a.at[pl.ds(base_row, _FROWS)],
                fsem.at[0, half]).start()
            pltpu.make_async_copy(
                stag_a.at[pl.ds(half * _FROWS, _FROWS)],
                out_a.at[pl.ds(base_row, _FROWS)],
                fsem.at[0, half]).wait()
            pltpu.make_async_copy(
                stag_b.at[pl.ds(half * _FROWS, _FROWS)],
                out_b.at[pl.ds(base_row, _FROWS)],
                fsem.at[1, half]).start()
            pltpu.make_async_copy(
                stag_b.at[pl.ds(half * _FROWS, _FROWS)],
                out_b.at[pl.ds(base_row, _FROWS)],
                fsem.at[1, half]).wait()


def extract_hits(W0, cnt_bound, emitter, a_ids, b_ids, lane_i, sub_c):
    """Per-hit extraction loop over packed mask words.

    ``W0``: int32[2, 128] lane-words (word h, lane l covers sublanes
    h*32..h*32+31); ``cnt_bound``: loop trip (min(tile count, remaining
    capacity)); ``a_ids``: int32[64, 1]; ``b_ids``: int32[1, 128] (the
    ids' bit patterns — Mosaic can't lower unsigned reductions, so all
    kernel-side id plumbing is int32 and callers bitcast outside).
    One-hot selects only — no gathers, no scalar VMEM reads.
    """
    wflat = jax.lax.broadcasted_iota(jnp.int32, (2, LANE), 0) * LANE \
        + jax.lax.broadcasted_iota(jnp.int32, (2, LANE), 1)

    def hit(_, W):
        first = jnp.min(jnp.where(W != 0, wflat, _BIG))
        sel = wflat == first
        B = W & -W                      # per-word lowest set bit (vector)
        SUB = jax.lax.population_count(B - 1)  # vector popcount; garbage
        #                                        where B == 0, masked below
        sub = (first // LANE) * 32 \
            + jnp.sum(jnp.where(sel, SUB, 0), dtype=jnp.int32)
        ln = first - (first // LANE) * LANE
        ida = jnp.sum(jnp.where(sub_c == sub, a_ids, 0), dtype=jnp.int32)
        idb = jnp.sum(jnp.where(lane_i == ln, b_ids, 0), dtype=jnp.int32)
        emitter.store(ida, idb)
        return jnp.where(sel, W - B, W)

    jax.lax.fori_loop(0, cnt_bound, hit, W0)


def pack_mask_words(m):
    """Bit-pack a bool [64, 128] tile mask into int32[2, 128] lane-words
    (word h, lane l covers sublanes h*32..h*32+31)."""
    shift = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 0) % 32
    bits = jnp.where(m, jnp.int32(1) << shift, jnp.int32(0))
    half0 = bits[0:32]
    half1 = bits[32:64]
    for hw in (16, 8, 4, 2, 1):
        half0 = half0[:hw] + half0[hw:2 * hw]
        half1 = half1[:hw] + half1[hw:2 * hw]
    return jnp.concatenate([half0, half1], 0)
