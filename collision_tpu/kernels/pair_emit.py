"""Vectorized second-pass pair emission from packed sweep masks.

The reference streams every hit through one global atomic cursor at
memory-bound cost (/root/reference/collision/collision.cl:202-215). The
round-3 blocked XLA emission (fill._mask_fill_emit_big) resolved each
output slot independently and paid ~44 ns/pair — every slot re-fetched
its whole 1.5 KB mask/id row even though ~350 slots share a row on the
dense benchmark scene. This kernel restores the reference's cost shape:
each mask row is loaded ONCE, and its pairs are emitted by 128-wide
vector steps at a sequentially-carried cursor (race-free by construction
— a Pallas TPU grid runs sequentially on the core). The partial output
row rides in loop-carried vector registers (see RowEmitter); completed
rows land in a VMEM staging ring and leave as aligned 32 KB DMAs.
Measured on the dense reference scene (107.65M pairs): 0.64 s total vs
4.9 s for the round-2 XLA emission pyramid — ~3.9 ns/pair, within 2x of
the pure-compute floor (0.57 s with stores disabled).

Inputs are the sweep's packed masks in their native layout
(``uint32[NB, 2*KGT, 128]`` from kernels/sweep.py sweep_masks or
kernels/slab_sweep.py slab_sweep_masks) plus two small per-row scalar
tables and the sorted-order id array resident in VMEM (4 bytes/sphere —
the gate for this path). Per nonzero mask row (rank math below; one
[128, 128] compare block per 128 output slots):

  lane of output rank k   = #{lanes l : inclusive_popcount_prefix[l] <= k}
  word / id / rank base   = one-hot select against the row (sum-reduce)
  bit of rank-in-word     = 5-round popcount binary partition
  both original ids       = in-row one-hot selects from id rows read out
                            of the VMEM id table (roll-merged — no
                            per-pair gather anywhere)

so per-pair cost is a handful of vector-register ops instead of a row
fetch, and the mask buffer streams at DMA bandwidth. Pairs are emitted
in deterministic ascending (row, lane, bit) order; the first
``capacity`` pairs are materialized while the true total keeps counting
upstream (the count-past-capacity contract, collision.cl:203-207).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

#: Pairs per staging half / DMA flush (multiple of LANE). 32 KB halves:
#: a dense 110M-pair fill issues ~13k flush DMAs instead of ~107k — DMA
#: issue/wait overhead measured comparable to the whole vector pipeline
#: at 4 KB flushes (round-3 A/B, docs/design.md).
_FLUSH = 8192
_FROWS = _FLUSH // LANE


def _prefix128(x, lane_i):
    """Inclusive prefix sum along the 128 lanes of a [1, 128] i32 row."""
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lane_i >= s, pltpu.roll(x, s, 1), 0)
    return x


def _select_bit_row(word, rank):
    """Index of the ``rank``-th set bit of each lane's word ([1, 128])."""
    pos = jnp.zeros_like(rank)
    rem = rank
    for width in (16, 8, 4, 2, 1):
        lowmask = ((jnp.int32(1) << width) - 1) << pos
        c = jax.lax.population_count(word & lowmask)
        right = c <= rem
        rem = jnp.where(right, rem - c, rem)
        pos = jnp.where(right, pos + width, pos)
    return pos


class RowEmitter:
    """Register-carried emission of [1, 128] pair rows at a cursor.

    A VMEM read-modify-write at a dynamic cursor costs ~10x a plain
    store, and an SMEM cursor read on every vector step serializes the
    scalar and vector pipelines (measured: the RMW-ring first version
    spent 2/3 of the dense fill in the store path alone). So the partial
    output row lives in **loop-carried vector registers**: ``store_row``
    merges up to 128 new lanes into the carry with rolls and selects
    (pure dataflow — Mosaic pipelines it), and only a *completed* row
    touches memory, with one plain dynamic-index store into a 2-half
    staging ring (direct to the VMEM outputs in ``direct``/interpreter
    mode). Each full 64-row half leaves by async DMA; the only SMEM
    traffic is the rare flush bookkeeping.

    Carry tuple (threaded through the caller's fori loops):
      (va_carry [1,128], vb_carry [1,128], cnt, crow, gcnt)
    cnt = valid lanes in the carry (< 128), crow = next row slot
    (ring-relative, or absolute in direct mode), gcnt = pairs emitted.
    """

    def __init__(self, out_a, out_b, stag_a, stag_b, fsem, cur,
                 capacity, direct, lane_i):
        self.out_a, self.out_b = out_a, out_b
        self.stag_a, self.stag_b = stag_a, stag_b
        self.fsem = fsem
        self.cur = cur  # SMEM i32[4]: carry cnt/crow/gcnt + [3] = flushes
        self.capacity = capacity
        self.direct = direct
        self.lane_i = lane_i

    def _store_full(self, crow, va_full, vb_full):
        """One completed row: plain dynamic store (+ half flushes)."""
        if self.direct:
            nrows = self.out_a.shape[0]
            r = jnp.minimum(crow, nrows - 1)
            self.out_a[pl.ds(r, 1), :] = va_full
            self.out_b[pl.ds(r, 1), :] = vb_full
            return
        ring = crow - (crow // (2 * _FROWS)) * (2 * _FROWS)
        self.stag_a[pl.ds(ring, 1), :] = va_full
        self.stag_b[pl.ds(ring, 1), :] = vb_full

        @pl.when(ring - (ring // _FROWS) * _FROWS == _FROWS - 1)
        def _half_done():
            # Flush the just-completed half; before writes re-enter the
            # other half (_FROWS rows from now), drain its in-flight DMA.
            nf = self.cur[3]
            half = nf % 2
            base_row = nf * _FROWS
            pltpu.make_async_copy(
                self.stag_a.at[pl.ds(half * _FROWS, _FROWS)],
                self.out_a.at[pl.ds(base_row, _FROWS)],
                self.fsem.at[0, half]).start()
            pltpu.make_async_copy(
                self.stag_b.at[pl.ds(half * _FROWS, _FROWS)],
                self.out_b.at[pl.ds(base_row, _FROWS)],
                self.fsem.at[1, half]).start()

            @pl.when(nf >= 1)
            def _drain_other():
                other = (nf + 1) % 2
                prev_row = (nf - 1) * _FROWS
                pltpu.make_async_copy(
                    self.stag_a.at[pl.ds(other * _FROWS, _FROWS)],
                    self.out_a.at[pl.ds(prev_row, _FROWS)],
                    self.fsem.at[0, other]).wait()
                pltpu.make_async_copy(
                    self.stag_b.at[pl.ds(other * _FROWS, _FROWS)],
                    self.out_b.at[pl.ds(prev_row, _FROWS)],
                    self.fsem.at[1, other]).wait()

            self.cur[3] = nf + 1

    def store_row(self, carry, va, vb, nv):
        """Append lanes [0, nv) of ``va``/``vb`` ([1, 128] i32 rows)."""
        vaC, vbC, cnt, crow, gcnt = carry
        lane_i = self.lane_i
        ns = jnp.clip(self.capacity - gcnt, 0, nv)
        ra = pltpu.roll(va, cnt, 1)
        rb = pltpu.roll(vb, cnt, 1)
        m_new = (lane_i >= cnt) & (lane_i < cnt + ns)
        va2 = jnp.where(m_new, ra, vaC)
        vb2 = jnp.where(m_new, rb, vbC)
        total = cnt + ns
        full = total >= LANE

        @pl.when(full)
        def _complete():
            self._store_full(crow, va2, vb2)

        # Wrapped lanes of the cyclic roll are exactly the overflow.
        m_wrap = (lane_i < total - LANE) & full
        vaN = jnp.where(m_wrap, ra, jnp.where(full, 0, va2))
        vbN = jnp.where(m_wrap, rb, jnp.where(full, 0, vb2))
        inc = full.astype(jnp.int32)
        return (vaN, vbN, total - inc * LANE, crow + inc, gcnt + ns)

    def finish(self, carry):
        """Store the final partial row and drain/flush the tail."""
        vaC, vbC, cnt, crow, gcnt = carry

        @pl.when(cnt > 0)
        def _partial():
            self._store_full(crow, vaC, vbC)

        if self.direct:
            return
        # Rows written but not yet flushed sit in the half the cursor is
        # in; DMA whole halves (trailing garbage is masked host-side).
        nf = self.cur[3]
        last_row = crow + jnp.where(cnt > 0, 1, 0)

        @pl.when(nf >= 1)
        def _drain_prev():
            half = (nf - 1) % 2
            base_row = (nf - 1) * _FROWS
            pltpu.make_async_copy(
                self.stag_a.at[pl.ds(half * _FROWS, _FROWS)],
                self.out_a.at[pl.ds(base_row, _FROWS)],
                self.fsem.at[0, half]).wait()
            pltpu.make_async_copy(
                self.stag_b.at[pl.ds(half * _FROWS, _FROWS)],
                self.out_b.at[pl.ds(base_row, _FROWS)],
                self.fsem.at[1, half]).wait()

        @pl.when(last_row > nf * _FROWS)
        def _final():
            half = nf % 2
            base_row = nf * _FROWS
            for stag, out, s in ((self.stag_a, self.out_a, 0),
                                 (self.stag_b, self.out_b, 1)):
                dma = pltpu.make_async_copy(
                    stag.at[pl.ds(half * _FROWS, _FROWS)],
                    out.at[pl.ds(base_row, _FROWS)],
                    self.fsem.at[s, half])
                dma.start()
                dma.wait()


def _make_emit_kernel(kgt, idr, capacity, direct, mxu, nostore=False):
    """Emission kernel over one [1, 2*KGT, 128] mask block per grid step.

    Scalar tables (SMEM, per block): ``wstart_ref[0, 0, sl]`` = flat sorted
    index of window element 0 of mask rows (sl, h); ``cb_ref[0, 0, sl]`` =
    flat sorted index of the rows' chunk start (the a side; h adds 32);
    ``rp_ref[0, 0, rb]`` = per-mask-row pair count; ``nzsl_ref[0, 0, t]``
    = the t-th row group with any pairs (XLA-precompacted — dead groups
    cost nothing, and the loop trip counts are SMEM scalars, never
    vector-to-scalar reductions). ``ids_ref`` is the whole sorted-order
    id array as [idr, 128] rows resident in VMEM (i32 bit patterns —
    Mosaic has no unsigned ops).

    ``mxu=True`` routes the per-step one-hot selects and the popcount
    prefix through [1,128]x[128,128] matmuls on the otherwise-idle MXU
    (f32 is exact here: prefix sums <= 4096, mask words split in 16-bit
    halves, ids < 2^24 with multi-pass f32 precision) instead of
    [128,128]-wide where+sum-reduce chains on the VPU.
    """

    def kernel(wstart_ref, cb_ref, rp_ref, nzsl_ref, nzc_ref, mask_ref,
               ids_ref, out_a, out_b, *scratch):
        if direct:
            carry_buf, cur = scratch
            stag_a = stag_b = fsem = None
        else:
            stag_a, stag_b, fsem, carry_buf, cur = scratch
        i = pl.program_id(0)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        emitter = RowEmitter(out_a, out_b, stag_a, stag_b, fsem, cur,
                             capacity, direct, lane_i)
        if mxu:
            # TRIL[l, l'] = (l' <= l); strict upper TRIUS[l', l] = (l' < l).
            tril_f = (lane_j <= sub_j).astype(jnp.float32)
            trius_f = (sub_j < lane_j).astype(jnp.float32)
            ones_f = jnp.ones((1, LANE), jnp.float32)
            # Mosaic lowers DEFAULT and HIGHEST only; DEFAULT (one bf16
            # pass) truncates the 16-bit mask halves and the ids.
            hi3 = jax.lax.Precision.HIGHEST
            dn_row = (((1,), (0,)), ((), ()))      # [r,128]x[128,128]
            dn_col = (((1,), (1,)), ((), ()))      # [128,128]x[1,128]->col

        @pl.when(i == 0)
        def _init():
            cur[0] = 0
            cur[1] = 0
            cur[2] = 0
            cur[3] = 0
            carry_buf[:, :] = jnp.zeros((2, LANE), jnp.int32)

        carry = (carry_buf[0:1, :], carry_buf[1:2, :],
                 cur[0], cur[1], cur[2])

        def read_run(g0):
            """[1, 128] ids at sorted positions g0..g0+127 (roll-merge)."""
            lrow = jnp.clip(g0 // LANE, 0, idr - 2)
            lane0 = g0 - (g0 // LANE) * LANE
            two = ids_ref[pl.ds(lrow, 2), :]
            rolled = pltpu.roll(two, -lane0, 1)
            return jnp.where(lane_i < LANE - lane0,
                             rolled[0:1, :], rolled[1:2, :])

        def group_body(t, carry):
            sl = nzsl_ref[0, 0, t]
            tr0 = rp_ref[0, 0, sl * 2]
            tr1 = rp_ref[0, 0, sl * 2 + 1]
            m2 = mask_ref[0, pl.ds(sl * 2, 2), :]     # [2, 128] i32
            brow = read_run(wstart_ref[0, 0, sl])     # window ids
            arow = read_run(cb_ref[0, 0, sl])         # chunk ids
            if mxu:
                brow_f = brow.astype(jnp.float32)
                arow_f = arow.astype(jnp.float32)
            else:
                Bcol = jnp.swapaxes(brow, 0, 1)       # [128, 1]
                Acol = jnp.swapaxes(arow, 0, 1)

            for h, tr in ((0, tr0), (1, tr1)):
                # Empty rows of a live group pass through as zero-trip
                # step loops (their prep below is wasted but branch-free
                # — pl.when cannot update loop-carried values).
                m = m2[h:h + 1, :]                 # [1, 128]
                wpc = jax.lax.population_count(m)
                if mxu:
                    wpc_f = wpc.astype(jnp.float32)
                    # Popcount prefix on the MXU, directly in column
                    # orientation (sums <= 4096, exact).
                    Ccol = jax.lax.dot_general(
                        tril_f, wpc_f, dn_col).astype(jnp.int32)
                    ex_f = jax.lax.dot_general(
                        wpc_f, trius_f, dn_row)       # exclusive row
                    mlo_f = (m & 0xFFFF).astype(jnp.float32)
                    mhi_f = ((m >> 16) & 0xFFFF).astype(jnp.float32)
                    S4 = jnp.concatenate(
                        [mlo_f, mhi_f, ex_f, brow_f], axis=0)
                else:
                    C = _prefix128(wpc, lane_i)
                    EX = C - wpc                   # word rank bases
                    Ccol = jnp.swapaxes(C, 0, 1)
                    EXcol = jnp.swapaxes(EX, 0, 1)
                    Mcol = jnp.swapaxes(m, 0, 1)

                def st_body(st, carry):
                    k = st * LANE + lane_i         # output ranks
                    if mxu:
                        le_f = (Ccol <= k).astype(jnp.float32)
                        lane = jax.lax.dot_general(
                            ones_f, le_f, dn_row).astype(jnp.int32)
                        oht_f = (sub_j == lane).astype(jnp.float32)
                        sel = jax.lax.dot_general(
                            S4, oht_f, dn_row, precision=hi3)
                        word = sel[0:1].astype(jnp.int32) \
                            | (sel[1:2].astype(jnp.int32) << 16)
                        ex = sel[2:3].astype(jnp.int32)
                        idb = sel[3:4].astype(jnp.int32)
                        bit = _select_bit_row(word, k - ex)
                        oh2_f = (sub_j == (bit + h * 32)).astype(
                            jnp.float32)
                        ida = jax.lax.dot_general(
                            arow_f, oh2_f, dn_row,
                            precision=hi3).astype(jnp.int32)
                    else:
                        le = (Ccol <= k).astype(jnp.int32)
                        lane = jnp.sum(le, axis=0, keepdims=True,
                                       dtype=jnp.int32)
                        oht = sub_j == lane        # one-hot columns
                        word = jnp.sum(jnp.where(oht, Mcol, 0), axis=0,
                                       keepdims=True, dtype=jnp.int32)
                        ex = jnp.sum(jnp.where(oht, EXcol, 0), axis=0,
                                     keepdims=True, dtype=jnp.int32)
                        idb = jnp.sum(jnp.where(oht, Bcol, 0), axis=0,
                                      keepdims=True, dtype=jnp.int32)
                        bit = _select_bit_row(word, k - ex)
                        oh2 = sub_j == (bit + h * 32)
                        ida = jnp.sum(jnp.where(oh2, Acol, 0), axis=0,
                                      keepdims=True, dtype=jnp.int32)
                    nv = jnp.minimum(tr - st * LANE, LANE)
                    if nostore:
                        # Perf-bisection: pure-dataflow accumulate.
                        vaC, vbC, cnt, crow, gcnt = carry
                        return (vaC ^ ida, vbC ^ idb, cnt, crow,
                                gcnt + nv)
                    return emitter.store_row(carry, ida, idb, nv)

                carry = jax.lax.fori_loop(
                    0, (tr + LANE - 1) // LANE, st_body, carry)

            return carry

        carry = jax.lax.fori_loop(0, nzc_ref[0, 0, 0], group_body, carry)

        carry_buf[0:1, :] = carry[0]
        carry_buf[1:2, :] = carry[1]
        cur[0] = carry[2]
        cur[1] = carry[3]
        cur[2] = carry[4]

        @pl.when(i == pl.num_programs(0) - 1)
        def _finish():
            if not nostore:
                emitter.finish(carry)

    return kernel


def emit_pairs(B, wstart_tab, cb_tab, ids_flat, capacity, rp_tab=None,
               interpret=False, mxu=False, nostore=False):
    """Emit (ida, idb) pair buffers from packed sweep masks.

    Args:
      B: uint32[NB, 2*KGT, 128] packed masks in the sweep's native
        layout (mask row ``(nb, 2*sl + h)``, bit ``b`` of lane ``l`` =
        sorted-index pair ``(cb_tab[nb, sl] + h*32 + b,
        wstart_tab[nb, sl] + l)``).
      wstart_tab: int32[NB, KGT] flat sorted start of each row group's
        128-element window (any alignment — rolled and aligned layouts
        both reduce to this form).
      cb_tab: int32[NB, KGT] flat sorted start of each row group's
        64-sphere chunk.
      ids_flat: uint32[nsort] sorted-order original ids (must fit VMEM
        as [nsort/128, 128] — callers gate on this).
      capacity: static output capacity (> 0).
      interpret: Pallas interpreter mode (CPU tests).
      mxu: route the per-step one-hot selects through the MXU instead
        of VPU where+sum chains (perf A/B hook; measured SLOWER on v5e —
        1.22 vs 0.64 s on the dense fill, the serial-dependent small
        matmuls are MXU-latency-bound).

    Returns:
      (ida uint32[capacity], idb uint32[capacity]) — the first
      min(total, capacity) pairs in ascending (mask row, lane, bit)
      order; slots past the written prefix hold unspecified values
      (callers mask with the separately-computed total).
    """
    NB, rb2, _ = B.shape
    kgt = rb2 // 2
    nsort = ids_flat.shape[0]
    idr = -(-nsort // LANE) + 1            # +1: roll-merge overreach row
    ids2d = jnp.zeros((idr * LANE,), jnp.uint32).at[:nsort].set(ids_flat)
    ids2d = jax.lax.bitcast_convert_type(
        ids2d, jnp.int32).reshape(idr, LANE)

    # Per-row pair counts (SMEM loop bounds) and the compacted list of
    # row groups with any pairs: dead groups cost the kernel nothing.
    # Callers that already popcounted B (fill's total/overflow pass)
    # hand the row table in — the mask buffer then streams exactly once
    # through XLA and once through the kernel.
    if rp_tab is None:
        rp_tab = jnp.sum(
            jax.lax.population_count(B).astype(jnp.int32), axis=2,
            dtype=jnp.int32)
    grp_nz = (rp_tab.reshape(NB, kgt, 2).sum(axis=2) > 0)
    sl_iota = jnp.arange(kgt, dtype=jnp.int32)[None, :]
    nzsl_tab = jnp.sort(
        jnp.where(grp_nz, sl_iota, jnp.int32(kgt)), axis=1)
    nzsl_tab = jnp.minimum(nzsl_tab, kgt - 1)
    nzc_tab = jnp.sum(grp_nz, axis=1, dtype=jnp.int32)

    cap_pad = max(-(-int(capacity) // (2 * _FLUSH)) * (2 * _FLUSH),
                  2 * _FLUSH)
    cap_rows = cap_pad // LANE

    direct = bool(interpret)
    kernel = _make_emit_kernel(kgt, idr, cap_pad, direct, bool(mxu),
                               bool(nostore))
    out_space = pltpu.VMEM if direct else pltpu.ANY
    scratch = [pltpu.VMEM((2, LANE), jnp.int32),
               pltpu.SMEM((4,), jnp.int32)]
    if not direct:
        scratch = [
            pltpu.VMEM((2 * _FROWS, LANE), jnp.int32),
            pltpu.VMEM((2 * _FROWS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] + scratch

    smem_tab = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    out_a, out_b = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            smem_tab(kgt),                         # wstart
            smem_tab(kgt),                         # cb
            smem_tab(rb2),                         # per-row pair counts
            smem_tab(kgt),                         # nonzero group list
            smem_tab(1),                           # nonzero group count
            pl.BlockSpec((1, rb2, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=out_space),
            pl.BlockSpec(memory_space=out_space),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((cap_rows, LANE), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(wstart_tab.reshape(NB, 1, kgt), cb_tab.reshape(NB, 1, kgt),
      rp_tab.reshape(NB, 1, rb2), nzsl_tab.reshape(NB, 1, kgt),
      nzc_tab.reshape(NB, 1, 1),
      jax.lax.bitcast_convert_type(B, jnp.int32), ids2d)

    ida = jax.lax.bitcast_convert_type(out_a, jnp.uint32).reshape(-1)
    idb = jax.lax.bitcast_convert_type(out_b, jnp.uint32).reshape(-1)
    return ida[:capacity], idb[:capacity]
