"""Run-expansion pair enumeration: scatter-free fill at any capacity.

The reference enumerates pairs by writing each hit through a global atomic
cursor into a device buffer bounded only by memory
(/root/reference/collision/collision.cl:202-215). TPUs have no global
atomics — and the round-1 workaround (pairs resident in VMEM during the
sweep) capped capacity at 262144. This module removes the cap the TPU way:
pair enumeration becomes a **feed-forward dense pipeline** of sorts,
cumulative sums and gathers — no scatter, no atomics, no Pallas — bounded
only by HBM, working at input precision (float32 or float64).

Pipeline (all inside one jit):
  1. Column sort (columns._column_sort): spheres sorted by
     ``column_id << zbits | quantize(z)`` — each xy-column is a z-sorted
     contiguous run.
  2. Per-sphere candidate **runs**: for each sorted sphere i and each of
     the 5 half-stencil column offsets, the conservative z-window of
     possible partners (|z_i - z_j| < r_i + r_max is necessary for
     overlap) is one ``searchsorted`` range in the sorted key array —
     batched into a single hierarchical lookup (ops/offset.py). Runs are
     exact supersets; the self-offset run starts at i+1 (the j > i dedup,
     the analog of the reference's right_edge rule, collision.cl:198-200).
  3. Zero-length runs are compacted away; an inclusive scan of run
     lengths lays all candidates out in one flat deterministic order
     (sorted-sphere-major, offset-minor, ascending j).
  4. Candidate pass (chunked ``lax.scan``): for every candidate slot,
     recover its run via a consecutive-query lookup (each kept run
     consumes >= 1 slot, so a strided coarse search plus an S-wide refine
     window is exact), gather both spheres' AABBs, apply the exact strict
     overlap test -> survivor bitmask.
  5. Count-then-fill without a cursor: a two-level cumulative sum of the
     survivor mask assigns each surviving candidate its output slot; the
     pair buffer is built by the **inverse** lookup (output slot ->
     candidate index, another hierarchical searchsorted) followed by pure
     gathers of the two original sphere ids.

Contract parity (SURVEY §3.1): exact unordered unique pairs of original
ids under strict AABB overlap; the returned total is the true count even
past ``capacity`` while only the first ``capacity`` pairs are
materialized, in deterministic order; unfilled slots hold 0xFFFFFFFF.

The only scene-dependent knob is ``cand_capacity`` (static upper bound on
conservative candidates). Overflow is *detected* (``ok=False``, with the
exact requirement returned for the host retry) — never a silent wrong
answer, mirroring the reference's count-past-capacity retry contract.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .columns import (
    CHUNK, COLUMN_OFFSETS, LANE, _column_sort, _quantize, _zbits)
from .ops.offset import sorted_bucket_starts
from .ops.scan import inclusive_scan

NO_PAIR = np.uint32(0xFFFFFFFF)

#: Refine width of the consecutive-query run lookup (coarse search every
#: S-th candidate; exact because every kept run covers >= 1 candidate).
_S = 8


def _auto_strides(table_len):
    """Stride pyramid keeping every dense top-level compare small."""
    strides = [64]
    r = -(-table_len // 64)
    while r > 256:
        strides.append(128)
        r = -(-r // 128)
    return tuple(strides)


def _run_of_consecutive(ic, k0, m):
    """Run index for the m consecutive candidates starting at k0.

    ``ic`` is the inclusive cumsum of kept (length >= 1) run lengths,
    padded past the last run with the total. The run of candidate k is
    the first r with ic[r] > k; for a block of S consecutive candidates
    those runs all lie within S entries of the first — one hierarchical
    lookup per S queries plus an S-wide gathered refine window.
    """
    nseg = m // _S
    q0 = k0 + jnp.arange(nseg, dtype=jnp.int32) * _S
    r0 = sorted_bucket_starts(ic, q0 + 1, strides=_auto_strides(ic.shape[0]))
    win = jnp.take(ic, r0[:, None] + jnp.arange(_S)[None, :], axis=0)
    kseg = q0[:, None] + jnp.arange(_S, dtype=jnp.int32)[None, :]
    radd = jnp.sum(
        win[:, None, :] <= kseg[:, :, None], axis=-1, dtype=jnp.int32)
    return (r0[:, None] + radd).reshape(m)


def _candidate_runs(cs, gxy):
    """Per-sphere conservative z-window runs, 5 half-stencil offsets each.

    Returns (run_w0, run_len, run_i), each [5n] in candidate order:
    sorted-sphere-major, offset-minor, ascending j.
    """
    n = cs.key_s.shape[0]
    zbits = _zbits(gxy)
    zmax = (1 << zbits) - 1
    col_s = (cs.key_s >> zbits).astype(jnp.int32)
    cx = col_s // gxy
    cy = col_s % gxy
    half = cs.r_s + cs.r_max  # |z_i - z_j| < r_i + r_max is necessary
    qlo = _quantize(cs.z_s - half, cs.lo_s[2], cs.zscale, zmax)
    qhi = _quantize(cs.z_s + half, cs.lo_s[2], cs.zscale, zmax)

    keys_q, valid = [], []
    for (dx, dy) in COLUMN_OFFSETS:
        xb = cx + dx
        yb = cy + dy
        okc = (yb >= 0) & (yb < gxy) & (xb < gxy)
        cb = (xb * gxy + jnp.clip(yb, 0, gxy - 1)).astype(jnp.uint32)
        keys_q.append((cb << zbits) + qlo)
        keys_q.append((cb << zbits) + qhi + 1)
        valid.append(okc)
    pos = sorted_bucket_starts(
        cs.key_s, jnp.stack(keys_q).reshape(-1),
        strides=_auto_strides(n),
    ).reshape(5, 2, n)

    i_idx = jnp.arange(n, dtype=jnp.int32)
    w0s, lens = [], []
    for off in range(5):
        w0 = pos[off, 0]
        wend = pos[off, 1]
        if COLUMN_OFFSETS[off] == (0, 0):
            w0 = jnp.maximum(w0, i_idx + 1)  # j > i dedup in own column
        w0 = jnp.where(valid[off], w0, 0)
        wlen = jnp.where(valid[off], jnp.maximum(wend - w0, 0), 0)
        w0s.append(w0)
        lens.append(wlen)
    run_w0 = jnp.stack(w0s, axis=1).reshape(-1)    # [5n]
    run_len = jnp.stack(lens, axis=1).reshape(-1)  # [5n]
    run_i = jnp.repeat(i_idx, 5)
    return run_w0, run_len, run_i


@partial(jax.jit, static_argnames=("gxy",))
def candidate_count(coords, radii, gxy):
    """Exact conservative-candidate total as float32 (overflow-proof).

    The host uses this to size ``cand_capacity`` in one shot after an
    ``ok=False`` fill (XLA's tree-reduced f32 sum is accurate to ~2^-20
    relative — exact enough to size a buffer with a small margin).
    """
    cs = _column_sort(coords, radii, gxy)
    _, run_len, _ = _candidate_runs(cs, gxy)
    return jnp.sum(run_len.astype(jnp.float32))


@partial(jax.jit, static_argnames=("capacity", "gxy", "cand_capacity",
                                   "chunk"))
def _run_fill(coords, radii, capacity, gxy, cand_capacity, chunk):
    n = coords.shape[0]
    cs = _column_sort(coords, radii, gxy)
    ids_s = cs.ids_s

    # Sorted AABB component arrays (input precision).
    axlo = cs.x_s - cs.r_s
    axhi = cs.x_s + cs.r_s
    aylo = cs.y_s - cs.r_s
    ayhi = cs.y_s + cs.r_s
    azlo = cs.z_s - cs.r_s
    azhi = cs.z_s + cs.r_s

    run_w0, run_len, run_i = _candidate_runs(cs, gxy)

    # --- compact away zero-length runs (the consecutive-query lookup
    # requires every kept run to cover >= 1 candidate) ---
    nruns = run_len.shape[0]
    keep = run_len > 0
    keep_ic = inclusive_scan(keep.astype(jnp.int32))
    n_kept = keep_ic[-1]
    total_cand = jnp.sum(run_len)
    # Guard the int32 candidate arithmetic itself: XLA's tree reduction
    # makes the f32 sum accurate to ~2^-20 relative, so a margined
    # threshold below 2^31 is a sound overflow detector (a clustered
    # scene can have ~n^2 conservative candidates).
    fsum = jnp.sum(run_len.astype(jnp.float32))
    ok = (total_cand <= cand_capacity) & (fsum < float(2 ** 31 - 2 ** 26))
    sel_r = sorted_bucket_starts(
        keep_ic, jnp.arange(nruns, dtype=jnp.int32) + 1,
        strides=_auto_strides(nruns))
    sel_r = jnp.minimum(sel_r, nruns - 1)
    live_r = jnp.arange(nruns, dtype=jnp.int32) < n_kept
    c_len = jnp.where(live_r, jnp.take(run_len, sel_r), 0)
    c_w0 = jnp.where(live_r, jnp.take(run_w0, sel_r), 0)
    c_i = jnp.where(live_r, jnp.take(run_i, sel_r), 0)
    c_ic = inclusive_scan(c_len)                    # pad tail == total_cand
    c_ex = c_ic - c_len

    # --- candidate pass: survivor bitmask, chunked ---
    nch = -(-cand_capacity // chunk)

    def chunk_mask(c, _):
        k0 = c * chunk
        k = k0 + jnp.arange(chunk, dtype=jnp.int32)
        r = _run_of_consecutive(c_ic, k0, chunk)
        r = jnp.minimum(r, nruns - 1)
        i = jnp.take(c_i, r)
        j = jnp.take(c_w0, r) + (k - jnp.take(c_ex, r))
        jc = jnp.clip(j, 0, n - 1)
        m = (jnp.take(axhi, i) > jnp.take(axlo, jc)) \
            & (jnp.take(axlo, i) < jnp.take(axhi, jc))
        m &= (jnp.take(ayhi, i) > jnp.take(aylo, jc)) \
            & (jnp.take(aylo, i) < jnp.take(ayhi, jc))
        m &= (jnp.take(azhi, i) > jnp.take(azlo, jc)) \
            & (jnp.take(azlo, i) < jnp.take(azhi, jc))
        m &= k < total_cand
        return c + 1, m.astype(jnp.int8)

    _, mask = jax.lax.scan(
        chunk_mask, jnp.int32(0), None, length=nch)
    mask = mask.reshape(-1)[:cand_capacity]

    ic_mask = inclusive_scan(mask.astype(jnp.int32))
    total = ic_mask[-1]

    if capacity == 0:
        return None, total.astype(jnp.uint32), ok

    # --- output slot -> candidate index -> (i, j) -> original ids ---
    q = jnp.arange(capacity, dtype=jnp.int32)
    sel_c = sorted_bucket_starts(
        ic_mask, q + 1, strides=_auto_strides(cand_capacity))
    sel_c = jnp.minimum(sel_c, cand_capacity - 1)
    r = sorted_bucket_starts(
        c_ic, sel_c + 1, strides=_auto_strides(nruns))
    r = jnp.minimum(r, nruns - 1)
    i = jnp.take(c_i, r)
    j = jnp.clip(jnp.take(c_w0, r) + (sel_c - jnp.take(c_ex, r)), 0, n - 1)
    ida = jnp.take(ids_s, i)
    idb = jnp.take(ids_s, j)
    live = q < jnp.minimum(total, capacity)
    pairs = jnp.where(
        live[:, None],
        jnp.stack([ida, idb], axis=1),
        jnp.uint32(NO_PAIR),
    )
    return pairs, total.astype(jnp.uint32), ok


#  ---------------------------------------------------------------------
#  Mask fill: the TPU fast path.
#
#  run_fill above is pure XLA but *gather-bound* on TPU: its candidate
#  pass does ~12 scalar gathers per candidate, and a v5e scalar gather
#  costs ~9 ns/element regardless of table size or index order (measured,
#  benchmarks/exp_gather.py) — 5.9 s/step at 1M spheres. The mask fill
#  keeps the candidate testing inside the Pallas column sweep
#  (kernels/sweep.py sweep_masks — no gathers at all) and makes emission
#  *sparse*: mask rows with no set bits (the vast majority on realistic
#  scenes — ~6k of 45M words are nonzero at 1M uniform) are compacted
#  away before any per-word work, at two granularities (128-word lane
#  rows, then single words). Every dense op stays in the mask buffer's
#  native [rows, 128] layout — the round-2 pipeline's flat reshape +
#  [N, 8]-unit relayout were ~9.3 ms of pure data movement at 1M
#  (profiled: reshape 5.0 ms + layout copy 4.3 ms, exp_r3_prof.py).
#  ---------------------------------------------------------------------

def _select_bit(word, rank):
    """Index of the ``rank``-th set bit of ``word`` (binary partition by
    popcount — 5 wide rounds, no per-element loops)."""
    pos = jnp.zeros_like(word, dtype=jnp.int32)
    rem = rank
    for width in (16, 8, 4, 2, 1):
        lowmask = ((jnp.uint32(1) << width) - 1) << pos.astype(jnp.uint32)
        c = jax.lax.population_count(word & lowmask).astype(jnp.int32)
        right = c <= rem
        rem = jnp.where(right, rem - c, rem)
        pos = jnp.where(right, pos + width, pos)
    return pos


def _mask_fill_emit(B, starts, w0_flat, mc, ids_flat, capacity, rpw,
                    total, kcap=None, noff=5, rolled=False):
    """Emit (ida, idb) SoA pair buffers from packed sweep masks.

    ``B``: uint32[ncols*NG, KG*noff*rpw*2, 128] from sweep_masks
    (``noff=5``, aligned window rows) or slab_sweep_masks (``noff=2``,
    ``rolled=True``: lane l of tile row r = window element
    w0 + r*128 + l). A word's flat (row, lane) position decodes to
    (column, chunk group, tile slot, half, stream lane); bit b = chunk
    sublane h*32+b. ``starts``/``w0_flat`` are the plan's column starts
    and flattened window-start table; ``mc`` the chunk capacity.

    Emission is *sparse*, at two granularities that both stay in the
    mask buffer's native [rows, 128] layout (the round-2 pipeline's flat
    reshape + unit relayout were ~9.3 ms of pure data movement at 1M):

      1. rows with no set bits (the vast majority on realistic scenes —
         ~6k of 45M words are nonzero at 1M uniform) are compacted away
         by an inclusive scan + hierarchical select, capped at
         ``capacity + margin`` rows (each kept row holds >= 1 pair, so
         the prefix is exact — ``trunc_safe`` reports when the cap was
         provably sufficient);
      2. nonzero words within the kept rows are compacted the same way.

    Each output slot then resolves its word by one hierarchical
    searchsorted into the kept words' cumulative popcounts, its bit by
    rank-select, and decodes (column, chunk, half, stream row) back to
    the two sorted indices with pure arithmetic — per-pair work is a
    handful of scalar gathers (~9 ns each on v5e), paid only for the
    ``capacity`` slots actually materialized.
    """
    from .kernels.sweep import mask_groups

    kg, ng = mask_groups(mc, rpw)
    kgt = kg * noff * rpw

    Bv = B.reshape(-1, LANE)               # layout-preserving: minor=128
    Rw = Bv.shape[0]
    imax = jnp.int32(2 ** 31 - 1)

    pc = jax.lax.population_count(Bv).astype(jnp.int32)    # [Rw, 128]
    row_pairs = jnp.sum(pc, axis=1)                        # [Rw]

    # --- level 1: compact hit rows (128-word granularity) ---
    cap_k = capacity + 8 if kcap is None else kcap
    RK = max(min(Rw, cap_k), 1)
    ic_r = inclusive_scan((row_pairs > 0).astype(jnp.int32))
    nkr = ic_r[-1]
    ordr = jnp.arange(RK, dtype=jnp.int32)
    rsel = jnp.minimum(
        sorted_bucket_starts(ic_r, ordr + 1, strides=_auto_strides(Rw)),
        Rw - 1)
    live_r = ordr < nkr
    rows = jnp.where(
        live_r[:, None], jnp.take(Bv, rsel, axis=0), 0)    # [RK, 128]
    # Truncation is exact iff every hit row was kept, or the kept prefix
    # already covers ``capacity`` pairs.
    csum_rp = inclusive_scan(row_pairs)
    safe_r = (nkr <= RK) | (jnp.take(csum_rp, rsel[RK - 1]) >= capacity)

    # --- level 2: compact nonzero words within kept rows ---
    wpc = jax.lax.population_count(rows).astype(jnp.int32)  # [RK, 128]
    wflat = rows.reshape(-1)
    wpcf = wpc.reshape(-1)
    ic_pf = inclusive_scan(wpcf)       # global pair cum (kept rows only,
    #                                    == global: dropped rows are empty)
    WK = max(min(RK * LANE, cap_k), 1)
    ic_w = inclusive_scan((wpcf > 0).astype(jnp.int32))
    nkw = ic_w[-1]
    ordw = jnp.arange(WK, dtype=jnp.int32)
    wsel = jnp.minimum(
        sorted_bucket_starts(ic_w, ordw + 1,
                             strides=_auto_strides(RK * LANE)),
        RK * LANE - 1)
    live_w = ordw < nkw
    wval = jnp.where(live_w, jnp.take(wflat, wsel), jnp.uint32(0))
    wpc_s = jnp.where(live_w, jnp.take(wpcf, wsel), 0)
    wcum_s = jnp.where(live_w, jnp.take(ic_pf, wsel), imax)
    grow_w = jnp.take(rsel, wsel // LANE)      # global mask row per word
    lane_w = wsel % LANE
    safe_w = (nkw <= WK) | (jnp.take(ic_pf, wsel[WK - 1]) >= capacity)
    trunc_safe = safe_r & safe_w

    # --- per-slot resolution ---
    q = jnp.arange(capacity, dtype=jnp.int32)
    sel = jnp.minimum(
        sorted_bucket_starts(wcum_s, q + 1, strides=_auto_strides(WK)),
        WK - 1)
    word = jnp.take(wval, sel)
    rank = jnp.maximum(
        q - (jnp.take(wcum_s, sel) - jnp.take(wpc_s, sel)), 0)
    bit = _select_bit(word, rank)
    R = jnp.take(grow_w, sel)
    lane = jnp.take(lane_w, sel)

    # --- decode (mask row, lane, bit) -> sorted stream indices ---
    h = R % 2
    sl = (R // 2) % kgt
    nb = R // (2 * kgt)
    colg = nb // ng
    g = nb % ng
    kk = sl // (noff * rpw)
    off = (sl // rpw) % noff
    r = sl % rpw
    k = jnp.minimum(g * kg + kk, mc - 1)

    nsort = ids_flat.shape[0]
    i = jnp.take(starts, jnp.minimum(colg, starts.shape[0] - 1)) \
        + k * CHUNK + h * 32 + bit
    w0u = jnp.take(w0_flat, (colg * mc + k) * noff + off)
    if rolled:
        j = w0u + r * LANE + lane
    else:
        j = (w0u // LANE + r) * LANE + lane
    ida = jnp.take(ids_flat, jnp.clip(i, 0, nsort - 1))
    idb = jnp.take(ids_flat, jnp.clip(j, 0, nsort - 1))
    live = q < jnp.minimum(total, capacity)
    return (jnp.where(live, ida, jnp.uint32(NO_PAIR)),
            jnp.where(live, idb, jnp.uint32(NO_PAIR)),
            trunc_safe)


#: Capacity above which the blocked emission replaces the single-shot
#: sparse path, whose compaction tables and searchsorted windows are
#: capacity-sized: a 110M-slot fill would materialize a [capacity, 128]
#: pyramid window — 56 GB. (Measured OOM on the reference's dense
#: 107.6M-pair scene, round 3.)
BIG_FILL_THRESHOLD = 1 << 21

#: Kept-row table bound of the blocked emission (1-D int32 arrays only,
#: so this can sit far above the single-shot path's [RK, 128] budget).
_BIG_ROWCAP = 1 << 24


def _mask_fill_emit_big(B, starts, w0_flat, mc, ids_flat, capacity, rpw,
                        total, kcap=None, noff=5, rolled=False,
                        blk=1 << 19):
    """Blocked pair emission for huge capacities (dense full fills).

    The single-shot sparse path (:func:`_mask_fill_emit`) materializes
    capacity-sized word-compaction tables and resolves every output slot
    against them — [capacity, 128] searchsorted windows and ~5 scalar
    gathers per pair into capacity-sized tables. Fine at 16k slots;
    56 GB of intermediates and seconds of gather time at the reference's
    dense 107.6M-pair scene. This variant keeps every persistent array
    1-D and resolves slots in ``blk``-sized blocks (``lax.map``):

      row ordinal: one pyramid searchsorted into the kept-row pair
        cumsum ([RK] table — each kept row holds >= 1 pair);
      mask row: one wide-row gather straight out of the mask buffer
        (DMA-shaped 512-byte rows; the [RK, 128] kept-rows tensor never
        materializes);
      word + rank: in-row lane cumsum + one-hot select — dense vector
        ops, no scalar gathers into capacity-sized tables anywhere.

    Exactness does not depend on ``blk``; ``trunc_safe`` reports whether
    the kept-row cap provably covered ``capacity`` (the level-1 contract
    of the single-shot path, unchanged). This restores the reference's
    memory-bound emission cost shape (collision.cl:202-215): per-pair
    work is a handful of dense vector ops at HBM bandwidth.
    """
    from .kernels.sweep import mask_groups

    kg, ng = mask_groups(mc, rpw)
    kgt = kg * noff * rpw

    Bv = B.reshape(-1, LANE)               # layout-preserving: minor=128
    Rw = Bv.shape[0]
    imax = jnp.int32(2 ** 31 - 1)

    pc = jax.lax.population_count(Bv).astype(jnp.int32)
    row_pairs = jnp.sum(pc, axis=1)                        # [Rw]

    # Level 1 in 1-D form: kept-row indices + their pair cumsum.
    cap_k = capacity + 8 if kcap is None else kcap
    RK = max(min(Rw, cap_k, _BIG_ROWCAP), 1)
    ic_r = inclusive_scan((row_pairs > 0).astype(jnp.int32))
    nkr = ic_r[-1]
    ordr = jnp.arange(RK, dtype=jnp.int32)
    rsel = jnp.minimum(
        sorted_bucket_starts(ic_r, ordr + 1, strides=_auto_strides(Rw)),
        Rw - 1)
    live_r = ordr < nkr
    csum_rp = inclusive_scan(row_pairs)
    # Cumulative pairs over *kept* rows == csum over all rows at the kept
    # positions (dropped rows are empty); dead tail pinned to +inf so the
    # slot search never lands past the live region.
    row_cum = jnp.where(live_r, jnp.take(csum_rp, rsel), imax)
    safe_r = (nkr <= RK) | (jnp.take(csum_rp, rsel[RK - 1]) >= capacity)

    nsort = ids_flat.shape[0]
    lane_i = jnp.arange(LANE, dtype=jnp.int32)[None, :]
    lim = jnp.minimum(total, capacity)
    nblk = -(-capacity // blk)
    r_strides = _auto_strides(RK)

    def block(b):
        q = b * blk + jnp.arange(blk, dtype=jnp.int32)
        r_sel = jnp.minimum(
            sorted_bucket_starts(row_cum, q + 1, strides=r_strides),
            RK - 1)
        R = jnp.take(rsel, r_sel)          # global mask-buffer row
        rowdata = jnp.take(Bv, R, axis=0)                  # [blk, 128]
        wpc_r = jax.lax.population_count(rowdata).astype(jnp.int32)
        lane_cum = jnp.cumsum(wpc_r, axis=1)
        pb_row = jnp.where(r_sel > 0, jnp.take(row_cum, r_sel - 1), 0)
        rem = q - pb_row                   # pair rank within the row
        lane = jnp.sum((lane_cum <= rem[:, None]).astype(jnp.int32),
                       axis=1)
        onehot = lane_i == lane[:, None]
        word = jnp.sum(jnp.where(onehot, rowdata, jnp.uint32(0)),
                       axis=1, dtype=jnp.uint32)
        before = jnp.sum(jnp.where(lane_i < lane[:, None], wpc_r, 0),
                         axis=1, dtype=jnp.int32)
        rank = jnp.maximum(rem - before, 0)
        bit = _select_bit(word, rank)

        # --- decode (mask row, lane, bit) -> sorted stream indices ---
        # (identical arithmetic to _mask_fill_emit's tail)
        h = R % 2
        sl = (R // 2) % kgt
        nb_ = R // (2 * kgt)
        colg = nb_ // ng
        g = nb_ % ng
        kk = sl // (noff * rpw)
        off = (sl // rpw) % noff
        r = sl % rpw
        k = jnp.minimum(g * kg + kk, mc - 1)
        i = jnp.take(starts, jnp.minimum(colg, starts.shape[0] - 1)) \
            + k * CHUNK + h * 32 + bit
        w0u = jnp.take(w0_flat, (colg * mc + k) * noff + off)
        if rolled:
            j = w0u + r * LANE + lane
        else:
            j = (w0u // LANE + r) * LANE + lane
        ida = jnp.take(ids_flat, jnp.clip(i, 0, nsort - 1))
        idb = jnp.take(ids_flat, jnp.clip(j, 0, nsort - 1))
        live = q < lim
        return (jnp.where(live, ida, jnp.uint32(NO_PAIR)),
                jnp.where(live, idb, jnp.uint32(NO_PAIR)))

    ida, idb = jax.lax.map(block, jnp.arange(nblk, dtype=jnp.int32))
    return (ida.reshape(-1)[:capacity], idb.reshape(-1)[:capacity],
            safe_r)


def _pick_emit(capacity, emit_blk):
    """Emission path for a static capacity: single-shot sparse below
    BIG_FILL_THRESHOLD, blocked above; ``emit_blk`` forces the blocked
    path with that block size (test hook / perf knob)."""
    if emit_blk is not None:
        return partial(_mask_fill_emit_big, blk=int(emit_blk))
    if capacity > BIG_FILL_THRESHOLD:
        return _mask_fill_emit_big
    return _mask_fill_emit


def mask_fill(coords, radii, capacity, gxy, col_capacity, slab_rows,
              rpw=2, interpret=False, chunk_blocks=1 << 16, kcap=None,
              emit_blk=None):
    """Gather-free TPU pair enumeration from packed sweep masks.

    Returns (ida[capacity], idb[capacity], total, ok) — SoA uint32 pair
    buffers (a [capacity, 2] AoS array tiles to 64x its size on TPU;
    callers stack only when small). ``ok`` is False when the plan's
    static knobs were insufficient (host retries with exact stats).
    ``kcap`` optionally bounds the kept-row/word tables below the
    always-safe ``capacity`` default — a perf knob for huge fills,
    covered by ``ok``. ``chunk_blocks`` is accepted for API
    compatibility; the sparse emission no longer chunks. Capacities
    above BIG_FILL_THRESHOLD emit through the blocked big-fill path
    (``emit_blk`` forces it with a given block size).
    """
    return _mask_fill_impl(
        coords, radii, int(capacity), int(gxy), int(col_capacity),
        int(slab_rows), int(rpw), bool(interpret), int(chunk_blocks),
        None if kcap is None else int(kcap),
        None if emit_blk is None else int(emit_blk))


@partial(jax.jit, static_argnames=(
    "capacity", "gxy", "col_capacity", "slab_rows", "rpw", "interpret",
    "chunk_blocks", "kcap", "emit_blk"))
def _mask_fill_impl(coords, radii, capacity, gxy, col_capacity, slab_rows,
                    rpw, interpret, chunk_blocks, kcap=None,
                    emit_blk=None):
    from .columns import plan_columns
    from .kernels.sweep import sweep_masks

    plan = plan_columns(
        jnp.asarray(coords, jnp.float32), jnp.asarray(radii, jnp.float32),
        gxy, col_capacity, slab_rows)
    B = sweep_masks(plan, rpw=rpw, interpret=interpret)
    pc = jax.lax.population_count(B.reshape(-1))
    total = jnp.sum(pc, dtype=jnp.int32)
    # int32 guard for pathological all-overlapping scenes (f32 tree sum
    # is accurate to ~2^-20 relative — sound as a margined detector).
    ok = plan.ok & (plan.rows_needed <= rpw) \
        & (jnp.sum(pc.astype(jnp.float32)) < float(2 ** 31 - 2 ** 26))
    if capacity == 0:
        return (jnp.zeros((0,), jnp.uint32), jnp.zeros((0,), jnp.uint32),
                total.astype(jnp.uint32), ok)
    ids_flat = jax.lax.bitcast_convert_type(
        plan.stream[:, 6, :], jnp.uint32).reshape(-1)
    emit = _pick_emit(capacity, emit_blk)
    ida, idb, trunc_safe = emit(
        B, plan.starts, plan.w0.reshape(-1), plan.mc, ids_flat, capacity,
        rpw, total, kcap, noff=5, rolled=False)
    return ida, idb, total.astype(jnp.uint32), ok & trunc_safe


def run_fill(coords, radii, capacity, gxy, cand_capacity, chunk=1 << 20):
    """Enumerate colliding pairs into a ``capacity``-slot buffer.

    Args:
      coords: [n, 3] float32/float64 centers.
      radii:  [n] radii (same dtype).
      capacity: static pair-buffer capacity (0 = count-only).
      gxy: static columns per xy axis (see columns.default_column_config).
      cand_capacity: static bound on conservative candidates; when the
        scene needs more, ``ok`` comes back False and the result is a
        (correct-prefix) underestimate — retry with a larger bound.
      chunk: static candidate-pass chunk length.

    Returns:
      (pairs[capacity, 2] uint32 or None, total uint32, ok bool).
    """
    chunk = int(min(chunk, max(_S, -(-cand_capacity // _S) * _S)))
    chunk = -(-chunk // _S) * _S
    cand_capacity = -(-cand_capacity // chunk) * chunk
    return _run_fill(coords, radii, int(capacity), int(gxy),
                     int(cand_capacity), chunk)


def slab_mask_fill(coords, radii, capacity, gx, col_capacity, slab_rows,
                   rpw=1, interpret=False, kcap=None, emit_blk=None):
    """Sparse-emission pair fill over the slab engine's 2-offset masks.

    The slab analog of :func:`mask_fill`: the rolled slab masks kernel
    (kernels/slab_sweep.py slab_sweep_masks) writes ~2/5 the mask words
    of the column kernel, and the same two-level sparse emission decodes
    them (``noff=2``, rolled window rows). Returns
    (ida[capacity], idb[capacity], total, ok). Huge capacities use the
    blocked big-fill emission, as in :func:`mask_fill`.
    """
    return _slab_mask_fill_impl(
        coords, radii, int(capacity), int(gx), int(col_capacity),
        int(slab_rows), int(rpw), bool(interpret),
        None if kcap is None else int(kcap),
        None if emit_blk is None else int(emit_blk))


@partial(jax.jit, static_argnames=(
    "capacity", "gx", "col_capacity", "slab_rows", "rpw", "interpret",
    "kcap", "emit_blk"))
def _slab_mask_fill_impl(coords, radii, capacity, gx, col_capacity,
                         slab_rows, rpw, interpret, kcap=None,
                         emit_blk=None):
    from .kernels.slab_sweep import slab_sweep_masks
    from .slabs import plan_slabs

    plan = plan_slabs(
        jnp.asarray(coords, jnp.float32), jnp.asarray(radii, jnp.float32),
        gx, col_capacity, slab_rows)
    B = slab_sweep_masks(plan, rpw=rpw, interpret=interpret)
    pc = jax.lax.population_count(B.reshape(-1))
    total = jnp.sum(pc, dtype=jnp.int32)
    ok = plan.ok & (plan.rows_rolled <= rpw) \
        & (jnp.sum(pc.astype(jnp.float32)) < float(2 ** 31 - 2 ** 26))
    if capacity == 0:
        return (jnp.zeros((0,), jnp.uint32), jnp.zeros((0,), jnp.uint32),
                total.astype(jnp.uint32), ok)
    ids_flat = jax.lax.bitcast_convert_type(
        plan.stream[:, 6, :], jnp.uint32).reshape(-1)
    emit = _pick_emit(capacity, emit_blk)
    ida, idb, trunc_safe = emit(
        B, plan.starts, plan.w0.reshape(-1), plan.mc, ids_flat, capacity,
        rpw, total, kcap, noff=2, rolled=True)
    return ida, idb, total.astype(jnp.uint32), ok & trunc_safe
