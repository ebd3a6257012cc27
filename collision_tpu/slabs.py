"""Slab-sweep broad phase: x-sorted slabs with z-continuous banded windows.

Round-3 redesign of the *sparse-scene* count path. The 2-D column engine
(columns.py) pays 5 half-stencil tiles per 64-sphere chunk, and on
uniform scenes its z-windows are only ~60-90 spheres wide — every
128-lane row test is nearly half empty. This engine drops the y axis
from the sort key entirely: spheres sort by ``x_slab << zbits |
quantize(z)`` and the in-tile AABB compare (which always tested y
anyway) is the only y filter. The half stencil collapses from 5 column
offsets to 2 (self with ``j > i``, and x+1), and the slab count ``gx``
is a free knob that widens the z-windows toward a full 128 lanes — the
same per-tile cost now covers ~2.5x more true candidates.

Cost model (v5e, measured for the 2-D engine and carried over): the
sweep costs ``chunks x offsets x ceil(window/128)`` row tiles at ~100
vector-register ops each, independent of grid geometry — so the only
levers are the offset count (5 -> 2) and window/lane packing (~70/128 ->
~110/128). The regime boundary is window width itself: when
``4*r_max*n/(gx_max*ext_z)`` rows exceed a few, the 2-D engine's
narrower per-column windows win — dense scenes stay on columns.py (the
collider routes by the plan's own stats).

Correctness never depends on the knobs, exactly as for columns.py:
windows are conservative supersets (monotone quantization), the kernel
test is exact, and capacity/row overflows are *detected* (``ok=False``
with retry stats) — never a silent wrong answer, mirroring the
reference's count-past-capacity contract (collision.cl:203-207).

Reference parity targets: strict AABB overlap semantics
(collision.cl:164-166), unordered unique pairs of original ids
(collision.cl:198-215).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .columns import CHUNK, LANE, _quantize
from .ops.offset import sorted_bucket_starts
from .utils import round_up

#: x half-stencil: each unordered slab pair visited once; the self offset
#: pairs with a j > i index constraint (the right_edge-dedup analog,
#: collision.cl:198-200).
SLAB_OFFSETS = (0, 1)


class SlabPlan(NamedTuple):
    """Everything the slab sweep kernel needs, plus host-retry stats."""

    stream: jax.Array      # [Rp, 8, 128] f32: xlo ylo zlo xhi yhi zhi id col
    starts: jax.Array      # int32[gx + 2] slab start indices (+1 pad slab)
    slab_r0: jax.Array     # int32[gx + 1] first stream row of each slab
    w0: jax.Array          # int32[gx, mc*2] window starts (global)
    wcap: jax.Array        # int32[gx, mc*2] window lengths
    ok: jax.Array          # bool: capacities held (result exact iff True)
    max_col: jax.Array     # int32 stats for host retry
    max_slab_rows: jax.Array
    rows_rolled: jax.Array  # int32: max ceil(window/128) any window needs
    diag_thr: jax.Array    # f32[1] z-proximity threshold of the diagonal
                           # count's missed-pair detector (slab_sweep.py)
    n: int
    gx: int
    mc: int
    slab_rows: int


def default_slab_config(n, r_max=None, ext=None, target_slack=24, gx=None):
    """(gx, col_capacity, slab_rows) from n and optional scene stats.

    ``gx`` targets z-windows of ~CHUNK+target_slack spheres with enough
    Poisson headroom that the max window over all chunks stays under 128
    and the rolled sweep runs at one row per tile. The window slack in
    spheres is ~(2*r_mean + 2*r_max) * n / (gx * ext_z); with scene
    stats unknown, r_max ~ 1/sqrt(n) (the uniform-benchmark family)
    gives gx ~ 3*sqrt(n)/target_slack. The default slack targets
    ~88-lane windows: small enough that residual jobs (windows past 128
    lanes) stay rare — at 1M, gx=128 measured r_ok=True with the
    256-job default while gx<=75 overflowed it — while lane packing
    stays fair. Pass ``gx`` to pin the slab count and only derive the
    capacities.
    """
    if gx is None:
        if r_max is not None and ext is not None and ext > 0:
            gx = 3.0 * float(r_max) * n / (float(ext) * target_slack)
            # Physical ceiling: the plan clamps slab width at 2*r_max
            # (the adjacency invariant), so slabs past ext/(2*r_max)
            # are EMPTY — a formula gx above it buys nothing and, fed
            # to col_capacity below, sizes capacities for an occupancy
            # the clamped grid cannot deliver (measured: the 1M
            # power-law eager route derived gx=2118 against an
            # effective 35-slab grid — ok=False with a garbage count
            # on the first public call, round-5 hetero row).
            if r_max > 0:
                gx = min(gx, float(ext) / (2.0 * float(r_max)))
        else:
            gx = 3.0 * (n ** 0.5) / target_slack
    # The cap bounds the kernel grid, not correctness. 512 sufficed for
    # uniform scenes (gx ~ 3*sqrt(n)/24 = 125 at 1M) but the hetero
    # engine's parked small class has r_max ~10x the uniform guess and
    # needs gx ~ 2*r_max*n/slack to pull windows under 128 lanes
    # (~1800 at the 1M power-law reference scene) — a 512 clip silently
    # dead-ended its gx escalation at permanently-overflowing residuals.
    gx = int(np.clip(round(gx), 1, 4096))
    occ = n / gx
    col_cap = int(round_up(int(occ + 6 * occ ** 0.5 + 16), CHUNK))
    col_cap = min(col_cap, int(round_up(n, CHUNK)))
    slab_rows = min(col_cap, n) // LANE + 4
    return gx, col_cap, slab_rows


def _xbits_z(gx):
    # +1 pad slab; +1 so the last slab's upper window threshold
    # (col+1) << zbits never wraps uint32.
    return 32 - max(int(np.ceil(np.log2(gx + 2))), 1)


#: Default residual-job capacity of the dual-dispatch count
#: (:func:`residual_count`): windows wider than 128 lanes are rare by
#: construction (default_slab_config targets ~CHUNK+24), so a small
#: static job list suffices; overflow is detected (ok=False -> retry).
RESIDUAL_JOBS = 256


def _residual_mask(plan: SlabPlan, j_cap, dmin, base=1):
    """Slab-plan residual mask — see :func:`_residual_mask_tables`."""
    return _residual_mask_tables(
        plan.stream, plan.starts, plan.w0.reshape(-1),
        plan.wcap.reshape(-1), plan.mc, 2, j_cap, dmin, base=base)


def _residual_mask_tables(stream, starts, w0f, wcf, mc, noff, j_cap,
                          dmin, base=1):
    """Shared residual-job machinery: the [J, 256, 256] overlap mask of
    every clipped window remainder, plus the per-job id channels.

    The window table identifies every (chunk, offset) whose window
    exceeds ``base``*128 lanes (rare by construction — the plan targets
    ~88-lane windows); each such entry contributes one job per 128-lane
    SEGMENT of its remainder (so arbitrarily wide windows are exact —
    the hetero engine's parked power-law plan has 3-row windows), the
    job list is compacted to ``j_cap`` slots, and each job's residual
    lanes [w0+128(base+seg), w0+min(wcap, 128(base+1+seg))) are tested
    against its full chunk with one dense vectorized compare — no
    Pallas, no per-job control flow. ``base`` is the number of 128-lane
    rows the paired rolled sweep already covers (1 for the slab dual
    dispatch; the column dual can run 2 to trade sweep rows for job
    count). ``ok`` is False when the job list overflowed.

    Generic over the window-table stencil: ``noff`` is the offset count
    (2 for the slab plan's SLAB_OFFSETS, 5 for the column plan's
    COLUMN_OFFSETS) and the flat layout must be
    ``(col * mc + k) * noff + off`` with ``starts`` indexed by ``col``
    — both plan builders emit exactly this. Dedup needs no index mask
    at dmin == 0 in either stencil: self-offset windows are clipped at
    the chunk start (residual lanes start past the chunk), and cross
    windows live in strictly later columns/slabs.

    Returns (m, a_idf, b_idf, ok): m bool[J, 256, 256]; a_idf/b_idf
    f32[J, 256] — the id channel (bit patterns) of the fetched a/b
    lanes, for pair extraction.
    """
    from .ops.scan import inclusive_scan

    T = w0f.shape[0]

    res = jnp.maximum(wcf - base * LANE, 0)
    nseg = -(-res // LANE)          # 128-lane residual segments
    ic = inclusive_scan(nseg)
    nj = ic[-1]
    ok = nj <= j_cap

    ordj = jnp.arange(j_cap, dtype=jnp.int32)
    sel = jnp.minimum(
        sorted_bucket_starts(ic, ordj + 1, strides=(64,)), T - 1)
    live = ordj < nj
    # Segment index within the owning entry: jobs for entry e occupy
    # ordinals [ic[e] - nseg[e], ic[e]).
    seg = jnp.clip(
        ordj - (jnp.take(ic, sel) - jnp.take(nseg, sel)), 0, None)

    ck = sel // noff                # (col, chunk); sel % noff = offset
    x = ck // mc
    k = ck % mc
    g0 = jnp.take(starts, x) + k * CHUNK
    aend = jnp.take(starts, x + 1)
    # Shift the job's window start to its segment: lanes
    # [w0 + 128(base+seg), min(w0 + wcap, w0 + 128(base+1+seg))) —
    # expressed below as [w0j + 128, w0j + wcj) with w0j pre-shifted by
    # the base rows and the segment, so everything downstream keeps the
    # one-segment shape.
    shift = (base - 1 + seg) * LANE
    w0j = jnp.take(w0f, sel) + shift
    wcj = jnp.minimum(jnp.where(live, jnp.take(wcf, sel), 0) - shift,
                      2 * LANE)

    Rp = stream.shape[0]
    arow = jnp.clip(g0 // LANE, 0, Rp - 2)
    brow = jnp.clip((w0j + LANE) // LANE, 0, Rp - 2)
    rows = jnp.stack(
        [arow, arow + 1, brow, brow + 1], axis=1)       # [J, 4]
    quad = jnp.take(stream, rows, axis=0)               # [J, 4, 8, 128]
    a6 = quad[:, :2, :7].reshape(-1, 2, 7, LANE)
    b6 = quad[:, 2:, :7].reshape(-1, 2, 7, LANE)
    # Global sorted positions of the fetched lanes.
    lane2 = jnp.arange(2 * LANE, dtype=jnp.int32)
    apos = arow[:, None] * LANE + lane2[None, :]        # [J, 256]
    jpos = brow[:, None] * LANE + lane2[None, :]

    def comp(six, c):
        return six[:, :, c].reshape(-1, 2 * LANE)       # [J, 256]

    a_ok = (apos >= g0[:, None]) & (apos < jnp.minimum(
        g0 + CHUNK, aend)[:, None])
    b_ok = (jpos >= (w0j + LANE)[:, None]) & (jpos < (w0j + wcj)[:, None])
    # j > i dedup holds by construction at dmin == 0 (self-offset jobs
    # clip w0 >= g0, so residual lanes start past the chunk); the
    # explicit index-distance mask carries the diagonal path's dmin.
    m = a_ok[:, :, None] & b_ok[:, None, :]
    if dmin:
        m &= jpos[:, None, :] > apos[:, :, None] + dmin
    m &= comp(a6, 3)[:, :, None] > comp(b6, 0)[:, None, :]
    m &= comp(a6, 0)[:, :, None] < comp(b6, 3)[:, None, :]
    m &= comp(a6, 4)[:, :, None] > comp(b6, 1)[:, None, :]
    m &= comp(a6, 1)[:, :, None] < comp(b6, 4)[:, None, :]
    m &= comp(a6, 5)[:, :, None] > comp(b6, 2)[:, None, :]
    m &= comp(a6, 2)[:, :, None] < comp(b6, 5)[:, None, :]
    return m, comp(a6, 6), comp(b6, 6), ok


def residual_count(plan: SlabPlan, j_cap=RESIDUAL_JOBS, dmin=0, base=1):
    """(count, ok) for window lanes beyond the first ``base``*128.

    The dual-dispatch count runs the Pallas slab sweep at a static one
    row per window with ``wcap`` clamped to 128 lanes, then counts the
    clipped remainders here via :func:`_residual_mask` (one job per
    128-lane residual segment, so arbitrarily wide windows are exact).
    ``ok`` is False when the job list overflowed; the caller falls back
    to the escalated-rpw rolled kernel, so results are never silently
    wrong.

    ``dmin`` restricts residual pairs to sorted-index distance
    ``j - i > dmin`` — the diagonal count path
    (kernels/slab_sweep.slab_count_diag) covers every pair within
    ``dmin`` positions itself, so its residuals must exclude them. At
    ``dmin == 0`` the mask is vacuous for self jobs (their lanes start
    at w0 + 128 > any chunk index) and correct for cross jobs (slab
    x+1 indices always exceed slab x indices).
    """
    m, _, _, ok = _residual_mask(plan, j_cap, dmin, base=base)
    return jnp.sum(m, dtype=jnp.int32), ok


#: Default residual-PAIR capacity of the dual-dispatch fill: clipped
#: windows are rare (see RESIDUAL_JOBS) and each holds at most 128
#: residual lanes x 64 chunk rows, but true residual pairs track the
#: job count closely on real scenes; overflow is detected (ok=False).
RESIDUAL_PAIRS = 4096


def residual_pairs(plan: SlabPlan, j_cap=RESIDUAL_JOBS,
                   p_cap=RESIDUAL_PAIRS, dmin=0, interpret=False,
                   base=1):
    """(ida[p_cap], idb[p_cap], count, ok): original-id pairs of the
    clipped window remainders — the fill-side counterpart of
    :func:`residual_count`, letting the slab mask fill run its Pallas
    sweep at a static ``base`` rows per window (wcap clamped to
    base*128) with no rows-per-window knob. Dead slots hold 0xFFFFFFFF;
    ``ok`` is False when the job list or ``p_cap`` overflowed (the
    result is then a correct prefix).

    Extraction is two-level sparse: hits are rare by construction (the
    plan targets ~88-lane windows), so the [J, 256, 256] mask is first
    reduced to per-a-row hit counts and only the (ascending) hit rows —
    at most ``p_cap``, since every hit row holds >= 1 pair — are
    gathered into a small [p_cap, 256] mask for the streaming
    compactor. Feeding the full 16.7M-element mask to compact_mask
    measured ~3.9 ms of pure subtile-scan overhead at 1M (round-5
    fillsplit row); the rowsum + small compact is ~0.4 ms. The kept
    prefix stays exact: rows are kept in ascending order, so any
    dropped row (only possible past p_cap pairs, where ok=False
    already) is strictly after every kept one."""
    from .kernels.compact import compact_mask
    from .ops.scan import inclusive_scan

    NO_PAIR = jnp.uint32(0xFFFFFFFF)
    m, a_idf, b_idf, ok = _residual_mask(plan, j_cap, dmin, base=base)
    L2 = 2 * LANE
    mr = m.reshape(-1, L2)                         # [J*256, 256]
    Rm = mr.shape[0]
    rowcnt = jnp.sum(mr, axis=1, dtype=jnp.int32)  # [J*256]
    count = jnp.sum(rowcnt, dtype=jnp.int32)
    ok = ok & (count <= p_cap)

    R_cap = min(p_cap, Rm)
    ic = inclusive_scan((rowcnt > 0).astype(jnp.int32))
    nrows = ic[-1]
    ordr = jnp.arange(R_cap, dtype=jnp.int32)
    rowsel = jnp.minimum(
        sorted_bucket_starts(ic, ordr + 1, strides=(64,)), Rm - 1)
    live_r = ordr < nrows
    small = jnp.where(live_r[:, None],
                      jnp.take(mr, rowsel, axis=0), False)

    idx, _ = compact_mask(small.reshape(-1), max(p_cap, 8),
                          interpret=interpret)
    idx = idx[:p_cap]
    live = idx != NO_PAIR
    fl = jnp.minimum(idx, jnp.uint32(R_cap * L2 - 1)).astype(jnp.int32)
    fr = jnp.take(rowsel, fl // L2)                # global (job, a) row
    bi = fl % L2
    ida = jax.lax.bitcast_convert_type(
        jnp.take(a_idf.reshape(-1), fr), jnp.uint32)
    idb = jax.lax.bitcast_convert_type(
        jnp.take(b_idf.reshape(-1), (fr // L2) * L2 + bi), jnp.uint32)
    ida = jnp.where(live, ida, NO_PAIR)
    idb = jnp.where(live, idb, NO_PAIR)
    return ida, idb, count, ok


def plan_slabs(coords, radii, gx, col_capacity, slab_rows):
    """Sort by (x-slab, z) and precompute the slab sweep kernel's inputs."""
    arrays = _plan_slabs(coords, radii, gx, col_capacity, slab_rows)
    mc = -(-col_capacity // CHUNK)
    return SlabPlan(*arrays, n=coords.shape[0], gx=gx, mc=mc,
                    slab_rows=slab_rows)


@partial(jax.jit, static_argnames=("gx", "col_capacity", "slab_rows"))
def _plan_slabs(coords, radii, gx, col_capacity, slab_rows):
    coords = jnp.asarray(coords, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    n = coords.shape[0]
    zbits = _xbits_z(gx)
    zmax = (1 << zbits) - 1

    lo_s = jnp.min(coords, axis=0)
    hi_s = jnp.max(coords, axis=0)
    r_max = jnp.max(radii)
    ext = hi_s - lo_s
    one = jnp.float32(1.0)
    # Slab width >= 2*r_max: colliding pairs always land in the same or
    # an adjacent slab (the columns.py invariant, x only).
    sx = jnp.maximum(2 * r_max, ext[0] / gx)
    sx = jnp.where(sx > 0, sx, one)
    col = jnp.clip(
        ((coords[:, 0] - lo_s[0]) / sx).astype(jnp.int32), 0, gx - 1
    ).astype(jnp.uint32)

    zext = jnp.where(ext[2] > 0, ext[2], one)
    zscale = zmax / zext
    zq = _quantize(coords[:, 2], lo_s[2], zscale, zmax)
    key = (col << zbits) | zq

    ids = jnp.arange(n, dtype=jnp.uint32)
    key_s, ids_s, x_s, y_s, z_s, r_s = jax.lax.sort(
        (key, ids, coords[:, 0], coords[:, 1], coords[:, 2], radii),
        num_keys=1, is_stable=True,
    )
    return _plan_from_sorted(
        key_s, ids_s, x_s, y_s, z_s, r_s, jnp.int32(n), gx, 0, zbits,
        lo_s[2], zext, zscale, r_max, col_capacity, slab_rows)


def slab_sort_keys(coords, radii, gx, lo_s, ext, r_max):
    """Composite ``x_slab << zbits | quantize(z)`` sort keys.

    ``lo_s``/``ext``/``r_max`` are the *scene* statistics — in the
    sharded engine these are global (psum-reduced) so every device
    quantizes identically.
    """
    zbits = _xbits_z(gx)
    zmax = (1 << zbits) - 1
    one = jnp.float32(1.0)
    sx = jnp.maximum(2 * r_max, ext[0] / gx)
    sx = jnp.where(sx > 0, sx, one)
    col = jnp.clip(
        ((coords[:, 0] - lo_s[0]) / sx).astype(jnp.int32), 0, gx - 1
    ).astype(jnp.uint32)
    zext = jnp.where(ext[2] > 0, ext[2], one)
    zscale = zmax / zext
    zq = _quantize(coords[:, 2], lo_s[2], zscale, zmax)
    return (col << zbits) | zq, zscale


def _plan_from_sorted(key_s, ids_s, x_s, y_s, z_s, r_s, size, gx, col0,
                      zbits, lo_z, zext, zscale, r_max, col_capacity,
                      slab_rows):
    """Stream + window tables from key-sorted sphere data.

    The reusable core of the slab plan: callers own the sort. ``size``
    (dynamic) is the valid prefix length — entries past it must carry
    sentinel keys (uint32 max) so they sort last; their component values
    are ignored (the stream masks them to +inf). ``col0`` offsets the
    slab ids: the sharded engine plans a device's local range
    [col0, col0 + gx) over its shard, with the halo slab sitting at
    local index gx (the position the single-device plan keeps vacuous).
    """
    n = key_s.shape[0]
    zmax = (1 << zbits) - 1
    mc = -(-col_capacity // CHUNK)
    pos = jnp.arange(n, dtype=jnp.int32)
    valid = pos < size
    col_s = (key_s >> zbits).astype(jnp.uint32)

    # Slab starts over the extended range. In the single-device plan the
    # pad slab gx stays empty (starts equal size, making the last slab's
    # dx=1 offset vacuous); the sharded plan parks the halo there.
    buckets = jnp.uint32(col0) + jnp.arange(gx + 2, dtype=jnp.uint32)
    starts = sorted_bucket_starts(col_s, buckets).astype(jnp.int32)
    slab_r0 = (starts[: gx + 1] // LANE).astype(jnp.int32)

    # --- stream tensor [Rp, 8, 128] ---
    # Rp is rounded so the diagonal count kernel's fixed-size row
    # blocks (DIAG_B) always have one full lookahead block of +inf pad
    # past the data (kernels/slab_sweep.py reads blocks i and i+1).
    from .kernels.slab_sweep import DIAG_B

    R = -(-n // LANE)
    Rp = max(-(-(R + slab_rows + 2) // DIAG_B), R // DIAG_B + 2) * DIAG_B
    npad = Rp * LANE

    def padto(v, fill):
        v = jnp.where(valid, v, fill)
        return jnp.full((npad,), fill, jnp.float32).at[:n].set(v)

    idf = jax.lax.bitcast_convert_type(ids_s, jnp.float32)
    # Interleave as a stack on axis 1, not stack+transpose: the XLA
    # transpose of the whole 32 MB stream ran at ~58 GB/s (1.1 ms at 1M,
    # vs a 0.16 ms bandwidth SOL — round-3 plan_split_ms row); the
    # 8-operand concat lowers to per-component strided copies.
    comp_rows = [
        padto(x_s - r_s, jnp.inf), padto(y_s - r_s, jnp.inf),
        padto(z_s - r_s, jnp.inf), padto(x_s + r_s, jnp.inf),
        padto(y_s + r_s, jnp.inf), padto(z_s + r_s, jnp.inf),
        padto(idf, jnp.inf),
        # Channel 7: the slab id (exact as f32 — slab counts are far
        # below 2^24), read by the diagonal kernel's same-slab check;
        # pad rows carry +inf and can never flag (their z is +inf too).
        padto(col_s.astype(jnp.float32), jnp.inf),
    ]
    stream = jnp.stack([v.reshape(Rp, LANE) for v in comp_rows], axis=1)

    # --- exact per-chunk z ranges (two-row strip gather + masked reduce) ---
    nseg = npad // CHUNK
    zlo_pad = jnp.full((nseg * CHUNK,), jnp.inf, jnp.float32) \
        .at[:n].set(jnp.where(valid, z_s - r_s, jnp.inf))
    zhi_pad = jnp.full((nseg * CHUNK,), -jnp.inf, jnp.float32) \
        .at[:n].set(jnp.where(valid, z_s + r_s, -jnp.inf))
    zlo_rows = zlo_pad.reshape(nseg, CHUNK)
    zhi_rows = zhi_pad.reshape(nseg, CHUNK)

    c_idx = jnp.arange(gx, dtype=jnp.int32)
    k_idx = jnp.arange(mc, dtype=jnp.int32)
    g0 = starts[c_idx][:, None] + k_idx[None, :] * CHUNK      # [gx, mc]
    ends = starts[c_idx + 1][:, None]
    valid_c = g0 < ends
    alen = jnp.clip(ends - g0, 0, CHUNK)
    seg = jnp.minimum(g0 // CHUNK, nseg - 2)
    strip_lo = jnp.concatenate(
        [jnp.take(zlo_rows, seg, axis=0),
         jnp.take(zlo_rows, seg + 1, axis=0)], axis=-1)   # [gx, mc, 128]
    strip_hi = jnp.concatenate(
        [jnp.take(zhi_rows, seg, axis=0),
         jnp.take(zhi_rows, seg + 1, axis=0)], axis=-1)
    local = (g0 - seg * CHUNK)[..., None]
    lane = jnp.arange(2 * CHUNK, dtype=jnp.int32)
    inwin = (lane >= local) & (lane < local + alen[..., None])
    lo_chunk = jnp.min(jnp.where(inwin, strip_lo, jnp.inf), axis=-1)
    hi_chunk = jnp.max(jnp.where(inwin, strip_hi, -jnp.inf), axis=-1)

    # Window thresholds in quantized-z space: conservative supersets by
    # monotonicity (columns.py invariant). Clamp to the finite scene
    # range first — empty chunks carry +/-inf. ``zext`` is the exact
    # scene z extent (not zmax/zscale, whose f32 round-trip could clamp
    # a top-of-scene sphere out of its window).
    zhi_scene = lo_z + zext
    qlo = _quantize(jnp.clip(lo_chunk - r_max, lo_z, zhi_scene),
                    lo_z, zscale, zmax)
    qhi = _quantize(jnp.clip(hi_chunk + r_max, lo_z, zhi_scene),
                    lo_z, zscale, zmax)

    # One batched composite-key searchsorted for all (offset, lo/hi)
    # thresholds.
    key_q, valid_q = [], []
    for dx in SLAB_OFFSETS:
        cb = (jnp.uint32(col0) + c_idx.astype(jnp.uint32) + dx)
        key_q.append((cb[:, None] << zbits) + qlo)
        key_q.append((cb[:, None] << zbits) + qhi + 1)
        valid_q.append(valid_c)
    all_pos = sorted_bucket_starts(
        key_s, jnp.stack(key_q).reshape(-1)
    ).reshape(2 * len(SLAB_OFFSETS), gx, mc).astype(jnp.int32)

    w0_list, wcap_list, rolled_list = [], [], []
    for off, dx in enumerate(SLAB_OFFSETS):
        w0 = all_pos[2 * off]
        wend = all_pos[2 * off + 1]
        if dx == 0:
            # Self slab: the j > i dedup mask kills everything below the
            # chunk start, so clip the window there.
            w0 = jnp.maximum(w0, g0)
        w0 = jnp.where(valid_q[off], w0, 0)
        wcap = jnp.where(valid_q[off], jnp.maximum(wend - w0, 0), 0)
        w0_list.append(w0)
        wcap_list.append(wcap)
        rolled_list.append((wcap + LANE - 1) // LANE)

    w0_tab = jnp.stack(w0_list, axis=-1).reshape(gx, mc * 2)
    wcap_tab = jnp.stack(wcap_list, axis=-1).reshape(gx, mc * 2)
    win_rows_rolled = jnp.max(jnp.stack(rolled_list))

    # --- capacity checks (host retry stats; never silently wrong) ---
    col_lens = starts[1:gx + 1] - starts[:gx]
    max_col = jnp.max(col_lens)
    rows_needed = (starts[1:gx + 1] + (LANE - 1)) // LANE \
        - starts[:gx] // LANE
    max_slab = jnp.max(rows_needed)
    ok = (max_col <= col_capacity) & (max_slab + 2 <= slab_rows)

    # Missed-pair detector threshold for the diagonal count
    # (kernels/slab_sweep.py): a same-slab pair (i, j) with j > i + D
    # overlapping in z implies zlo(i + D + 1) < zhi(i) + r_max +
    # 1/zscale + (f32 slop) — one quantization cell for the zq-sorted
    # (not z-sorted) order, plus rounding headroom scaled to the scene.
    diag_thr = (r_max + 1.0 / zscale
                + (jnp.abs(lo_z) + zext + r_max) * jnp.float32(2 ** -20)
                ).astype(jnp.float32).reshape(1)

    return (stream, starts, slab_r0, w0_tab, wcap_tab,
            ok, max_col.astype(jnp.int32), max_slab.astype(jnp.int32),
            win_rows_rolled.astype(jnp.int32), diag_thr)
