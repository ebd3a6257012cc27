"""Two-level radius bucketing: heterogeneous-radii scenes at column speed.

The reference's BVH traversal is radius-distribution-agnostic
(/root/reference/collision/collision.cl:174-226); the TPU column engine is
not — its column width is keyed to 2*r_max (columns.py:150), so one large
sphere collapses the xy resolution and a power-law-radii scene used to
fall through to the seconds-per-step BVH fallback (VERDICT r2 item 3).

This engine splits the scene by radius: the ``nb`` largest spheres (the
*big* set B) are parked out of the column pass — radius -inf gives them
an empty AABB ([+inf, -inf], empty at any coordinate magnitude) that can
never pass the strict overlap test while keeping the sphere in its
column slot, so n stays static and the scene bounds are untouched — and
the column engine runs at the *small* class's r_max.
The three pair classes are then enumerated separately and disjointly:

  S-S: the parked column plan (sweep/fill kernels, exact as ever);
  B-S: kernels/bigpass.py — B resident in VMEM vs the parked stream,
       dense tile tests, streaming emission (parked big slots on the b
       side are empty, so no B-B leaks in);
  B-B: one [nb, nb] strict-overlap mask with an i<j dedup, brute force
       in XLA (nb <= 2048 -> at most ~2M candidate pairs).

Costs ~2x the uniform column step at nb=2048 — against the bar of <= 3x
uniform for a 1M power-law scene (VERDICT r2 "next round" item 3).
Totals/pair sets are exact; ok reports every static-knob violation.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .columns import CHUNK, LANE, default_column_config, plan_columns

NO_PAIR = np.uint32(0xFFFFFFFF)

#: Default big-set size: enough that the small class's r_max drops to
#: the ~99.9th percentile radius at 1M spheres, small enough that the
#: dense B-vs-stream pass stays a minor cost. Measured count-step sweep
#: at 1M power-law on v5e (benchmarks/exp_r3_hetero_nb.py): nb=1024
#: 22.3 ms vs 23.6/25.1/28.5 at 256/512/2048.
DEFAULT_NB = 1024


def default_nb(n):
    """Big-set size for an n-sphere scene (always < n, chunk-aligned)."""
    nb = min(DEFAULT_NB, max(CHUNK, n // 8))
    return max(CHUNK, (nb // CHUNK) * CHUNK) if n > CHUNK else CHUNK


def _bigs_table(coords, radii, bidx, nb):
    """(rows f32[nb/64, 64, 8], zlo f32[nb/64], zhi f32[nb/64]).

    Big-sphere test rows (dead rows all +inf) plus each chunk's z
    extent (min zlo / max zhi over live members) — the input to the
    big-pass kernels' z-window gating (kernels/bigpass.py).

    Chunk 0 holds the 64 LARGEST radii in top-k order (the "giant"
    chunk, always tested — its z reach would poison any monotone
    envelope); the remaining bigs are sorted by z so later chunks have
    tight, nearly-monotone z ranges and the stream (z-sorted within
    each slab/column) intersects only a contiguous few per row."""
    c = jnp.take(coords, bidx, axis=0)
    r = jnp.take(radii, bidx)
    if nb > CHUNK:
        z_rest = c[CHUNK:, 2]
        perm = jnp.concatenate([
            jnp.arange(CHUNK, dtype=jnp.int32),
            CHUNK + jnp.argsort(z_rest).astype(jnp.int32)])
        c = jnp.take(c, perm, axis=0)
        r = jnp.take(r, perm)
        bidx = jnp.take(bidx, perm)
    idf = jax.lax.bitcast_convert_type(bidx.astype(jnp.uint32), jnp.float32)
    live = r >= 0
    inf = jnp.float32(jnp.inf)
    cols = [c[:, 0] - r, c[:, 1] - r, c[:, 2] - r,
            c[:, 0] + r, c[:, 1] + r, c[:, 2] + r, idf,
            jnp.full((nb,), inf)]
    rows = jnp.stack([jnp.where(live, v, inf) if i != 6 else v
                      for i, v in enumerate(cols)], axis=1)  # [nb, 8]
    nbc = nb // CHUNK
    zlo = jnp.min(jnp.where(live, c[:, 2] - r, inf)
                  .reshape(nbc, CHUNK), axis=1)
    zhi = jnp.max(jnp.where(live, c[:, 2] + r, -inf)
                  .reshape(nbc, CHUNK), axis=1)
    return rows.reshape(nbc, CHUNK, 8), zlo, zhi


@partial(jax.jit, static_argnames=(
    "capacity", "nb", "gxy", "col_capacity", "slab_rows", "rpw",
    "interpret", "engine", "gx", "with_flags"))
def hetero_collide(coords, radii, capacity, nb=None, gxy=None,
                   col_capacity=None, slab_rows=None, rpw=1,
                   interpret=False, engine="column", gx=None,
                   with_flags=False):
    """One heterogeneous-radii broad-phase step.

    Returns (pairs[capacity, 2] | None, total u32, ok bool). Pair order:
    S-S pairs (mask-word order, as mask_fill), then the S-S residual
    pairs (slab engine only), then B-S, then B-B — deterministic.

    ``engine`` picks the S-S pass: "column" (the round-3 shape: parked
    column plan + banded sweep) or "slab" (round 4: the parked scene
    through the x-sorted slab plan and its dual-dispatch count/fill —
    the flagship uniform path, ~2x faster at 1M, so the hetero premium
    collapses to the dense big passes). The big/small split and the
    B-S / B-B passes are identical either way (kernels/bigpass.py is
    sort-order-agnostic: it reads only stream channels 0-6). With
    ``engine="slab"``, ``gx``/``col_capacity``/``slab_rows`` take slab
    semantics (slabs.default_slab_config) and ``rpw`` is ignored (the
    dual dispatch has no rows-per-window knob); ``gxy`` is unused.

    ``with_flags`` (slab engine only) appends a (gx_ok, other_ok) pair
    to the return: gx_ok holds the ok components a finer slab grid can
    fix (plan/residual capacities), other_ok the gx-independent ones
    (B-S emitter overflow, int32 wrap, emission truncation) — the
    Collider's gx-escalation ladder stops immediately when other_ok is
    the failing side instead of burning recompiles gx cannot help.
    """
    from .fill import _pick_emit
    from .kernels.bigpass import big_pairs
    from .kernels.compact import compact_mask
    from .kernels.sweep import sweep_masks

    coords = jnp.asarray(coords, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    n = coords.shape[0]
    if nb is None:
        nb = default_nb(n)
    nb = min(nb, (n // CHUNK) * CHUNK) or min(CHUNK, n)
    if nb <= 0 or n <= CHUNK:
        raise ValueError("hetero engine needs n > 64 spheres")

    # --- split: park the nb largest radii out of the column pass ---
    # Parked radius is -inf, NOT a finite negative: lo = x - r = +inf,
    # hi = x + r = -inf is empty at ANY coordinate magnitude, whereas
    # x +/- 1 rounds back to x in f32 once |x| >= 2^24 — a point AABB
    # that strictly overlaps its own big sphere (caught by the
    # huge-magnitudes adversarial scene: nb phantom self-pairs).
    _, bidx = jax.lax.top_k(radii, nb)
    bidx = bidx.astype(jnp.int32)
    parked = radii.at[bidx].set(-jnp.inf)

    bigs_t = _bigs_table(coords, radii, bidx, nb)
    if engine == "slab":
        return _hetero_slab(coords, radii, parked, bigs_t, bidx, nb,
                            capacity, gx, col_capacity, slab_rows,
                            interpret, with_flags=with_flags)
    if engine != "column":
        raise ValueError("Unknown hetero engine: {}".format(engine))
    if with_flags:
        raise ValueError("with_flags requires engine='slab'")

    if gxy is None or col_capacity is None or slab_rows is None:
        d_gxy, d_cc, d_sr = default_column_config(n)
        gxy = d_gxy if gxy is None else gxy
        col_capacity = d_cc if col_capacity is None else col_capacity
        slab_rows = d_sr if slab_rows is None else slab_rows

    plan = plan_columns(coords, parked, gxy, col_capacity, slab_rows)

    mbb, tot_bb = _bb_mask(coords, radii, bidx, nb)

    if capacity == 0:
        from .kernels.bigpass import big_count_only
        from .kernels.sweep import sweep_count_dual

        # Dual-dispatch S-S count: the rolled sweep runs one row SHORT
        # of the predicted rows-per-window rung and the clipped
        # remainders are counted by the vectorized residual path (one
        # job per 128-lane segment, exact at any width). The parked
        # power-law reference scene predicts rpw=3 from its MAX window
        # while the MEAN is ~110 lanes: base=2 covers every <=256-lane
        # window in-sweep with ZERO residual jobs left (measured
        # 15.4 -> 12.2 ms S-S at 1M; base=1 pays ~5k jobs for the fat
        # (128,256] tail and lands at 13.1). A retry that escalates
        # ``rpw`` therefore also widens the count's in-sweep coverage.
        base = max(1, min(int(rpw) - 1, 4)) if rpw > 1 else 1
        cnt_s, ok_s = sweep_count_dual(plan, interpret=interpret,
                                       base=base)
        tot_bs, ovf_bs = big_count_only(
            bigs_t, plan.stream, interpret=interpret)
        total = cnt_s.astype(jnp.uint32) + tot_bs + tot_bb
        return None, total, ok_s & ovf_bs

    sok = plan.ok & (plan.rows_needed <= rpw)

    # --- fills ---
    # S-S through the sparse mask emission (round-3 fast fill path; the
    # streaming cursor kernel's per-window sync made it 2.3x slower at
    # 1M — design.md). Masks need the aligned-row bound rows_needed,
    # not the rolled one; the difference folds into ok.
    B = sweep_masks(plan, rpw=rpw, interpret=interpret)
    # One native-layout popcount pass shared by total/guard/emission
    # (see fill._mask_fill_impl).
    rpm = jnp.sum(jax.lax.population_count(B).astype(jnp.int32), axis=2,
                  dtype=jnp.int32)
    tot_s_i = jnp.sum(rpm, dtype=jnp.int32)
    ovf_s = (plan.rows_needed <= rpw) \
        & (jnp.sum(rpm.astype(jnp.float32)) < float(2 ** 31 - 2 ** 26))
    ids_flat = jax.lax.bitcast_convert_type(
        plan.stream[:, 6, :], jnp.uint32).reshape(-1)
    sa, sb, emit_safe = _pick_emit(
        capacity, None, ids_flat.shape[0], interpret)(
        B, plan.starts, plan.w0.reshape(-1), plan.mc, ids_flat,
        capacity, rpw, tot_s_i, None, noff=5, rolled=False, rp=rpm)
    ovf_s &= emit_safe
    tot_s = tot_s_i.astype(jnp.uint32)
    bsa, bsb, tot_bs, ovf_bs = big_pairs(
        bigs_t, plan.stream, capacity, interpret=interpret)

    bba, bbb, bb_cap = _bb_extract(mbb, bidx, nb, capacity, interpret)
    pairs, total = _assemble(sa, sb, tot_s, bsa, bsb, tot_bs,
                             bba, bbb, bb_cap, tot_bb, capacity)
    return pairs, total, sok & ovf_s & ovf_bs


def _bb_mask(coords, radii, bidx, nb):
    """B-B: brute-force [nb, nb] strict-overlap mask with i < j dedup."""
    bc = jnp.take(coords, bidx, axis=0)
    br = jnp.take(radii, bidx)
    lo = bc - br[:, None]
    hi = bc + br[:, None]
    mbb = jnp.ones((nb, nb), jnp.bool_)
    for a in range(3):
        mbb &= (hi[:, None, a] > lo[None, :, a]) \
            & (lo[:, None, a] < hi[None, :, a])
    mbb &= jnp.arange(nb)[:, None] < jnp.arange(nb)[None, :]
    return mbb, jnp.sum(mbb, dtype=jnp.uint32)


def _bb_extract(mbb, bidx, nb, capacity, interpret):
    """Original-id B-B pair buffers from the dedup'd overlap mask."""
    from .kernels.compact import compact_mask

    bb_cap = int(min(capacity, nb * (nb - 1) // 2))
    bb_idx, _ = compact_mask(mbb.reshape(-1), max(bb_cap, 8),
                             interpret=interpret)
    bbi = jnp.minimum(bb_idx, jnp.uint32(nb * nb - 1)).astype(jnp.int32)
    bba = jnp.take(bidx, bbi // nb).astype(jnp.uint32)
    bbb = jnp.take(bidx, bbi % nb).astype(jnp.uint32)
    bb_live = bb_idx != NO_PAIR
    bba = jnp.where(bb_live, bba, jnp.uint32(NO_PAIR))[:bb_cap]
    bbb = jnp.where(bb_live, bbb, jnp.uint32(NO_PAIR))[:bb_cap]
    return bba, bbb, bb_cap


def _assemble(sa, sb, tot_s, bsa, bsb, tot_bs, bba, bbb, bb_cap, tot_bb,
              capacity):
    """Concatenate S-S, B-S, B-B pair segments, truncated at capacity."""
    total = tot_s + tot_bs + tot_bb
    ts = jnp.minimum(tot_s, jnp.uint32(capacity)).astype(jnp.int32)
    tbs = jnp.minimum(tot_bs, jnp.uint32(capacity)).astype(jnp.int32)
    q = jnp.arange(capacity, dtype=jnp.int32)
    in_s = q < ts
    in_bs = ~in_s & (q < ts + tbs)
    qs = jnp.clip(q, 0, capacity - 1)
    qbs = jnp.clip(q - ts, 0, capacity - 1)
    qbb = jnp.clip(q - ts - tbs, 0, bb_cap - 1)
    ida = jnp.where(
        in_s, jnp.take(sa, qs),
        jnp.where(in_bs, jnp.take(bsa, qbs), jnp.take(bba, qbb)))
    idb = jnp.where(
        in_s, jnp.take(sb, qs),
        jnp.where(in_bs, jnp.take(bsb, qbs), jnp.take(bbb, qbb)))
    live = q < jnp.minimum(total, jnp.uint32(capacity)).astype(jnp.int32)
    pairs = jnp.where(
        live[:, None],
        jnp.stack([ida, idb], axis=1), jnp.uint32(NO_PAIR))
    return pairs, total


def _hetero_slab(coords, radii, parked, bigs_t, bidx, nb, capacity, gx,
                 col_capacity, slab_rows, interpret, with_flags=False):
    """S-S through the slab engine: the round-4 hetero fast path.

    The parked scene flows through the x-sorted slab plan and the
    dual-dispatch count/fill (kernels/slab_sweep.py, fill.py) — the same
    flagship path the uniform benchmark runs, so the hetero premium is
    just the dense B-S/B-B passes. Correct because the slab invariant
    (colliding pairs within one slab of each other, slabs.py) only needs
    the *participating* pair's radii: parked bigs carry empty AABBs and
    never pass an S-S test, and the plan's r_max is the parked
    small-class max (jnp.max ignores -inf). ``ok`` folds the plan
    capacities, the residual-job/pair capacities, and the int32 guard;
    the Collider escalates ``gx`` on False. Capability parity target:
    radius-agnostic traversal, collision.cl:174-226.
    """
    from .fill import slab_fill_from_plan
    from .kernels.bigpass import big_count_only, big_pairs
    from .kernels.slab_sweep import slab_count_dual
    from .slabs import default_slab_config, plan_slabs

    n = coords.shape[0]
    if gx is None or col_capacity is None or slab_rows is None:
        d_gx, d_cc, d_sr = default_slab_config(n, gx=gx)
        gx = d_gx if gx is None else gx
        col_capacity = d_cc if col_capacity is None else col_capacity
        slab_rows = d_sr if slab_rows is None else slab_rows

    plan = plan_slabs(coords, parked, gx, col_capacity, slab_rows)
    mbb, tot_bb = _bb_mask(coords, radii, bidx, nb)

    # base=2: the parked plan's windows are sized by the small-class
    # r_max, which a power-law scene leaves ~2x the uniform default —
    # the (128,256] window tail is fat (871 residual jobs at n=1e5,
    # past the 256-job default, measured round-5) while base=2 empties
    # it. The big passes dominate the hetero premium, so the second
    # sweep row is cheap insurance.
    if capacity == 0:
        cnt_s, r_ok, no_ovf = slab_count_dual(
            plan, interpret=interpret, split_ok=True, base=2)
        tot_bs, ovf_bs = big_count_only(
            bigs_t, plan.stream, interpret=interpret)
        total = cnt_s.astype(jnp.uint32) + tot_bs + tot_bb
        gx_ok = plan.ok & r_ok
        other_ok = no_ovf & ovf_bs
        if with_flags:
            return None, total, gx_ok & other_ok, (gx_ok, other_ok)
        return None, total, gx_ok & other_ok

    sa, sb, tot_s, gx_ok, s_other = slab_fill_from_plan(
        plan, capacity, interpret=interpret, dual=True, split_ok=True,
        dual_base=2)
    bsa, bsb, tot_bs, ovf_bs = big_pairs(
        bigs_t, plan.stream, capacity, interpret=interpret)
    bba, bbb, bb_cap = _bb_extract(mbb, bidx, nb, capacity, interpret)
    pairs, total = _assemble(sa, sb, tot_s, bsa, bsb, tot_bs,
                             bba, bbb, bb_cap, tot_bb, capacity)
    other_ok = s_other & ovf_bs
    if with_flags:
        return pairs, total, gx_ok & other_ok, (gx_ok, other_ok)
    return pairs, total, gx_ok & other_ok
