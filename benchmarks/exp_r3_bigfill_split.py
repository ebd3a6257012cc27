"""Round-3: stage split of the dense full fill with in-kernel emission.

Times (a) plan, (b) masks sweep, (c) the XLA emission prep (per-row
popcounts + nonzero-group compaction + scalar tables), (d) emit_pairs,
on the dense reference scene, to locate the gap between the 0.64 s
emission and the 2.07 s end-to-end mask_fill.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_bigfill_split.py [n]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.fill import LANE, _mask_fill_emit_pallas
from collision_tpu.kernels.sweep import RPW_LADDER, mask_groups, sweep_masks


def _probe(out):
    """Force completion with a scalar device->host fetch (never a bulk
    transfer: this backend's block_until_ready is a no-op and a full
    fetch rides the ~GB/30s tunnel)."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "addressable_data")]
    return sum(int(jnp.ravel(l)[-1].astype(jnp.int32)) & 1
               for l in leaves)


def timeit(fn, *a, **k):
    out = fn(*a, **k)
    _probe(out)
    t = time.perf_counter()
    out = fn(*a, **k)
    probe = _probe(out)
    dt = time.perf_counter() - t
    return out, dt, probe


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 307200
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 0.06, n).astype("float32"))
    print("backend:", jax.devices()[0].platform, "n:", n, flush=True)

    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    if not bool(plan.ok):
        col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
        slab_rows = int(plan.max_slab_rows) + 2
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    rpw = next(r for r in RPW_LADDER if r >= int(plan.rows_needed))
    mc = plan.mc
    kg, ng = mask_groups(mc, rpw)
    kgt = kg * 5 * rpw
    NB = gxy * gxy * ng
    bbytes = NB * kgt * 2 * LANE * 4
    print("plan: gxy={} col_cap={} slab_rows={} rpw={} mc={} "
          "kg={} ng={} B={:.2f} GB".format(
              gxy, col_cap, slab_rows, rpw, mc, kg, ng, bbytes / 1e9),
          flush=True)

    _, t_plan, _ = timeit(
        lambda: plan_columns(coords, radii, gxy, col_cap, slab_rows))
    print("plan: {:.0f} ms".format(t_plan * 1e3), flush=True)

    B, t_sweep, _ = timeit(lambda: sweep_masks(plan, rpw=rpw))
    print("sweep_masks: {:.0f} ms".format(t_sweep * 1e3), flush=True)

    ids_flat = jax.lax.bitcast_convert_type(
        plan.stream[:, 6, :], jnp.uint32).reshape(-1)
    capacity = 110_000_000

    @jax.jit
    def emit(B, starts, w0, ids_flat):
        total = jnp.uint32(107_651_273)
        return _mask_fill_emit_pallas(
            B, starts, w0.reshape(-1), mc, ids_flat, capacity, rpw, total)

    (ida, idb, _), t_emit, _ = timeit(
        emit, B, plan.starts, plan.w0, ids_flat)
    print("emit (prep + kernel): {:.0f} ms".format(t_emit * 1e3),
          flush=True)

    # Prep alone: the popcount/compaction tables, no pallas call.
    @jax.jit
    def prep(B):
        rp_tab = jnp.sum(
            jax.lax.population_count(B).astype(jnp.int32), axis=2,
            dtype=jnp.int32)
        kgt_l = B.shape[1] // 2
        grp_nz = (rp_tab.reshape(B.shape[0], kgt_l, 2).sum(axis=2) > 0)
        sl_iota = jnp.arange(kgt_l, dtype=jnp.int32)[None, :]
        nzsl_tab = jnp.sort(
            jnp.where(grp_nz, sl_iota, jnp.int32(kgt_l)), axis=1)
        nzc_tab = jnp.sum(grp_nz, axis=1, dtype=jnp.int32)
        return rp_tab, nzsl_tab, nzc_tab

    _, t_prep, _ = timeit(prep, B)
    print("prep alone: {:.0f} ms".format(t_prep * 1e3), flush=True)

    # End-to-end, scalars only (no bulk fetches, one probe round-trip).
    from collision_tpu.fill import mask_fill

    @jax.jit
    def e2e(coords, radii):
        ida, idb, tot, ok = mask_fill(
            coords, radii, capacity, gxy, col_cap, slab_rows, rpw=rpw)
        return (tot.astype(jnp.int32) ^ ida[0].astype(jnp.int32)
                ^ idb[-1].astype(jnp.int32)), ok

    _, t_e2e, _ = timeit(e2e, coords, radii)
    print("mask_fill end-to-end (scalar probe): {:.0f} ms".format(
        t_e2e * 1e3), flush=True)

    print("ROW " + json.dumps({
        "name": "dense{}-split".format(n),
        "plan_ms": t_plan * 1e3, "sweep_ms": t_sweep * 1e3,
        "emit_ms": t_emit * 1e3, "prep_ms": t_prep * 1e3,
        "e2e_ms": t_e2e * 1e3, "B_GB": bbytes / 1e9}), flush=True)


if __name__ == "__main__":
    main()
