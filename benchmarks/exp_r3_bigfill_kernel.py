"""Round-3: dense full fill via the in-kernel streaming emission.

The reference scene (N=307200, rmax=0.06, 107,651,273 pairs) at full
capacity through fill._mask_fill_emit_pallas (kernels/pair_emit.py).
Round-2 pipeline: 4.9 s; round-3 blocked XLA emission: 4.71 s; this
measures the Pallas second pass (pencil: ~0.4-0.6 s).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_bigfill_kernel.py [n] [mode]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.fill import mask_fill
from collision_tpu.kernels.sweep import RPW_LADDER


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 307200
    mode = sys.argv[2] if len(sys.argv) > 2 else "kernel"
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 0.06, n).astype("float32"))
    print("backend:", jax.devices()[0].platform, "n:", n, "mode:", mode,
          flush=True)

    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    if not bool(plan.ok):
        col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
        slab_rows = int(plan.max_slab_rows) + 2
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    rpw = next(r for r in RPW_LADDER if r >= int(plan.rows_needed))
    print("plan: gxy={} col_cap={} slab_rows={} rpw={} ok={}".format(
        gxy, col_cap, slab_rows, rpw, bool(plan.ok)), flush=True)

    capacity = 110_000_000 if n == 307200 else None
    if capacity is None:
        _, t0, _, _ = mask_fill(coords, radii, 0, gxy, col_cap, slab_rows,
                                rpw=rpw)
        capacity = int(int(t0) * 1.05) + 4096
    print("capacity:", capacity, flush=True)

    t = time.perf_counter()
    ida, idb, tot, ok = mask_fill(coords, radii, capacity, gxy, col_cap,
                                  slab_rows, rpw=rpw, emit_mode=mode)
    tot_i = int(tot)
    wall1 = time.perf_counter() - t
    print("total={} ok={} wall(first)={:.2f}s".format(
        tot_i, bool(ok), wall1), flush=True)

    t = time.perf_counter()
    ida, idb, tot, ok = mask_fill(coords, radii, capacity, gxy, col_cap,
                                  slab_rows, rpw=rpw, emit_mode=mode)
    probe = int(ida[0] & 1) + int(idb[-1] & 1) + int(tot & 1)
    wall2 = time.perf_counter() - t
    print("wall(second)={:.2f}s probe={}".format(wall2, probe), flush=True)

    m = min(tot_i, capacity)
    idx = np.linspace(0, m - 1, 4096).astype(np.int64)
    sa = np.asarray(jnp.take(ida, jnp.asarray(idx)))
    sb = np.asarray(jnp.take(idb, jnp.asarray(idx)))
    C = np.asarray(coords)
    Rr = np.asarray(radii)
    lo_a, hi_a = C[sa] - Rr[sa, None], C[sa] + Rr[sa, None]
    lo_b, hi_b = C[sb] - Rr[sb, None], C[sb] + Rr[sb, None]
    overl = np.all((hi_a > lo_b) & (lo_a < hi_b), axis=1)
    uniq = len(set(map(tuple, np.sort(np.stack([sa, sb], 1), axis=1))))
    print("sample: all_overlap={} unique={}/{}".format(
        bool(overl.all()), uniq, len(idx)), flush=True)
    print("ROW " + json.dumps({
        "name": "dense{}-fullfill-{}".format(n, mode), "ms": wall2 * 1e3,
        "total": tot_i, "ok": bool(ok),
        "sample_overlap": bool(overl.all())}), flush=True)


if __name__ == "__main__":
    main()
