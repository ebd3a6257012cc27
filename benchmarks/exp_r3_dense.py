"""HISTORICAL (round 3): measured the streaming-cursor sweep fill
(kernels/stream_emit.py stream_fill_pairs), DELETED in round 4 after
its dense full-capacity configuration crashed the TPU worker and the
mask-fill path measured 2.3x faster (VERDICT r3 item 5). Kept for the
numbers cited in results_v5e_round3.jsonl; no longer runnable.
"""
raise SystemExit("historical: stream_fill_pairs was removed in round 4")

"""Round-3: dense-scene stream_fill scaling / crash bisection.

The reference benchmark scene scaled down: n spheres, rmax=0.06 in the
unit box — pair count grows ~n^2 (107.6M at n=307200). Runs the
streaming in-kernel emission at full capacity and checks the total vs
the count sweep; one scale per invocation so a TPU worker crash
identifies the failing scale.

Usage: python -u benchmarks/exp_r3_dense.py <n> [capacity]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import plan_columns, default_column_config
from collision_tpu.kernels.sweep import RPW_LADDER, sweep_count_guarded
from collision_tpu.kernels.stream_emit import stream_fill_pairs


def main():
    n = int(sys.argv[1])
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
    need = int(plan.rows_rolled)
    rpw = next(r for r in RPW_LADDER if r >= need)
    cnt, no_ovf = sweep_count_guarded(plan, rpw=rpw, interpret=False,
                                      rolled=True)
    total = int(cnt)
    print("gxy={} col_cap={} rpw={} count={}".format(
        gxy, col_cap, rpw, total), flush=True)

    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else \
        int(total * 1.05) + 4096
    t = time.perf_counter()
    ida, idb, tot_s, ok_s = stream_fill_pairs(
        plan, capacity, rpw=rpw, interpret=False)
    tot_s = int(tot_s)
    print("stream total={} ok={} match={} wall(first)={:.2f}s".format(
        tot_s, bool(ok_s), tot_s == total, time.perf_counter() - t),
        flush=True)

    # second run (compiled) wall time, fetch one element only
    t = time.perf_counter()
    ida, idb, tot_s, ok_s = stream_fill_pairs(
        plan, capacity, rpw=rpw, interpret=False)
    _ = int(tot_s)
    probe = int(np.asarray(ida[:1])[0])
    print("stream wall(second)={:.2f}s probe={}".format(
        time.perf_counter() - t, probe), flush=True)


if __name__ == "__main__":
    main()
