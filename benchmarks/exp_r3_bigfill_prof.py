"""Profile the blocked big-fill emission on the dense scene; top trace ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_bigfill_prof.py [n] [blk_log2]
"""

import glob
import gzip
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.fill import mask_fill
from collision_tpu.kernels.sweep import RPW_LADDER


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 307200
    blk = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 19)
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 0.06, n).astype("float32"))
    print("backend:", jax.devices()[0].platform, "n:", n, "blk:", blk,
          flush=True)

    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    if not bool(plan.ok):
        col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
        slab_rows = int(plan.max_slab_rows) + 2
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    rpw = next(r for r in RPW_LADDER if r >= int(plan.rows_needed))
    capacity = 110_000_000

    def run():
        ida, idb, tot, ok = mask_fill(
            coords, radii, capacity, gxy, col_cap, slab_rows, rpw=rpw,
            emit_blk=blk)
        return int(ida[0] & 1) + int(idb[-1] & 1) + int(tot & 1)

    print("warm probe:", run(), flush=True)
    d = "/tmp/jaxprof_bigfill"
    os.system("rm -rf " + d)
    jax.profiler.start_trace(d)
    print("probe:", run(), flush=True)
    jax.profiler.stop_trace()

    files = glob.glob(d + "/**/*.trace.json.gz", recursive=True)
    agg = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            agg.setdefault(name, [0, 0])
            agg[name][0] += dur
            agg[name][1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    for name, (dur, cnt) in top:
        print("{:10.3f} ms  x{:<6d} {}".format(dur / 1e3, cnt, name[:100]),
              flush=True)


if __name__ == "__main__":
    main()
