"""Profile the 1M slab count step on TPU; dump top ops from the trace.

The headline is 9-10 ms = plan ~4.9 + sweep ~4.2; this shows which XLA
ops inside the plan (sort, searchsorted gathers, strip reduces, stream
transpose) carry the cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_plan_prof.py [n]
"""

import glob
import gzip
import json
import os
import sys
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.kernels.slab_sweep import slab_count_dual
from collision_tpu.slabs import default_slab_config, plan_slabs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print("backend:", jax.devices()[0].platform, "n:", n, flush=True)
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    gx, col_cap, slab_rows = default_slab_config(n)
    print("gx:", gx, "col_cap:", col_cap, "slab_rows:", slab_rows,
          flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain(c0, k):
        def body(i, c):
            plan = plan_slabs(c, radii, gx, col_cap, slab_rows)
            tot, ok = slab_count_dual(plan)
            return c + (tot & 1).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, c0)

    np.asarray(chain(coords, 3).ravel()[:1])
    d = "/tmp/jaxprof_plan"
    os.system("rm -rf " + d)
    jax.profiler.start_trace(d)
    np.asarray(chain(coords, 8).ravel()[:1])
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
        print("{:10.3f} ms  x{:<5d} {}".format(dur / 1e3, cnt, name[:90]),
              flush=True)


if __name__ == "__main__":
    main()
