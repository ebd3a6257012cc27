"""Profile _mask_fill_impl at 1M on TPU; dump top ops from the trace.

Usage: PYTHONPATH=... python -u benchmarks/exp_r3_prof.py [n]
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

from collision_tpu.columns import default_column_config
from collision_tpu.kernels.sweep import RPW_LADDER
from collision_tpu.fill import _mask_fill_impl


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print("backend:", jax.devices()[0].platform, "n:", n, flush=True)
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    gxy, col_cap, slab_rows = default_column_config(n)

    @partial(jax.jit, static_argnames=("k",))
    def chain(args, k):
        def body(i, c):
            ida, idb, tot, ok = _mask_fill_impl(
                c, radii, 16384, gxy, col_cap, slab_rows,
                2, False, 1 << 16, None)
            probe = (ida[0] & 1) + (idb[0] & 1) + (tot & 1)
            return c + probe.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    # warm
    np.asarray(chain(coords, 3).ravel()[:1])
    d = "/tmp/jaxprof"
    os.system("rm -rf " + d)
    jax.profiler.start_trace(d)
    np.asarray(chain(coords, 8).ravel()[:1])
    jax.profiler.stop_trace()

    files = glob.glob(d + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            cat = ev.get("args", {}).get("long_name", "")
            agg.setdefault(name, [0, 0, cat])
            agg[name][0] += dur
            agg[name][1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    for name, (dur, cnt, cat) in top:
        print("{:10.3f} ms  x{:<5d} {}".format(dur / 1e3, cnt, name[:90]),
              flush=True)


if __name__ == "__main__":
    main()
