"""Profile the hetero count step at 1M; dump top trace ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_hetero_prof.py
"""

import glob
import gzip
import json
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.hetero import default_nb, hetero_collide
from collision_tpu.kernels.sweep import RPW_LADDER


def main():
    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    print("backend:", jax.devices()[0].platform, flush=True)

    nb = default_nb(n)
    _, bidx = jax.lax.top_k(radii, nb)
    parked = radii.at[bidx.astype(jnp.int32)].set(-1.0)
    gxy, cc, sr = default_column_config(n)
    for _ in range(3):
        plan = plan_columns(coords, parked, gxy, cc, sr)
        ncc = int(np.ceil(int(plan.max_col) / 64) * 64)
        nsr = int(plan.max_slab_rows) + 2
        if ncc <= cc and nsr <= sr:
            break
        cc, sr = max(cc, ncc), max(sr, nsr)
    rpw = next(x for x in RPW_LADDER if x >= int(plan.rows_rolled))

    @partial(jax.jit, static_argnames=("k",))
    def chain(c, k):
        def body(i, c):
            _, total, ok = hetero_collide(
                c, radii, 0, nb=nb, gxy=gxy, col_capacity=cc,
                slab_rows=sr, rpw=rpw)
            eps = (total % 2).astype(jnp.float32) * 1e-7
            return c + eps + ok.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, c)

    np.asarray(chain(coords, 6).ravel()[:1])
    d = "/tmp/jaxprof_het"
    os.system("rm -rf " + d)
    jax.profiler.start_trace(d)
    np.asarray(chain(coords, 6).ravel()[:1])
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
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]
    for name, (dur, cnt) in top:
        print("{:10.3f} ms  x{:<6d} {}".format(dur / 1e3, cnt, name[:100]),
              flush=True)


if __name__ == "__main__":
    main()
