"""Column-sweep engine: correctness + chained on-device timing.

Times the FULL pipeline (plan: sort + window tables, then Pallas sweep)
with bench.py's chained-differencing method at:
  - 1M uniform spheres (the north-star shape)
  - the reference dense benchmark shape (N=307200, rmax=0.06,
    tests/benchmarks/test_collide.py:24-54 — 107.6M pairs)

Usage: python benchmarks/exp_columns.py [n ...]
Env: RPW (static rows-per-window, default auto from plan), ROUNDS, REPEATS.
"""

import os
import sys
import time
from functools import partial

import numpy as np


def scene(n, rmax=None):
    rng = np.random.RandomState(4)
    coords = rng.random((n, 3)).astype("float32")
    if rmax is None:
        radii = rng.uniform(0, 1 / n ** 0.5, n).astype("float32")
    else:
        radii = rng.uniform(0, rmax, n).astype("float32")
    return coords, radii


def main():
    import jax
    import jax.numpy as jnp

    from collision_tpu.columns import (
        default_column_config, plan_columns, _plan_columns)
    from collision_tpu.kernels.sweep import sweep_count, _sweep_count

    platform = jax.devices()[0].platform
    print("backend:", platform, flush=True)
    rounds = int(os.environ.get("ROUNDS", 10))
    repeats = int(os.environ.get("REPEATS", 3))

    configs = []
    for a in sys.argv[1:] or ["1000000", "dense"]:
        if a == "dense":
            configs.append(("dense307k", 307200, 0.06))
        else:
            configs.append((a, int(a), None))

    for name, n, rmax in configs:
        coords, radii = scene(n, rmax)
        cj = jnp.asarray(coords)
        rj = jnp.asarray(radii)
        gxy, col_cap, slab_rows = default_column_config(n)
        gxy = int(os.environ.get("GXY", 0)) or gxy
        col_cap = int(os.environ.get("COLCAP", 0)) or col_cap
        slab_rows = int(os.environ.get("SLAB", 0)) or slab_rows

        plan = plan_columns(cj, rj, gxy, col_cap, slab_rows)
        ok = bool(plan.ok)
        needed = int(plan.rows_needed)
        rpw = int(os.environ.get("RPW", 0)) or max(2, needed)
        print("{}: gxy={} col_cap={} slab_rows={} ok={} rows_needed={} "
              "rpw={}".format(name, gxy, col_cap, slab_rows, ok, needed,
                              rpw), flush=True)
        if not ok or needed > rpw:
            print("  (config insufficient; skipping timing)", flush=True)
            continue

        count = int(sweep_count(plan, rpw=rpw))
        print("  count = {}".format(count), flush=True)

        mc = -(-col_cap // CHUNK_of())

        @partial(jax.jit, static_argnames=("k",))
        def chain(coords, radii, k):
            def body(i, carry):
                acc, c = carry
                arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
                stream, starts, slab_r0, w0, wcap = arrays[:5]
                cnt, _ = _sweep_count(stream, starts, slab_r0, w0, wcap,
                                      gxy, mc, slab_rows, rpw, False)
                eps = (cnt % 2).astype(jnp.float32) * 1e-7
                return acc + cnt, c + eps
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), coords))
            return acc

        def run(k):
            best = float("inf")
            int(chain(cj, rj, k))
            for _ in range(repeats):
                t = time.perf_counter()
                int(chain(cj, rj, k))
                best = min(best, time.perf_counter() - t)
            return best

        t1 = run(1)
        tn = run(rounds + 1)
        ms = (tn - t1) / rounds * 1e3
        print("  full step: {:.2f} ms".format(ms), flush=True)


def CHUNK_of():
    from collision_tpu.columns import CHUNK
    return CHUNK


if __name__ == "__main__":
    main()
