"""Round-4: dense-scene plan cost, measured honestly.

VERDICT r3 item 6 flags "plan 351 ms" on the dense 307k fill
(bigfill_split_ms row). That number came from a single-invocation timer
whose probe fetched ONE SCALAR PER PLAN LEAF — 10 leaves x the ~30 ms
tunnel round-trip is ~300 ms of measurement artifact on this
environment. This re-measures with loop-carried chains (one fetch per
chain, differenced), the same methodology as bench.py: plan alone,
masks sweep, and the full mask_fill at the dense reference scene.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r4_dense_plan.py [n]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.fill import mask_fill
from collision_tpu.kernels.sweep import RPW_LADDER, sweep_masks


def chain_time(make_step, k=4, repeats=3):
    @partial(jax.jit, static_argnames=("kk",))
    def chain(seed, kk):
        return jax.lax.fori_loop(0, kk, lambda _, s: make_step(s), seed)

    def run(kk):
        np.asarray(chain(jnp.float32(0), kk))
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(chain(jnp.float32(0), kk))
            best = min(best, time.perf_counter() - t)
        return best

    return max((run(k + 1) - run(1)) / k * 1e3, 0.0)


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
    print("gxy={} col_cap={} slab_rows={} rpw={} mc={} ok={}".format(
        gxy, col_cap, slab_rows, rpw, plan.mc, bool(plan.ok)), flush=True)
    out = {"n": n, "gxy": gxy, "col_cap": col_cap, "rpw": rpw}
    eps = jnp.float32(1e-9)

    def plan_step(s):
        p = plan_columns(coords + s * jnp.float32(1e-12), radii, gxy,
                         col_cap, slab_rows)
        return p.stream[0, 0, 0] * eps + p.max_col.astype(jnp.float32) * eps
    ms = chain_time(plan_step)
    out["plan_ms"] = round(ms, 2)
    print("plan (chained): {:.2f} ms".format(ms), flush=True)

    def masks_step(s):
        p = plan_columns(coords + s * jnp.float32(1e-12), radii, gxy,
                         col_cap, slab_rows)
        B = sweep_masks(p, rpw=rpw, interpret=False)
        rp = jnp.sum(jax.lax.population_count(B).astype(jnp.int32),
                     axis=2, dtype=jnp.int32)
        return jnp.sum(rp, dtype=jnp.int32).astype(jnp.float32) * eps
    ms = chain_time(masks_step)
    out["plan_masks_ms"] = round(ms, 2)
    print("plan + masks + popcount (chained): {:.2f} ms".format(ms),
          flush=True)

    capacity = 110_000_000

    def fill_step(s):
        ida, idb, tot, ok = mask_fill(
            coords + s * jnp.float32(1e-12), radii, capacity, gxy,
            col_cap, slab_rows, rpw=rpw)
        return (tot.astype(jnp.int32) % 97).astype(jnp.float32) * eps \
            + (ida[0] % 2).astype(jnp.float32) * eps
    ms = chain_time(fill_step, k=3, repeats=2)
    out["full_fill_ms"] = round(ms, 2)
    print("full dense fill (chained): {:.2f} ms".format(ms), flush=True)

    ida, idb, tot, ok = mask_fill(
        coords, radii, capacity, gxy, col_cap, slab_rows, rpw=rpw)
    out["count"] = int(tot)
    out["ok"] = bool(ok)
    print("total:", int(tot), "ok:", bool(ok), flush=True)
    print("ROW " + json.dumps({"name": "r4-dense-fill", **out}), flush=True)


if __name__ == "__main__":
    main()
