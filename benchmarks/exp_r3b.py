"""Round-3b: re-measure the public fill paths after the sparse-emission work.

Covers what the tunnel outage left unmeasured:
  - 1M uniform: public collide slab count / slab fill / column fill
  - dense reference scene (307200, rmax=0.06, 107.6M pairs):
    slab count + FULL fills via slab_mask_fill and mask_fill

Usage: python -u benchmarks/exp_r3b.py [uniform|dense|both]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu import collide
from collision_tpu.fill import mask_fill, slab_mask_fill
from collision_tpu.slabs import default_slab_config, plan_slabs
from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.kernels.sweep import RPW_LADDER


def chain_time(chain, args, k=6, repeats=3):
    def run(kk):
        np.asarray(jax.tree_util.tree_leaves(chain(args, kk))[0].ravel()[:1])
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(
                jax.tree_util.tree_leaves(chain(args, kk))[0].ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best
    t1 = run(1)
    tn = run(k + 1)
    return max((tn - t1) / k * 1e3, 0.0)


def emit(row):
    print("ROW " + json.dumps(row), flush=True)


def probe_of(res):
    p = (res.count & 1).astype(jnp.float32) * 1e-9
    if res.pairs is not None:
        p = p + (res.pairs[0, 0] & 1).astype(jnp.float32) * 1e-9
    if res.ok is not None:
        p = p + res.ok.astype(jnp.float32) * 1e-9
    return p


def bench_public(name, coords, radii, capacity, method, k=6, **kw):
    @partial(jax.jit, static_argnames=("k",))
    def chain(c, k):
        def body(i, c):
            res = collide(c, radii, capacity, method=method, **kw)
            return c + probe_of(res)
        return jax.lax.fori_loop(0, k, body, c)

    t = chain_time(chain, coords, k=k)
    res = collide(coords, radii, capacity, method=method, **kw)
    row = {"name": name, "method": method, "capacity": capacity,
           "ms": round(t, 3), "count": int(res.count),
           "ok": None if res.ok is None else bool(res.ok)}
    emit(row)
    return res


def uniform():
    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    cand = max(1 << 22, 32 * n)

    bench_public("uniform1M-count", coords, radii, 0, "slab",
                 cand_capacity=cand)
    # slab fill needs rpw >= rows_rolled; resolve from the plan.
    gx, col_cap, slab_rows = default_slab_config(n)
    plan = plan_slabs(coords, radii, gx, col_cap, slab_rows)
    need = int(plan.rows_rolled)
    rpw = next(r for r in RPW_LADDER if r >= need)
    print("slab plan: gx={} rows_rolled={} rpw={} ok={}".format(
        gx, need, rpw, bool(plan.ok)), flush=True)
    bench_public("uniform1M-fill-slab", coords, radii, 16384, "slab",
                 cand_capacity=cand, rpw=rpw)
    gxy, ccap2, srows2 = default_column_config(n)
    planc = plan_columns(coords, radii, gxy, ccap2, srows2)
    needm = int(planc.rows_needed)
    rpwm = next(r for r in RPW_LADDER if r >= needm)
    print("column plan: gxy={} rows_needed={} rpw={} ok={}".format(
        gxy, needm, rpwm, bool(planc.ok)), flush=True)
    bench_public("uniform1M-fill-column", coords, radii, 16384, "column",
                 cand_capacity=cand, rpw=rpwm)


def dense():
    n = 307200
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 0.06, n).astype("float32"))
    cand = 1 << 22

    bench_public("dense307k-count-slab", coords, radii, 0, "slab",
                 cand_capacity=cand)
    bench_public("dense307k-count-col", coords, radii, 0, "column",
                 cand_capacity=cand)

    capacity = 110_000_000
    # Full fill via the slab sparse-emission path.
    gx, col_cap, slab_rows = default_slab_config(n)
    plan = plan_slabs(coords, radii, gx, col_cap, slab_rows)
    if not bool(plan.ok):
        col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
        slab_rows = int(plan.max_slab_rows) + 2
        plan = plan_slabs(coords, radii, gx, col_cap, slab_rows)
    rpw = next(r for r in RPW_LADDER if r >= int(plan.rows_rolled))
    print("dense slab plan: gx={} col_cap={} rows_rolled={} rpw={} "
          "ok={}".format(gx, col_cap, int(plan.rows_rolled), rpw,
                         bool(plan.ok)), flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain_slab(c, k):
        def body(i, c):
            ida, idb, tot, ok = slab_mask_fill(
                c, radii, capacity, gx, col_cap, slab_rows, rpw=rpw)
            probe = ((ida[0] & 1) + (idb[0] & 1) + (tot & 1)
                     ).astype(jnp.float32) * 1e-9
            return c + probe
        return jax.lax.fori_loop(0, k, body, c)

    t = chain_time(chain_slab, coords, k=2)
    ida, idb, tot, ok = slab_mask_fill(
        coords, radii, capacity, gx, col_cap, slab_rows, rpw=rpw)
    emit({"name": "dense307k-fullfill-slab", "ms": round(t, 3),
          "total": int(tot), "ok": bool(ok)})

    # Column mask fill (the round-2 architecture with sparse emission).
    gxy, ccap2, srows2 = default_column_config(n)
    planc = plan_columns(coords, radii, gxy, ccap2, srows2)
    if not bool(planc.ok):
        ccap2 = int(np.ceil(int(planc.max_col) / 64) * 64)
        srows2 = int(planc.max_slab_rows) + 2
        planc = plan_columns(coords, radii, gxy, ccap2, srows2)
    rpwm = next(r for r in RPW_LADDER if r >= int(planc.rows_needed))
    print("dense col plan: gxy={} col_cap={} rows_needed={} rpw={} "
          "ok={}".format(gxy, ccap2, int(planc.rows_needed), rpwm,
                         bool(planc.ok)), flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain_col(c, k):
        def body(i, c):
            ida, idb, tot, ok = mask_fill(
                c, radii, capacity, gxy, ccap2, srows2, rpw=rpwm)
            probe = ((ida[0] & 1) + (idb[0] & 1) + (tot & 1)
                     ).astype(jnp.float32) * 1e-9
            return c + probe
        return jax.lax.fori_loop(0, k, body, c)

    t = chain_time(chain_col, coords, k=2)
    ida2, idb2, tot2, ok2 = mask_fill(
        coords, radii, capacity, gxy, ccap2, srows2, rpw=rpwm)
    emit({"name": "dense307k-fullfill-column", "ms": round(t, 3),
          "total": int(tot2), "ok": bool(ok2)})

    # Cross-path pair-set checksum (order-independent, on device).
    m = min(int(tot), capacity)

    @jax.jit
    def checksum(a, b, m):
        a = a[:m].astype(jnp.uint32)
        b = b[:m].astype(jnp.uint32)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        h = (lo * jnp.uint32(2654435761)) ^ (hi * jnp.uint32(40503))
        h ^= h >> 15
        return jnp.sum(h, dtype=jnp.uint32)

    c1 = int(checksum(ida, idb, m))
    c2 = int(checksum(ida2, idb2, m))
    emit({"name": "dense307k-checksum-equal", "equal": c1 == c2,
          "pairs": m, "totals": [int(tot), int(tot2)]})


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.devices()[0].platform, flush=True)
    if mode in ("uniform", "both"):
        uniform()
    if mode in ("dense", "both"):
        dense()


if __name__ == "__main__":
    main()
