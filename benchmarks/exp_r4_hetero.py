"""Round-4: hetero-engine cost decomposition at 1M power-law.

VERDICT r3 item 1's bar: count AND fill <= 3x the uniform step. Round 3
measured count 22.5 ms (2.3x) but fill 73.4 ms (4.7x of the 15.5 ms
uniform fill). This decomposes the fill: column plan, S-S masks sweep,
S-S emission, B-S big pass, B-B brute force — to target the gap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r4_hetero.py [nb] [rpw]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.hetero import _bigs_table, default_nb, hetero_collide
from collision_tpu.kernels.bigpass import big_count_only, big_pairs
from collision_tpu.kernels.sweep import RPW_LADDER, sweep_masks


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


def main():
    n = 1_000_000
    capacity = 16384
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    # The round-3 power-law scene (exp_r3_hetero.py:40-43), for
    # comparable numbers: pareto(2.5) tail clipped at 0.05.
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else default_nb(n)
    print("backend:", jax.devices()[0].platform, "nb:", nb, flush=True)
    out = {"nb": nb}

    # Resolve the parked plan's rpw once (what the host ladder would do).
    _, bidx = jax.lax.top_k(radii, nb)
    parked = radii.at[bidx.astype(jnp.int32)].set(-jnp.inf)
    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, parked, gxy, col_cap, slab_rows)
    if not bool(plan.ok):
        col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
        slab_rows = int(plan.max_slab_rows) + 2
        plan = plan_columns(coords, parked, gxy, col_cap, slab_rows)
    need_m = int(plan.rows_needed)
    rpw = int(sys.argv[2]) if len(sys.argv) > 2 else \
        next(r for r in RPW_LADDER if r >= need_m)
    print("gxy={} col_cap={} rows_needed={} rpw={} plan.ok={}".format(
        gxy, col_cap, need_m, rpw, bool(plan.ok)), flush=True)
    out.update(gxy=gxy, rows_needed=need_m, rpw=rpw)

    def time_step(name, fn, k=6):
        @partial(jax.jit, static_argnames=("k",))
        def chain(args, k):
            def body(i, c):
                probe = fn(c)
                return c + probe * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, k, body, args)
        ms = chain_time(chain, coords, k=k)
        out[name] = round(ms, 3)
        print("{}: {:.3f} ms".format(name, ms), flush=True)
        return ms

    # Full public count and fill.
    def full_count(c):
        _, tot, ok = hetero_collide(c, radii, 0, nb=nb, rpw=rpw)
        return (tot % 2).astype(jnp.float32) + ok.astype(jnp.float32)
    time_step("count_ms", full_count)

    def full_fill(c):
        pairs, tot, ok = hetero_collide(c, radii, capacity, nb=nb, rpw=rpw)
        return ((tot % 2) + (pairs[0, 0] % 2)).astype(jnp.float32) \
            + ok.astype(jnp.float32)
    time_step("fill_ms", full_fill)

    # Stages.
    def stage_plan(c):
        _, bi = jax.lax.top_k(radii, nb)
        pk = radii.at[bi.astype(jnp.int32)].set(-jnp.inf)
        p = plan_columns(c, pk, gxy, col_cap, slab_rows)
        return p.stream[0, 0, 0] + p.max_col.astype(jnp.float32)
    time_step("plan_ms", stage_plan)

    def stage_masks(c):
        _, bi = jax.lax.top_k(radii, nb)
        pk = radii.at[bi.astype(jnp.int32)].set(-jnp.inf)
        p = plan_columns(c, pk, gxy, col_cap, slab_rows)
        B = sweep_masks(p, rpw=rpw, interpret=False)
        rp = jnp.sum(jax.lax.population_count(B).astype(jnp.int32),
                     axis=2, dtype=jnp.int32)
        return jnp.sum(rp, dtype=jnp.int32).astype(jnp.float32)
    time_step("plan_masks_ms", stage_masks)

    def stage_bigcount(c):
        _, bi = jax.lax.top_k(radii, nb)
        bi = bi.astype(jnp.int32)
        pk = radii.at[bi].set(-jnp.inf)
        p = plan_columns(c, pk, gxy, col_cap, slab_rows)
        bt = _bigs_table(c, radii, bi, nb)
        tot, okb = big_count_only(bt, p.stream, interpret=False)
        return tot.astype(jnp.float32) % 2 + okb.astype(jnp.float32)
    time_step("plan_bigcount_ms", stage_bigcount)

    def stage_bigpairs(c):
        _, bi = jax.lax.top_k(radii, nb)
        bi = bi.astype(jnp.int32)
        pk = radii.at[bi].set(-jnp.inf)
        p = plan_columns(c, pk, gxy, col_cap, slab_rows)
        bt = _bigs_table(c, radii, bi, nb)
        ba, bb, tot, okb = big_pairs(bt, p.stream, capacity,
                                     interpret=False)
        return (tot % 2).astype(jnp.float32) + (ba[0] % 2) \
            + okb.astype(jnp.float32)
    time_step("plan_bigpairs_ms", stage_bigpairs)

    # Exactness spot check.
    _, tot_c, ok_c = hetero_collide(coords, radii, 0, nb=nb, rpw=rpw)
    out["count"] = int(tot_c)
    out["ok"] = bool(ok_c)
    print("count:", int(tot_c), "ok:", bool(ok_c), flush=True)
    print("ROW " + json.dumps({"name": "r4-hetero-1M-powerlaw", **out}),
          flush=True)


if __name__ == "__main__":
    main()
