"""Round-4 split measurements: slab fill stages and a hetero gxy sweep.

Targets VERDICT r3 items 2/3's remaining margins with fresh, chained
(tunnel-artifact-free) stage timings on the committed kernels:

  fill:   plan | masks+popcount | count-only dual fill | full fill
          at the 1M capacity-16384 reference shape (slab engine), to
          locate the 15 -> 12 ms levers.
  hetero: count/fill step vs the parked plan's gxy (the default
          n-occupancy grid keys off 1500 spheres/column; the parked
          small class's r_max allows a much finer grid -> narrower
          windows -> fewer masked row tests).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r4_splits.py [fill|hetero]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.fill import slab_mask_fill
from collision_tpu.hetero import hetero_collide
from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.kernels.slab_sweep import slab_sweep_masks
from collision_tpu.kernels.sweep import RPW_LADDER
from collision_tpu.slabs import default_slab_config, plan_slabs, \
    residual_pairs


def chain_time(make_step, k=8, repeats=3):
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


def fill_splits():
    n = 1_000_000
    capacity = 16384
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    gx, cc, sr = default_slab_config(n)
    print("backend:", jax.devices()[0].platform, "gx:", gx, flush=True)
    out = {"name": "r4-slabfill-split-1M", "gx": gx}
    eps = jnp.float32(1e-9)

    def stage(key, fn, k=8):
        out[key] = round(chain_time(fn, k=k), 3)
        print(key, out[key], "ms", flush=True)

    def s_plan(s):
        p = plan_slabs(coords + s * jnp.float32(1e-12), radii, gx, cc, sr)
        return p.stream[0, 0, 0] * eps + p.w0[0, 0].astype(jnp.float32) \
            * eps
    stage("plan_ms", s_plan)

    def s_masks(s):
        p = plan_slabs(coords + s * jnp.float32(1e-12), radii, gx, cc, sr)
        sp = p._replace(wcap=jnp.minimum(p.wcap, 128))
        B = slab_sweep_masks(sp, rpw=1, interpret=False)
        rp = jnp.sum(jax.lax.population_count(B).astype(jnp.int32),
                     axis=2, dtype=jnp.int32)
        return jnp.sum(rp, dtype=jnp.int32).astype(jnp.float32) * eps
    stage("plan_masks_ms", s_masks)

    def s_resid(s):
        p = plan_slabs(coords + s * jnp.float32(1e-12), radii, gx, cc, sr)
        rida, ridb, rcount, r_ok = residual_pairs(p, interpret=False)
        return rcount.astype(jnp.float32) * eps \
            + (rida[0] % 2).astype(jnp.float32) * eps
    stage("plan_residual_ms", s_resid)

    def s_count(s):
        ida, idb, tot, ok = slab_mask_fill(
            coords + s * jnp.float32(1e-12), radii, 0, gx, cc, sr,
            dual=True)
        return tot.astype(jnp.float32) * eps
    stage("count_fill0_ms", s_count)

    def s_full(s):
        ida, idb, tot, ok = slab_mask_fill(
            coords + s * jnp.float32(1e-12), radii, capacity, gx, cc, sr,
            dual=True)
        return tot.astype(jnp.float32) * eps \
            + (ida[0] % 2).astype(jnp.float32) * eps
    stage("full_fill_ms", s_full)

    print("ROW " + json.dumps(out), flush=True)


def hetero_gxy():
    n = 1_000_000
    capacity = 16384
    nb = 1024
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    print("backend:", jax.devices()[0].platform, flush=True)
    eps = jnp.float32(1e-9)

    _, bidx = jax.lax.top_k(radii, nb)
    parked = radii.at[bidx.astype(jnp.int32)].set(-jnp.inf)
    for gxy in (26, 40, 52, 64):
        _, cc, sr = default_column_config(n, gxy=gxy)
        plan = plan_columns(coords, parked, gxy, cc, sr)
        if not bool(plan.ok):
            cc = int(np.ceil(int(plan.max_col) / 64) * 64)
            sr = int(plan.max_slab_rows) + 2
            plan = plan_columns(coords, parked, gxy, cc, sr)
        need = int(plan.rows_needed)
        if not bool(plan.ok) or need > RPW_LADDER[-1]:
            print("gxy", gxy, "unusable: ok", bool(plan.ok), "rows",
                  need, flush=True)
            continue
        rpw = next(x for x in RPW_LADDER if x >= need)
        out = {"name": "r4-hetero-gxy", "gxy": gxy, "col_cap": cc,
               "rows_needed": need, "rpw": rpw}

        def h_count(s):
            _, tot, ok = hetero_collide(
                coords + s * jnp.float32(1e-12), radii, 0, nb=nb,
                gxy=gxy, col_capacity=cc, slab_rows=sr, rpw=rpw)
            return tot.astype(jnp.float32) * eps \
                + ok.astype(jnp.float32) * eps
        out["count_ms"] = round(chain_time(h_count, k=4), 3)

        def h_fill(s):
            pairs, tot, ok = hetero_collide(
                coords + s * jnp.float32(1e-12), radii, capacity, nb=nb,
                gxy=gxy, col_capacity=cc, slab_rows=sr, rpw=rpw)
            return tot.astype(jnp.float32) * eps \
                + (pairs[0, 0] % 2).astype(jnp.float32) * eps
        out["fill_ms"] = round(chain_time(h_fill, k=4), 3)

        _, tot, ok = hetero_collide(coords, radii, 0, nb=nb, gxy=gxy,
                                    col_capacity=cc, slab_rows=sr,
                                    rpw=rpw)
        out["count"] = int(tot)
        out["ok"] = bool(ok)
        print("ROW " + json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fill"
    if which == "fill":
        fill_splits()
    else:
        hetero_gxy()
