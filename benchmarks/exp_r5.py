"""Round-5 measurements: hetero slab-engine step, slab-fill stage split.

The round-4 jsonl's hetero row measured the COLUMN S-S pass (gxy=26);
the public route above HETERO_SLAB_MIN now runs the slab S-S pass with
a stats-sized gx. This experiment measures what a user actually gets:

  hetero:  public collide(method="auto") on the 1M power-law reference
           scene — count and fill, slab S-S engine, gx from the eager
           stats probe — against the 3x-uniform bar (VERDICT r3 item 1).
  fillsplit: the slab fill's stage ladder at 1M capacity-16384 on the
           round-5 kernels (plan | +count | +masks | +residual | full),
           to locate the 15 -> 12 ms levers (r3 item 3).

Chain methodology as benchmarks/harness.py: iterations are chained
on-device with a RESULT-DERIVED f32-visible perturbation (1e-7 on unit
coords — below that, e.g. 1e-12, the add is bitwise identity and the
measurement collapses), timed by differencing a k+1-chain and a 1-chain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r5.py [hetero|fillsplit]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


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


def make_chain(step_probe):
    """jit'd k-chain of ``coords -> probe`` with an f32-visible
    result-derived perturbation (see module docstring)."""
    @partial(jax.jit, static_argnames=("k",))
    def chain(coords, k):
        def body(i, c):
            return c + step_probe(c) * jnp.float32(1e-7)
        return jax.lax.fori_loop(0, k, body, coords)
    return chain


def powerlaw_scene(n=1_000_000, seed=4):
    rng = np.random.RandomState(seed)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    return coords, radii


def hetero_public():
    """Public-API hetero step at the ROUTED configuration, measured."""
    from collision_tpu import collide
    from collision_tpu.collider import (
        _hetero_route_knobs, _hetero_stats)
    from collision_tpu.hetero import default_nb, hetero_collide

    n = 1_000_000
    capacity = 16384
    coords, radii = powerlaw_scene(n)
    print("backend:", jax.devices()[0].platform, flush=True)

    # The knobs the eager auto route derives.
    nb = default_nb(n)
    s = np.asarray(_hetero_stats(coords, radii, nb))
    knobs = _hetero_route_knobs(n, nb, float(s[1]), float(s[2]), s[4:7])
    out = {"name": "r5-hetero-routed-1M", "nb": nb,
           "r_max": round(float(s[0]), 5),
           "r_small": round(float(s[1]), 5), "knobs": list(knobs)}
    print("knobs:", knobs, flush=True)

    # Exactness checks through the public API first (eager).
    res_c = collide(coords, radii, 0)
    out["count"] = int(res_c.count)
    out["count_ok"] = bool(res_c.ok)
    res_f = collide(coords, radii, capacity)
    out["fill_ok"] = bool(res_f.ok)
    assert int(res_f.count) == int(res_c.count)
    print("eager: count", out["count"], "count_ok", out["count_ok"],
          "fill_ok", out["fill_ok"], flush=True)

    if knobs[0] == "slab":
        kw = dict(nb=nb, engine="slab", gx=knobs[1])
    else:
        gxy, col_cap, slab_rows, rpw = knobs[1:]
        kw = dict(nb=nb, engine="column", gxy=gxy, col_capacity=col_cap,
                  slab_rows=slab_rows, rpw=rpw)

    def h_count(c):
        _, tot, ok = hetero_collide(c, radii, 0, **kw)
        return (tot % 2).astype(jnp.float32) \
            + ok.astype(jnp.float32) * jnp.float32(1e-3)

    out["count_ms"] = round(
        chain_time(make_chain(h_count), coords, k=6), 3)
    print("count_ms", out["count_ms"], flush=True)

    def h_fill(c):
        pairs, tot, ok = hetero_collide(c, radii, capacity, **kw)
        return (tot % 2).astype(jnp.float32) \
            + (pairs[0, 0] % 2).astype(jnp.float32) * jnp.float32(1e-3)

    out["fill_ms"] = round(
        chain_time(make_chain(h_fill), coords, k=6), 3)
    print("fill_ms", out["fill_ms"], flush=True)
    print("ROW " + json.dumps(out), flush=True)


def fill_splits():
    """Slab-fill stage ladder at 1M/16384 on the round-5 kernels."""
    from collision_tpu.fill import slab_mask_fill
    from collision_tpu.kernels.slab_sweep import (
        slab_count_dual, slab_sweep_masks)
    from collision_tpu.slabs import (
        default_slab_config, plan_slabs, residual_pairs)

    n = 1_000_000
    capacity = 16384
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    gx, cc, sr = default_slab_config(n)
    print("backend:", jax.devices()[0].platform, "gx:", gx, flush=True)
    out = {"name": "r5-slabfill-split-1M", "gx": gx}

    def stage(key, probe, k=6):
        out[key] = round(chain_time(make_chain(probe), coords, k=k), 3)
        print(key, out[key], "ms", flush=True)

    def s_plan(c):
        p = plan_slabs(c, radii, gx, cc, sr)
        return (p.w0[0, 0] % 2).astype(jnp.float32) \
            + (p.starts[1] % 2).astype(jnp.float32) * jnp.float32(1e-3)

    stage("plan_ms", s_plan)

    def s_count(c):
        p = plan_slabs(c, radii, gx, cc, sr)
        cnt, okd = slab_count_dual(p)
        return (cnt % 2).astype(jnp.float32)

    stage("plan_count_ms", s_count)

    def s_masks(c):
        p = plan_slabs(c, radii, gx, cc, sr)
        sp = p._replace(wcap=jnp.minimum(p.wcap, 128))
        B = slab_sweep_masks(sp, rpw=1, interpret=False)
        rp = jnp.sum(jax.lax.population_count(B).astype(jnp.int32),
                     axis=2, dtype=jnp.int32)
        return (jnp.sum(rp, dtype=jnp.int32) % 2).astype(jnp.float32)

    stage("plan_masks_ms", s_masks)

    def s_resid(c):
        p = plan_slabs(c, radii, gx, cc, sr)
        rida, ridb, rcount, r_ok = residual_pairs(p, interpret=False)
        return (rcount % 2).astype(jnp.float32) \
            + (rida[0] % 2).astype(jnp.float32) * jnp.float32(1e-3)

    stage("plan_residual_ms", s_resid)

    def s_full(c):
        ida, idb, tot, ok = slab_mask_fill(
            c, radii, capacity, gx, cc, sr, dual=True)
        return (tot % 2).astype(jnp.float32) \
            + (ida[0] % 2).astype(jnp.float32) * jnp.float32(1e-3)

    stage("full_fill_ms", s_full)
    print("ROW " + json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "hetero"
    if which == "hetero":
        hetero_public()
    elif which == "fillsplit":
        fill_splits()
    else:
        raise SystemExit("unknown mode: " + which)
