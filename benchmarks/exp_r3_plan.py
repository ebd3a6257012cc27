"""Round-3: decompose the 1M slab-plan cost (the headline's larger half).

9.09 ms = plan 4.9 + sweep 4.2; this splits the plan into key build,
lax.sort (6 operands vs 2), stream build, and window tables, via
on-device chaining (fori_loop with a data dependence between steps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_plan.py [n] [gx]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.slabs import (
    _plan_from_sorted, _xbits_z, default_slab_config, plan_slabs,
    slab_sort_keys)


def chain_time(make_step, k=8, repeats=3):
    """Time one step by differencing two on-device chain lengths."""
    @partial(jax.jit, static_argnames=("kk",))
    def chain(seed, kk):
        def body(_, s):
            return make_step(s)
        return jax.lax.fori_loop(0, kk, body, seed)

    def run(kk):
        np.asarray(jax.tree_util.tree_leaves(chain(0.0, kk))[0]
                   .ravel()[:1])
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(chain(0.0, kk))[0]
                       .ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best

    return max((run(k + 1) - run(1)) / k * 1e3, 0.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    gx, col_cap, slab_rows = default_slab_config(n)
    if len(sys.argv) > 2:
        gx = int(sys.argv[2])
    print("backend:", jax.devices()[0].platform, "n:", n,
          "gx:", gx, "col_cap:", col_cap, "slab_rows:", slab_rows,
          flush=True)

    lo_s = jnp.min(coords, axis=0)
    hi_s = jnp.max(coords, axis=0)
    ext = hi_s - lo_s
    r_max = jnp.max(radii)
    zbits = _xbits_z(gx)

    def seed_coords(s):
        return coords + s, radii

    # (a) whole plan
    def full_plan(s):
        c = coords + s * 0
        p = plan_slabs(c, radii, gx, col_cap, slab_rows)
        return p.stream[0, 0, 0]
    t_full = chain_time(lambda s: full_plan(s) * 0)
    print("full plan: {:.2f} ms".format(t_full), flush=True)

    # (b) keys only
    def keys_only(s):
        c = coords + s * 0
        key, _ = slab_sort_keys(c, radii, gx, lo_s, ext, r_max)
        return key[0].astype(jnp.float32)
    t_keys = chain_time(lambda s: keys_only(s) * 0)
    print("keys: {:.2f} ms".format(t_keys), flush=True)

    # (c) sort with 6 operands (the plan's sort)
    key, _ = slab_sort_keys(coords, radii, gx, lo_s, ext, r_max)
    ids = jnp.arange(n, dtype=jnp.uint32)

    def sort6(s):
        k2 = key + (s * 0).astype(jnp.uint32)
        outs = jax.lax.sort(
            (k2, ids, coords[:, 0], coords[:, 1], coords[:, 2], radii),
            num_keys=1, is_stable=True)
        return outs[2][0]
    t_sort6 = chain_time(lambda s: sort6(s) * 0)
    print("sort 6-operand: {:.2f} ms".format(t_sort6), flush=True)

    # (d) sort with 2 operands
    def sort2(s):
        k2 = key + (s * 0).astype(jnp.uint32)
        outs = jax.lax.sort((k2, ids), num_keys=1, is_stable=True)
        return outs[1][0].astype(jnp.float32)
    t_sort2 = chain_time(lambda s: sort2(s) * 0)
    print("sort 2-operand: {:.2f} ms".format(t_sort2), flush=True)

    # (e) window/stream build from sorted data
    outs = jax.lax.sort(
        (key, ids, coords[:, 0], coords[:, 1], coords[:, 2], radii),
        num_keys=1, is_stable=True)
    zext = jnp.where(ext[2] > 0, ext[2], jnp.float32(1))
    zscale = ((1 << zbits) - 1) / zext

    def build(s):
        x2 = outs[2] + s * 0
        arrays = _plan_from_sorted(
            outs[0], outs[1], x2, outs[3], outs[4], outs[5],
            jnp.int32(n), gx, 0, zbits, lo_s[2], zext, zscale, r_max,
            col_cap, slab_rows)
        return arrays[0][0, 0, 0]
    try:
        t_build = chain_time(lambda s: build(s) * 0)
    except TypeError:
        # _plan_from_sorted is not jitted standalone; wrap it.
        build_j = jax.jit(build)
        t_build = chain_time(lambda s: build_j(s) * 0)
    print("stream+windows from sorted: {:.2f} ms".format(t_build),
          flush=True)

    print("ROW " + json.dumps({
        "name": "plan-split-n{}-gx{}".format(n, gx),
        "full_ms": t_full, "keys_ms": t_keys, "sort6_ms": t_sort6,
        "sort2_ms": t_sort2, "build_ms": t_build}), flush=True)


if __name__ == "__main__":
    main()
