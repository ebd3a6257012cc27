"""Round-3: split mask_fill into sweep_masks vs XLA emission cost at 1M.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/exp_r3_split.py
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import (
    _plan_columns, default_column_config, plan_columns)
from collision_tpu.kernels.sweep import RPW_LADDER, _sweep_masks, _sweep_count
from collision_tpu.fill import _mask_fill_impl


def chain_time(chain, args, k=8, repeats=3):
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print("backend:", jax.devices()[0].platform, "n:", n, flush=True)
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    need_m = int(plan.rows_needed)
    need_r = int(plan.rows_rolled)
    rpw_m = next(r for r in RPW_LADDER if r >= need_m)
    rpw_r = next(r for r in RPW_LADDER if r >= need_r)
    print("gxy={} rows_needed={} rolled={}".format(gxy, need_m, need_r),
          flush=True)

    # plan + rolled count sweep (the 12.7 ms step baseline)
    @partial(jax.jit, static_argnames=("k",))
    def chain_count(args, k):
        def body(i, c):
            arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
            stream, starts, slab_r0, w0, wcap = arrays[:5]
            cnt, cntf = _sweep_count(stream, starts, slab_r0, w0, wcap,
                                     gxy, plan.mc, slab_rows, rpw_r,
                                     False, True)
            return c + (cnt & 1).astype(jnp.float32) * 1e-9 + cntf * 1e-30
        return jax.lax.fori_loop(0, k, body, args)

    print("plan+count(rolled): {:.3f} ms".format(
        chain_time(chain_count, coords)), flush=True)

    # plan + sweep_masks only (consume the mask buffer)
    @partial(jax.jit, static_argnames=("k",))
    def chain_masks(args, k):
        def body(i, c):
            arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
            stream, starts, slab_r0, w0, wcap = arrays[:5]
            B = _sweep_masks(stream, starts, slab_r0, w0, wcap,
                             gxy, plan.mc, slab_rows, rpw_m, False)
            probe = (B[0, 0, 0] ^ B[-1, -1, -1]) \
                ^ jnp.sum(B[:, 0, ::64].astype(jnp.int32)).astype(
                    jnp.uint32)
            return c + (probe & 1).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    print("plan+masks: {:.3f} ms".format(
        chain_time(chain_masks, coords)), flush=True)

    # plan + masks + popcount/total only (no emission)
    @partial(jax.jit, static_argnames=("k",))
    def chain_pc(args, k):
        def body(i, c):
            arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
            stream, starts, slab_r0, w0, wcap = arrays[:5]
            B = _sweep_masks(stream, starts, slab_r0, w0, wcap,
                             gxy, plan.mc, slab_rows, rpw_m, False)
            pc = jax.lax.population_count(B.reshape(-1))
            tot = jnp.sum(pc, dtype=jnp.int32)
            return c + (tot & 1).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    print("plan+masks+popcnt: {:.3f} ms".format(
        chain_time(chain_pc, coords)), flush=True)

    # full mask_fill (capacity 16384)
    @partial(jax.jit, static_argnames=("k",))
    def chain_fill(args, k):
        def body(i, c):
            ida, idb, tot, ok = _mask_fill_impl(
                c, radii, 16384, gxy, col_cap, slab_rows,
                rpw_m, False, 1 << 16, None)
            probe = (ida[0] & 1) + (idb[0] & 1) + (tot & 1)
            return c + probe.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    print("full mask_fill:   {:.3f} ms".format(
        chain_time(chain_fill, coords)), flush=True)


if __name__ == "__main__":
    main()
