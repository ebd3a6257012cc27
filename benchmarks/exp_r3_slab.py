"""Round-3: 1-D slab-sweep count engine vs the 2-D column engine at 1M.

Sweeps gx around the default to find the window-packing sweet spot, and
splits plan vs sweep cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/exp_r3_slab.py [n]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns, \
    _plan_columns
from collision_tpu.kernels.sweep import RPW_LADDER, _sweep_count
from collision_tpu.slabs import default_slab_config, plan_slabs, _plan_slabs
from collision_tpu.kernels.slab_sweep import _slab_count


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
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    # --- 2-D column engine baseline (rolled) ---
    gxy, col_cap2, slab_rows2 = default_column_config(n)
    plan2 = plan_columns(coords, radii, gxy, col_cap2, slab_rows2)
    need_r = int(plan2.rows_rolled)
    rpw_r = next(r for r in RPW_LADDER if r >= need_r)
    print("columns: gxy={} rows_rolled={} rpw={}".format(
        gxy, need_r, rpw_r), flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain2(args, k):
        def body(i, c):
            arrays = _plan_columns(c, radii, gxy, col_cap2, slab_rows2)
            stream, starts, slab_r0, w0, wcap = arrays[:5]
            cnt, cntf = _sweep_count(stream, starts, slab_r0, w0, wcap,
                                     gxy, plan2.mc, slab_rows2, rpw_r,
                                     False, True)
            return c + (cnt & 1).astype(jnp.float32) * 1e-9 + cntf * 1e-30
        return jax.lax.fori_loop(0, k, body, args)

    t2 = chain_time(chain2, coords)
    ref_count = None
    print("columns rolled count: {:.3f} ms".format(t2), flush=True)

    # --- slab engine at several gx ---
    for gx in (48, 64, 75, 96, 128):
        _, col_cap, slab_rows = default_slab_config(n)
        occ = n / gx
        from collision_tpu.utils import round_up
        col_cap = int(round_up(int(occ + 6 * occ ** 0.5 + 16), 64))
        slab_rows = col_cap // 128 + 4
        plan = plan_slabs(coords, radii, gx, col_cap, slab_rows)
        ok = bool(plan.ok)
        need = int(plan.rows_rolled)
        rpw = next(r for r in RPW_LADDER if r >= need)
        cnt0 = int(_slab_count(
            plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap,
            gx, plan.mc, slab_rows, rpw, False)[0])
        if ref_count is None:
            ref_count = cnt0
        print("slab gx={}: ok={} rows_rolled={} rpw={} count={} match={}"
              .format(gx, ok, need, rpw, cnt0, cnt0 == ref_count),
              flush=True)

        mc = plan.mc

        @partial(jax.jit, static_argnames=("k",))
        def chain_s(args, k, gx=gx, mc=mc, col_cap=col_cap,
                    slab_rows=slab_rows, rpw=rpw):
            def body(i, c):
                arrays = _plan_slabs(c, radii, gx, col_cap, slab_rows)
                stream, starts, slab_r0, w0, wcap = arrays[:5]
                cnt, cntf = _slab_count(stream, starts, slab_r0, w0, wcap,
                                        gx, mc, slab_rows, rpw, False)
                return c + (cnt & 1).astype(jnp.float32) * 1e-9 \
                    + cntf * 1e-30
            return jax.lax.fori_loop(0, k, body, args)

        ts = chain_time(chain_s, coords)
        print("slab gx={} full count step: {:.3f} ms".format(gx, ts),
              flush=True)

        # plan-only split
        @partial(jax.jit, static_argnames=("k",))
        def chain_p(args, k, gx=gx, col_cap=col_cap, slab_rows=slab_rows):
            def body(i, c):
                arrays = _plan_slabs(c, radii, gx, col_cap, slab_rows)
                stream, w0 = arrays[0], arrays[3]
                probe = stream[0, 0, 0] * 1e-30 \
                    + (w0[0, 0] & 1).astype(jnp.float32) * 1e-9
                return c + probe
            return jax.lax.fori_loop(0, k, body, args)

        tp = chain_time(chain_p, coords)
        print("slab gx={} plan only: {:.3f} ms (sweep ~{:.3f})".format(
            gx, tp, ts - tp), flush=True)


if __name__ == "__main__":
    main()
