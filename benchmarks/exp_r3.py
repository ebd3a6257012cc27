"""Round-3 experiments: decomposing the 1M count step toward <10 ms.

Modes (arg 1):
  decomp   — sort / plan / sweep split at 1M, plain vs rolled kernel
  occ      — occupancy sweep for the rolled kernel
  sort     — lax.sort variants (stable/unstable, payload count)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/exp_r3.py decomp
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import (
    _column_sort, _plan_columns, default_column_config, plan_columns,
    ColumnPlan)
from collision_tpu.kernels.sweep import _sweep_count, RPW_LADDER


def chain_time(chain, args, k=8, repeats=3):
    """Best per-step ms via (k+1)-chain minus 1-chain differencing."""
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


def scene(n, seed=4, rmax=None):
    rng = np.random.RandomState(seed)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, rmax if rmax else 1 / n ** 0.5, n).astype("float32"))
    return coords, radii


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "decomp"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    print("backend:", jax.devices()[0].platform, "mode:", mode, "n:", n,
          flush=True)
    coords, radii = scene(n)

    if mode == "sort":
        key = jnp.asarray(
            np.random.RandomState(0).randint(0, 2 ** 30, n).astype("uint32"))
        ids = jnp.arange(n, dtype=jnp.uint32)
        fs = [coords[:, 0], coords[:, 1], coords[:, 2], radii]

        def mk(stable, nops):
            @partial(jax.jit, static_argnames=("k",))
            def chain(args, k):
                def body(i, a):
                    ops = jax.lax.sort(a, num_keys=1, is_stable=stable)
                    return tuple(
                        o ^ (ops[0][0] & 1) if o.dtype == jnp.uint32
                        else o + (ops[0][0] & 1).astype(o.dtype) * 1e-7
                        for o in a)
                return jax.lax.fori_loop(0, k, body, args)
            args = tuple([key, ids] + fs[:nops - 2])
            return chain, args

        for stable in (True, False):
            for nops in (2, 4, 6):
                c, a = mk(stable, nops)
                print("sort stable={} ops={}: {:.3f} ms".format(
                    stable, nops, chain_time(c, a)), flush=True)
        return

    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    assert bool(plan.ok)
    need_plain = int(plan.rows_needed)
    need_roll = int(plan.rows_rolled)
    rpw_p = next(r for r in RPW_LADDER if r >= need_plain)
    rpw_r = next(r for r in RPW_LADDER if r >= need_roll)
    print("gxy={} col_cap={} slab_rows={} rows_needed={} rows_rolled={}"
          .format(gxy, col_cap, slab_rows, need_plain, need_roll),
          flush=True)

    if mode == "decomp":
        mc = plan.mc

        # plan-only chain (consume EVERY output or XLA dead-codes stages)
        @partial(jax.jit, static_argnames=("k",))
        def chain_plan(args, k):
            def body(i, c):
                arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
                stream, starts, slab_r0, w0, wcap = arrays[:5]
                probe = (stream[0, 0, 0] + stream[-1, 7, 127]
                         + w0[0, 0].astype(jnp.float32)
                         + wcap[-1, -1].astype(jnp.float32)
                         + starts[1].astype(jnp.float32)
                         + jnp.sum(w0[:, ::512]).astype(jnp.float32))
                return c + probe * 1e-12
            return jax.lax.fori_loop(0, k, body, args)

        print("plan(all-consumed): {:.3f} ms".format(
            chain_time(chain_plan, coords)), flush=True)

        # sort-only chain (consume every sorted operand)
        @partial(jax.jit, static_argnames=("k",))
        def chain_sort(args, k):
            def body(i, c):
                cs = _column_sort(c, radii, gxy)
                probe = (cs.x_s[0] + cs.y_s[1] + cs.z_s[2] + cs.r_s[3]
                         + (cs.key_s[0] & 1).astype(jnp.float32)
                         + (cs.ids_s[4] & 1).astype(jnp.float32))
                return c + probe * 1e-12
            return jax.lax.fori_loop(0, k, body, args)

        print("sort(col, all-consumed): {:.3f} ms".format(
            chain_time(chain_sort, coords)), flush=True)

        # full step, plain vs rolled kernel
        for rolled, rpw in ((False, rpw_p), (True, rpw_r)):
            @partial(jax.jit, static_argnames=("k",))
            def chain_full(args, k, rolled=rolled, rpw=rpw):
                def body(i, c):
                    arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
                    stream, starts, slab_r0, w0, wcap = arrays[:5]
                    cnt, _ = _sweep_count(
                        stream, starts, slab_r0, w0, wcap,
                        gxy, mc, slab_rows, rpw, False, rolled)
                    return c + (cnt % 2).astype(jnp.float32) * 1e-7
                return jax.lax.fori_loop(0, k, body, args)

            print("full rolled={} rpw={}: {:.3f} ms".format(
                rolled, rpw, chain_time(chain_full, coords)), flush=True)

            # sweep-only (plan hoisted out of the chain)
            p = plan

            @partial(jax.jit, static_argnames=("k",))
            def chain_sweep(args, k, rolled=rolled, rpw=rpw, p=p):
                def body(i, st):
                    cnt, _ = _sweep_count(
                        st, p.starts, p.slab_r0, p.w0, p.wcap,
                        gxy, mc, slab_rows, rpw, False, rolled)
                    return st + (cnt % 2).astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, k, body, args)

            print("sweep rolled={} rpw={}: {:.3f} ms".format(
                rolled, rpw, chain_time(chain_sweep, p.stream)), flush=True)

        # parity check
        from collision_tpu.kernels.sweep import sweep_count
        c_plain = int(sweep_count(plan, rpw=rpw_p))
        c_roll = int(sweep_count(plan, rpw=rpw_r, rolled=True))
        print("counts plain={} rolled={} equal={}".format(
            c_plain, c_roll, c_plain == c_roll), flush=True)
        return

    if mode == "occ":
        for occ in (500, 750, 1000, 1500, 2000, 3000):
            gxy, col_cap, slab_rows = default_column_config(n, occ)
            p = plan_columns(coords, radii, gxy, col_cap, slab_rows)
            if not bool(p.ok):
                print("occ={}: plan overflow".format(occ), flush=True)
                continue
            nr = int(p.rows_rolled)
            rpw = next(r for r in RPW_LADDER if r >= nr)
            mc = p.mc

            @partial(jax.jit, static_argnames=("k",))
            def chain_full(args, k, gxy=gxy, col_cap=col_cap,
                           slab_rows=slab_rows, rpw=rpw, mc=mc):
                def body(i, c):
                    arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
                    stream, starts, slab_r0, w0, wcap = arrays[:5]
                    cnt, _ = _sweep_count(
                        stream, starts, slab_r0, w0, wcap,
                        gxy, mc, slab_rows, rpw, False, True)
                    return c + (cnt % 2).astype(jnp.float32) * 1e-7
                return jax.lax.fori_loop(0, k, body, args)

            print("occ={} gxy={} rpw={}: {:.3f} ms".format(
                occ, gxy, rpw, chain_time(chain_full, coords)), flush=True)
        return


if __name__ == "__main__":
    main()
