"""HISTORICAL (round 3): measured the streaming-cursor sweep fill
(kernels/stream_emit.py stream_fill_pairs), DELETED in round 4 after
its dense full-capacity configuration crashed the TPU worker and the
mask-fill path measured 2.3x faster (VERDICT r3 item 5). Kept for the
numbers cited in results_v5e_round3.jsonl; no longer runnable.
"""
raise SystemExit("historical: stream_fill_pairs was removed in round 4")

"""Round-3 fill experiments: streaming in-kernel emission vs mask fill.

Configs:
  uniform  — 1M spheres, r ~ U(0, 1/sqrt(n)), capacity 16384
  dense    — the reference benchmark scene (N=307200, rmax=0.06,
             107.6M pairs), full-capacity fill
Usage: python -u benchmarks/exp_r3_fill.py [uniform|dense|both]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import plan_columns, default_column_config
from collision_tpu.kernels.sweep import RPW_LADDER
from collision_tpu.kernels.stream_emit import _stream_fill, _FLUSH
from collision_tpu.fill import _mask_fill_impl


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


def bench_scene(name, n, rmax, capacity, k=6):
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, rmax, n).astype("float32"))

    gxy, col_cap, slab_rows = default_column_config(n)
    plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    if not bool(plan.ok):
        col_cap = int(np.ceil(int(plan.max_col) / 64) * 64)
        slab_rows = int(plan.max_slab_rows) + 2
        plan = plan_columns(coords, radii, gxy, col_cap, slab_rows)
    need_m = int(plan.rows_needed)
    need_r = int(plan.rows_rolled)
    rpw_m = next(r for r in RPW_LADDER if r >= need_m)
    rpw_r = next(r for r in RPW_LADDER if r >= need_r)
    mc = plan.mc
    print("{}: gxy={} col_cap={} rows_needed={} rows_rolled={}".format(
        name, gxy, col_cap, need_m, need_r), flush=True)

    cap_pad = max(-(-capacity // (2 * _FLUSH)) * (2 * _FLUSH), 2 * _FLUSH)

    # --- streaming fill (plan re-done in chain: full step cost) ---
    from collision_tpu.columns import _plan_columns

    @partial(jax.jit, static_argnames=("k",))
    def chain_stream(args, k):
        def body(i, c):
            arrays = _plan_columns(c, radii, gxy, col_cap, slab_rows)
            stream, starts, slab_r0, w0, wcap = arrays[:5]
            ida, idb, tot, ok = _stream_fill(
                stream, starts, slab_r0, w0, wcap,
                gxy, mc, slab_rows, rpw_r, cap_pad, False)
            probe = (ida[0] & 1) + (idb[0] & 1) + (tot & 1)
            return c + probe.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    t_stream = chain_time(chain_stream, coords, k=k)
    print("{} stream_fill: {:.3f} ms".format(name, t_stream), flush=True)

    # --- mask fill ---
    @partial(jax.jit, static_argnames=("k",))
    def chain_mask(args, k):
        def body(i, c):
            ida, idb, tot, ok = _mask_fill_impl(
                c, radii, capacity, gxy, col_cap, slab_rows,
                rpw_m, False, 1 << 16, None)
            probe = (ida[0] & 1) + (idb[0] & 1) + (tot & 1)
            return c + probe.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    t_mask = chain_time(chain_mask, coords, k=k)
    print("{} mask_fill:   {:.3f} ms".format(name, t_mask), flush=True)

    # --- parity spot-check ---
    stream, starts, slab_r0, w0, wcap = (
        plan.stream, plan.starts, plan.slab_r0, plan.w0, plan.wcap)
    ida_s, idb_s, tot_s, ok_s = _stream_fill(
        stream, starts, slab_r0, w0, wcap,
        gxy, mc, slab_rows, rpw_r, cap_pad, False)
    ida_m, idb_m, tot_m, ok_m = _mask_fill_impl(
        coords, radii, capacity, gxy, col_cap, slab_rows,
        rpw_m, False, 1 << 16, None)
    ts, tm = int(tot_s), int(tot_m)
    print("{} totals stream={} mask={} ok={}/{}".format(
        name, ts, tm, bool(ok_s), bool(ok_m)), flush=True)
    assert ts == tm
    m = min(ts, capacity)

    @jax.jit
    def checksum(a, b):
        # Order-independent pair-set fingerprint, computed on device (a
        # full fetch of a 100M-pair buffer costs ~20 s over the tunnel).
        a = a[:m].astype(jnp.uint32)
        b = b[:m].astype(jnp.uint32)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        h = (lo * jnp.uint32(2654435761)) ^ (hi * jnp.uint32(40503))
        h ^= h >> 15
        return jnp.sum(h, dtype=jnp.uint32), jnp.sum(
            h.astype(jnp.float64) if False else h.astype(jnp.float32))

    cs = checksum(ida_s[:capacity], idb_s[:capacity])
    cm = checksum(ida_m, idb_m)
    eq = int(cs[0]) == int(cm[0])
    print("{} pair-set checksums equal: {} ({} pairs)".format(
        name, eq, m), flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.devices()[0].platform, flush=True)
    if mode in ("uniform", "both"):
        bench_scene("uniform-1M", 1_000_000, 1e-3, 16384)
    if mode in ("dense", "both"):
        bench_scene("dense-307k", 307200, 0.06, 110_000_000, k=2)


if __name__ == "__main__":
    main()
