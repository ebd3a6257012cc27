"""Round-4: plan-cost decomposition and stream-construction variants.

VERDICT r3 item 2 names the plan's stream interleave as a lever: the
[8, npad] -> [Rp, 8, 128] relayout measured ~1.1 ms at 1M vs a 0.16 ms
bandwidth SOL. This measures (a) the full plan and its three stages
(sort / stream build / window tables) separately, and (b) four stream
construction strategies, to pick where the round-4 headline margin
comes from.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r4_stream.py
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import LANE
from collision_tpu.slabs import default_slab_config, plan_slabs, _xbits_z


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


def main():
    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    gx, col_cap, slab_rows = default_slab_config(n)
    print("backend:", jax.devices()[0].platform, "gx:", gx, flush=True)
    out = {"gx": gx}
    eps = jnp.float32(1e-7)

    # --- full plan ---
    def plan_step(s):
        p = plan_slabs(coords + s * jnp.float32(1e-12), radii, gx,
                       col_cap, slab_rows)
        return jnp.sum(p.stream[0, 0]) * eps + p.max_col.astype(jnp.float32)
    ms = chain_time(plan_step)
    out["plan_ms"] = round(ms, 3)
    print(f"plan: {ms:.3f} ms", flush=True)

    # --- sort alone (the 6-operand composite-key sort) ---
    zbits = _xbits_z(gx)

    def sort_step(s):
        c = coords + s * jnp.float32(1e-12)
        lo_s = jnp.min(c, axis=0)
        ext = jnp.max(c, axis=0) - lo_s
        r_max = jnp.max(radii)
        sx = jnp.maximum(2 * r_max, ext[0] / gx)
        col = jnp.clip(((c[:, 0] - lo_s[0]) / sx).astype(jnp.int32),
                       0, gx - 1).astype(jnp.uint32)
        zmax = (1 << zbits) - 1
        zq = jnp.minimum((jnp.maximum((c[:, 2] - lo_s[2]), 0.0)
                          * (zmax / jnp.maximum(ext[2], 1e-30)))
                         .astype(jnp.uint32), jnp.uint32(zmax))
        key = (col << zbits) | zq
        ids = jnp.arange(n, dtype=jnp.uint32)
        outs = jax.lax.sort(
            (key, ids, c[:, 0], c[:, 1], c[:, 2], radii),
            num_keys=1, is_stable=True)
        return outs[2][0] * eps
    ms = chain_time(sort_step)
    out["sort_ms"] = round(ms, 3)
    print(f"sort (6 operands): {ms:.3f} ms", flush=True)

    # --- stream construction variants from pre-sorted components ---
    p0 = plan_slabs(coords, radii, gx, col_cap, slab_rows)
    Rp = p0.stream.shape[0]
    npad = Rp * LANE
    # Recover flat per-component arrays (pre-sorted, padded) once.
    comp_flat = [jnp.asarray(np.asarray(p0.stream[:, c, :]).reshape(-1))
                 for c in range(8)]

    def dep(s):
        # One lane's worth of data dependency, negligible cost.
        return comp_flat[0].at[0].add(s * jnp.float32(1e-12))

    def consume(st):
        # optimization_barrier forces the layout to actually materialize
        # (a reassociating checksum alone lets XLA fold sum-of-transpose
        # back into per-component sums — measured 0.000 ms); then one
        # row's checksum keeps the value live at negligible read cost.
        st = jax.lax.optimization_barrier(st)
        w = jax.lax.bitcast_convert_type(st[0], jnp.int32)
        return (jnp.sum(w, dtype=jnp.int32) % 97).astype(jnp.float32) * eps

    def v_transpose(s):
        c0 = dep(s)
        comps = jnp.stack([c0] + comp_flat[1:])            # [8, npad]
        st = jnp.transpose(comps.reshape(8, Rp, LANE), (1, 0, 2))
        return consume(st)
    ms = chain_time(v_transpose)
    out["stream_transpose_ms"] = round(ms, 3)
    print(f"stream build, stack+transpose (current): {ms:.3f} ms",
          flush=True)

    def v_stack1(s):
        c0 = dep(s)
        rows = [v.reshape(Rp, LANE) for v in [c0] + comp_flat[1:]]
        st = jnp.stack(rows, axis=1)                       # [Rp, 8, 128]
        return consume(st)
    ms = chain_time(v_stack1)
    out["stream_stack1_ms"] = round(ms, 3)
    print(f"stream build, stack(axis=1): {ms:.3f} ms", flush=True)

    def v_dus(s):
        c0 = dep(s)
        st = jnp.zeros((Rp, 8, LANE), jnp.float32)
        for c, v in enumerate([c0] + comp_flat[1:]):
            st = st.at[:, c, :].set(v.reshape(Rp, LANE))
        return consume(st)
    ms = chain_time(v_dus)
    out["stream_dus_ms"] = round(ms, 3)
    print(f"stream build, at[:,c,:].set: {ms:.3f} ms", flush=True)

    def v_planar(s):
        c0 = dep(s)
        st = jnp.stack([v.reshape(Rp, LANE)
                        for v in [c0] + comp_flat[1:]])    # [8, Rp, 128]
        return consume(st)
    ms = chain_time(v_planar)
    out["stream_planar_ms"] = round(ms, 3)
    print(f"stream build, planar [8, Rp, 128]: {ms:.3f} ms", flush=True)

    # --- window tables alone (plan minus sort minus stream) ---
    out["windows_ms"] = round(
        max(out["plan_ms"] - out["sort_ms"] - out["stream_transpose_ms"],
            0.0), 3)
    print(f"window tables (by difference): {out['windows_ms']:.3f} ms",
          flush=True)

    print("ROW " + json.dumps({"name": "r4-stream-1M", **out}), flush=True)


if __name__ == "__main__":
    main()
