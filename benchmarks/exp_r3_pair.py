"""Round-3: timing of the chunk-paired slab count kernel.

The strip microbench (exp_r3_strip.py) measured the a-side
[6,128]->[128,6] transpose as the sweep's dominant machinery (3.6 of
5.8 ms at 1M) and the dynamic a-read+roll as the next (~2.6 ms); the
paired kernel amortizes both over the two chunks each stream row
already holds. This measures plan+dual-count end-to-end and the
kernel alone at pair-unroll 1/2/4.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_pair.py
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import LANE
from collision_tpu.kernels.slab_sweep import _slab_count
from collision_tpu.slabs import (
    RESIDUAL_JOBS, default_slab_config, plan_slabs, residual_count)


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

    plan = plan_slabs(coords, radii, gx, col_cap, slab_rows)
    wcap_c = jnp.minimum(plan.wcap, LANE)
    eps = jnp.float32(1e-7)

    out = {}
    for unroll in (1, 2, 4):
        def kstep(s, unroll=unroll):
            # Data-depend each iteration through ONE unused SMEM table
            # entry (starts[gx+1] is never read by the count kernel) —
            # perturbing the stream itself would add a ~32 MB
            # materialization to every "kernel-only" sample (advisor
            # r3 finding).
            bump = jnp.where(s < jnp.float32(1e30), 0, 1).astype(jnp.int32)
            c, _ = _slab_count(
                plan.stream,
                plan.starts.at[plan.gx + 1].add(bump),
                plan.slab_r0, plan.w0, wcap_c,
                plan.gx, plan.mc, plan.slab_rows, 1, False, unroll)
            return c.astype(jnp.float32) * eps
        ms = chain_time(kstep)
        out[f"kernel_u{unroll}"] = round(ms, 3)
        print(f"kernel-only pair-unroll {unroll}: {ms:.3f} ms", flush=True)

    for unroll in (2, 4):
        def fstep(s, unroll=unroll):
            c2 = coords + s * jnp.float32(1e-12)
            p = plan_slabs(c2, radii, gx, col_cap, slab_rows)
            cnt, _ = _slab_count(
                p.stream, p.starts, p.slab_r0, p.w0,
                jnp.minimum(p.wcap, LANE),
                p.gx, p.mc, p.slab_rows, 1, False, unroll)
            r, _ = residual_count(p, RESIDUAL_JOBS)
            return (cnt + r).astype(jnp.float32) * eps
        ms = chain_time(fstep)
        out[f"step_u{unroll}"] = round(ms, 3)
        print(f"full dual step, pair-unroll {unroll}: {ms:.3f} ms",
              flush=True)

    def full_step(s):
        c2 = coords + s * jnp.float32(1e-12)
        p = plan_slabs(c2, radii, gx, col_cap, slab_rows)
        cnt, _ = _slab_count(
            p.stream, p.starts, p.slab_r0, p.w0,
            jnp.minimum(p.wcap, LANE),
            p.gx, p.mc, p.slab_rows, 1, False, 1)
        r, _ = residual_count(p, RESIDUAL_JOBS)
        return (cnt + r).astype(jnp.float32) * eps

    ms = chain_time(full_step)
    out["step_u1"] = round(ms, 3)
    print(f"full dual step (plan+kernel+residual, u1): {ms:.3f} ms",
          flush=True)

    # Exactness spot check against the shipped path.
    from collision_tpu.kernels.slab_sweep import slab_count_dual
    cnt, ok = slab_count_dual(plan)
    print("count:", int(cnt), "ok:", bool(ok), flush=True)
    out["count"] = int(cnt)
    print("ROW " + json.dumps({"name": "pair-1M", **out}), flush=True)


if __name__ == "__main__":
    main()
