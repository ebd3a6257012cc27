"""Round-3: diagonal self pass vs windowed dual dispatch at 1M.

The diagonal kernel replaces the windowed self sweep (the headline's
largest half): self-slab pairs sit within a few dozen sorted positions,
so d_max static diagonals (one select + one lane-roll per component,
zero transposes / dynamic slices) cover them, with the windowed kernel
demoted to the cross offset only. Times plan / dual / diag(D) / parts
via loop-carried chains and checks exact-count agreement + ok flags.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_diag.py [n] [gx ...]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.slabs import default_slab_config, plan_slabs
from collision_tpu.kernels.slab_sweep import (
    diag_count, slab_count_diag, slab_count_dual)


def chain_time(make_step, k=8, repeats=3):
    @partial(jax.jit, static_argnames=("kk",))
    def chain(seed, kk):
        def body(_, s):
            return make_step(s)
        return jax.lax.fori_loop(0, kk, body, seed)

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    gxs = [int(a) for a in sys.argv[2:]] or [125, 192, 256]
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    eps = jnp.float32(1e-7)
    print("backend:", jax.devices()[0].platform, "n:", n, flush=True)

    rows = {}
    for gx in gxs:
        gx, col_cap, slab_rows = default_slab_config(n, gx=gx)

        def mkplan(s):
            return plan_slabs(coords + s * eps, radii, gx, col_cap,
                              slab_rows)

        # correctness / flags, once
        plan0 = mkplan(jnp.float32(0))
        c_dual, ok_dual = slab_count_dual(plan0)
        res = {"dual_count": int(c_dual), "dual_ok": bool(ok_dual)}
        for D in (32, 48, 96):
            c_d, ok_d = slab_count_diag(plan0, d_max=D)
            res[f"diag{D}"] = (int(c_d), bool(ok_d))
        print(f"gx={gx}: {res}", flush=True)

        def step_dual(s):
            c, ok = slab_count_dual(mkplan(s))
            return c.astype(jnp.float32) * eps \
                + ok.astype(jnp.float32) * 1e-9

        t_dual = chain_time(step_dual)
        timings = {"dual_ms": t_dual}
        for D in (32, 48, 96):
            def step_diag(s, D=D):
                c, ok = slab_count_diag(mkplan(s), d_max=D)
                return c.astype(jnp.float32) * eps \
                    + ok.astype(jnp.float32) * 1e-9
            timings[f"diag{D}_ms"] = chain_time(step_diag)

        # parts: diag kernel alone over a fixed plan, forced via carry
        def step_diagk(s):
            p = mkplan(s)
            c, cf, fl = diag_count(p.stream, p.diag_thr, 48)
            return c.astype(jnp.float32) * eps
        timings["plan+diagk48_ms"] = chain_time(step_diagk)

        def step_plan(s):
            p = mkplan(s)
            return p.stream[0, 0, 0] * 0 + p.w0.astype(
                jnp.float32).max() * eps * 0 + p.wcap[0, 0].astype(
                jnp.float32) * eps
        timings["plan_ms"] = chain_time(step_plan)

        print(f"gx={gx}: " + json.dumps(
            {k: round(v, 3) for k, v in timings.items()}), flush=True)
        rows[gx] = {**res, **timings}

    print("ROW " + json.dumps({"name": f"diag-n{n}", "rows": rows}),
          flush=True)


if __name__ == "__main__":
    main()
