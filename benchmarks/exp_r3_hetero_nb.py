"""Round-3: hetero nb sweep — big-set size vs count-step time at 1M.

big_pairs costs ~84.5 ms at nb=2048 (profiled: 6x250k overhead-bound
tiles); shrinking nb shrinks the big pass linearly but raises the
small class's r_max (wider columns -> slower parked sweep). This
measures the total count step across nb to pick the default.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_hetero_nb.py
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import default_column_config, plan_columns
from collision_tpu.hetero import hetero_collide
from collision_tpu.kernels.sweep import RPW_LADDER


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


def main():
    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    print("backend:", jax.devices()[0].platform, flush=True)

    ref = None
    for nb in (256, 512, 1024, 2048):
        _, bidx = jax.lax.top_k(radii, nb)
        parked = radii.at[bidx.astype(jnp.int32)].set(-1.0)
        gxy, cc, sr = default_column_config(n)
        for _ in range(3):
            plan = plan_columns(coords, parked, gxy, cc, sr)
            ncc = int(np.ceil(int(plan.max_col) / 64) * 64)
            nsr = int(plan.max_slab_rows) + 2
            if ncc <= cc and nsr <= sr:
                break
            cc, sr = max(cc, ncc), max(sr, nsr)
        rpw = next(x for x in RPW_LADDER if x >= int(plan.rows_rolled))

        _, total, ok = hetero_collide(coords, radii, 0, nb=nb, gxy=gxy,
                                      col_capacity=cc, slab_rows=sr,
                                      rpw=rpw)
        if ref is None:
            ref = int(total)

        @partial(jax.jit, static_argnames=("k",))
        def chain(c, k, nb=nb, gxy=gxy, cc=cc, sr=sr, rpw=rpw):
            def body(i, c):
                _, total, ok = hetero_collide(
                    c, radii, 0, nb=nb, gxy=gxy, col_capacity=cc,
                    slab_rows=sr, rpw=rpw)
                eps = (total % 2).astype(jnp.float32) * 1e-7
                return c + eps + ok.astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, k, body, c)

        ms = chain_time(chain, coords)
        print("ROW " + json.dumps({
            "nb": nb, "ms": round(ms, 3), "count": int(total),
            "ok": bool(ok), "match": int(total) == ref, "gxy": gxy,
            "cc": cc, "sr": sr, "rpw": rpw}), flush=True)


if __name__ == "__main__":
    main()
