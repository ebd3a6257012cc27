"""Round-3: engine crossover — count-step time per engine vs n.

Measures slab (dual dispatch), column (rolled), grid, and BVH count-only
steps at n in {4k, 16k, 65k, 262k, 1M} on uniform scenes (r ~ U(0,
1/sqrt(n))), to set the auto-routing thresholds from data (VERDICT #7).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/exp_r3_crossover.py
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu import collide


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


def bench(n, method, k=8):
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    @partial(jax.jit, static_argnames=("k",))
    def chain(args, k):
        def body(i, c):
            res = collide(c, radii, 0, method=method)
            eps = (res.count % 2).astype(jnp.float32) * 1e-7
            ok = res.ok if res.ok is not None else jnp.bool_(True)
            return c + eps + ok.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    res = collide(coords, radii, 0, method=method)
    cnt, ok = int(res.count), bool(res.ok) if res.ok is not None else True
    ms = chain_time(chain, coords, k=k)
    return ms, cnt, ok


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rows = []
    for n in (4096, 16384, 65536, 262144, 1_000_000):
        ref = None
        for method in ("slab", "column", "grid", "bvh"):
            if method == "bvh" and n > 65536:
                continue  # ~seconds/step; measured round 1
            k = 8 if n <= 262144 else 6
            ms, cnt, ok = bench(n, method, k=k)
            if ref is None:
                ref = cnt
            row = {"n": n, "method": method, "ms": round(ms, 3),
                   "count": cnt, "ok": ok, "match": cnt == ref}
            rows.append(row)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
