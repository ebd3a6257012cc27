"""Round-4: FILL crossover — fill-step time per engine vs n.

Round 3 measured the count crossover only (exp_r3_crossover.py); auto
fill routing had no data behind it (VERDICT r3 item 3). This measures
capacity-16384 fill steps for the slab engine (dual-dispatch masks +
residual append), the column engine (rolled masks at the plan's rpw),
and — small n only — grid/bvh, on uniform scenes, plus the count step
for the fill/count gap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r4_crossover.py [ns...]
"""

import json
import sys
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


def bench(n, method, capacity, k=8):
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))

    @partial(jax.jit, static_argnames=("k",))
    def chain(args, k):
        def body(i, c):
            res = collide(c, radii, capacity, method=method)
            eps = (res.count % 2).astype(jnp.float32) * 1e-7
            ok = res.ok if res.ok is not None else jnp.bool_(True)
            probe = jnp.float32(0)
            if res.pairs is not None:
                probe = (res.pairs[0, 0] % 2).astype(jnp.float32) * 1e-9
            return c + eps + ok.astype(jnp.float32) * 1e-9 + probe
        return jax.lax.fori_loop(0, k, body, args)

    res = collide(coords, radii, capacity, method=method)
    cnt, ok = int(res.count), bool(res.ok) if res.ok is not None else True
    ms = chain_time(chain, coords, k=k)
    return ms, cnt, ok


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    ns = [int(a) for a in sys.argv[1:]] or [16384, 65536, 262144, 1_000_000]
    cap = 16384
    for n in ns:
        ref = None
        for method, capacity in (
                ("slab", cap), ("column", cap),
                ("slab", 0), ("column", 0)):
            k = 8 if n <= 262144 else 6
            ms, cnt, ok = bench(n, method, capacity, k=k)
            if ref is None:
                ref = cnt
            row = {"n": n, "method": method, "capacity": capacity,
                   "ms": round(ms, 3), "count": cnt, "ok": ok,
                   "match": cnt == ref}
            print("ROW " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
