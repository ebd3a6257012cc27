"""Round-3: heterogeneous-radii 1M power-law scene (VERDICT item 3).

The bar: exact pair set in bounded time (<= ~3x the uniform step) on a
1M power-law-radii scene, which previously fell to the ~5 s BVH path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/exp_r3_hetero.py [n]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.hetero import hetero_collide


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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    # Power-law radii: many small, few large (pareto-ish tail clipped at
    # 0.05 — a single sphere covering 10% of the box in x).
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    print("backend:", jax.devices()[0].platform, "n:", n,
          "r_max:", float(jnp.max(radii)), flush=True)

    pairs, total, ok = hetero_collide(coords, radii, 16384)
    print("count={} ok={}".format(int(total), bool(ok)), flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def chain(args, k):
        def body(i, c):
            pairs, total, ok = hetero_collide(c, radii, 16384)
            eps = (total % 2).astype(jnp.float32) * 1e-7 \
                + (pairs[0, 0] % 2).astype(jnp.float32) * 1e-9
            return c + eps + ok.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, args)

    print("hetero 1M power-law fill step: {:.3f} ms".format(
        chain_time(chain, coords)), flush=True)


if __name__ == "__main__":
    main()
