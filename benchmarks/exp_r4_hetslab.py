"""Round-4 hetero-on-slab measurement: the S-S pass through the slab
engine (hetero.py _hetero_slab) at the 1M power-law reference scene.

Usage: python -u benchmarks/exp_r4_hetslab.py
"""

import json
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from collision_tpu.hetero import hetero_collide
from collision_tpu.slabs import default_slab_config


def chain_time(make_step, k=6, repeats=3):
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
    capacity = 16384
    nb = 1024
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    r = (1.0 / n ** 0.5) * (rng.pareto(2.5, n) + 0.2)
    radii = jnp.asarray(np.clip(r, 0, 0.05).astype("float32"))
    print("backend:", jax.devices()[0].platform, flush=True)
    eps = jnp.float32(1e-9)

    # Stats-sized gx (what the eager auto route computes).
    top = np.asarray(jax.lax.top_k(radii, nb + 1)[0])
    r_small = float(top[nb])
    ext_x = float(jnp.max(coords[:, 0]) - jnp.min(coords[:, 0]))
    gx0 = default_slab_config(n, r_max=r_small, ext=ext_x)[0]
    print("r_small", r_small, "gx0", gx0, flush=True)

    gx = ok = total = None
    for gx in (gx0, int(gx0 * 1.5) + 1, int(gx0 * 2.5) + 1):
        _, total, ok = hetero_collide(coords, radii, 0, nb=nb,
                                      engine="slab", gx=gx)
        print("gx", gx, "ok", bool(ok), "count", int(total), flush=True)
        if bool(ok):
            break
    assert bool(ok)
    out = {"name": "r4-hetero-slab-1M", "nb": nb, "gx": gx,
           "count": int(total)}

    def h_count(s):
        _, tot, okk = hetero_collide(
            coords + s * jnp.float32(1e-12), radii, 0, nb=nb,
            engine="slab", gx=gx)
        return tot.astype(jnp.float32) * eps + okk.astype(jnp.float32) * eps

    out["count_ms"] = round(chain_time(h_count), 3)
    print("count_ms", out["count_ms"], flush=True)

    def h_fill(s):
        pairs, tot, okk = hetero_collide(
            coords + s * jnp.float32(1e-12), radii, capacity, nb=nb,
            engine="slab", gx=gx)
        return tot.astype(jnp.float32) * eps \
            + (pairs[0, 0] % 2).astype(jnp.float32) * eps

    out["fill_ms"] = round(chain_time(h_fill), 3)
    print("fill_ms", out["fill_ms"], flush=True)

    pairs, totf, okf = hetero_collide(coords, radii, capacity, nb=nb,
                                      engine="slab", gx=gx)
    out["fill_ok"] = bool(okf)
    out["fill_total"] = int(totf)
    print("ROW " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
