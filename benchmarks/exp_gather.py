"""Probe the v5e primitives that bound large-capacity pair emission.

G1  sequential write floor: materialize [M, 2] u32 from iota
G2  gather [M] u32 from a SMALL (256k) table, random indices
G3  gather [M] u32 from a LARGE (64M) table, random indices
G4  gather [M] u32, SORTED indices (the fill's monotone case)
G5  row-gather [M/8, 8] u32 rows from a large table (fewer, wider)
G6  popcount + 5-step bit-rank-select on [M] u32 words
G7  two-level cumsum over [64M] i32
M = 2^26 (67M) by default; override with M=.
"""

import os
import time
from functools import partial

import numpy as np


def timed(name, fn, *args, rounds=3):
    import jax
    r = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t = time.perf_counter()
        # chain twice to amortize dispatch; fetch one element
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t)
    print("{:<42s} {:8.2f} ms".format(name, best * 1e3), flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.devices()[0].platform, flush=True)
    M = int(os.environ.get("M", 1 << 26))
    rng = np.random.RandomState(0)

    small = jnp.asarray(rng.randint(0, 1 << 30, 1 << 18).astype("uint32"))
    large = jnp.asarray(rng.randint(0, 1 << 30, 1 << 26).astype("uint32"))
    idx_small = jnp.asarray(rng.randint(0, 1 << 18, M).astype("int32"))
    idx_large = jnp.asarray(rng.randint(0, 1 << 26, M).astype("int32"))
    idx_sorted = jnp.asarray(np.sort(
        rng.randint(0, 1 << 26, M)).astype("int32"))

    @jax.jit
    def g1(x):
        # SoA: [M,2] AoS u32 tiles to T(8,128) -> 64x padding (measured:
        # 34 GB for 67M pairs). Two flat arrays have zero padding.
        i = jnp.arange(M, dtype=jnp.uint32) + x
        return i, i + 1

    @jax.jit
    def g2(t, i):
        return jnp.take(t, i)

    @jax.jit
    def g5(t, i):
        rows = jnp.take(t.reshape(-1, 8), i[: M // 8] >> 3, axis=0)
        return rows

    @jax.jit
    def g6(w):
        r = w & 31
        word = w
        pos = jnp.zeros_like(w)
        cnt = r
        for shift in (16, 8, 4, 2, 1):
            lowmask = (jnp.uint32(1) << (pos + shift)) - 1
            c = jax.lax.population_count(word & lowmask)
            go = c <= cnt
            pos = jnp.where(go, pos + shift, pos)
        return pos

    @jax.jit
    def g7(m):
        rows = m.reshape(-1, 4096)
        inner = jnp.cumsum(rows, axis=1)
        bases = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(inner[:, -1])[:-1]])
        return (inner + bases[:, None]).reshape(-1)

    timed("G1 write [M,2] u32 floor", g1, jnp.uint32(1))
    timed("G2 gather M from 256k table", g2, small, idx_small)
    timed("G3 gather M from 64M table", g2, large, idx_large)
    timed("G4 gather M sorted idx", g2, large, idx_sorted)
    timed("G5 row-gather M/8 x8 rows", g5, large, idx_large)
    timed("G6 popcount rank-select M", g6, large)
    timed("G7 two-level cumsum 64M", g7,
          jnp.asarray(rng.randint(0, 2, 1 << 26).astype("int32")))

    # native searchsorted at scale, small table
    tbl = jnp.asarray(np.sort(rng.randint(0, 1 << 30, 1 << 18))
                      .astype("uint32"))
    q = jnp.asarray(rng.randint(0, 1 << 30, M).astype("uint32"))

    @jax.jit
    def g8(t, q):
        return jnp.searchsorted(t, q)

    timed("G8 native searchsorted M/256k", g8, tbl, q)


if __name__ == "__main__":
    main()
