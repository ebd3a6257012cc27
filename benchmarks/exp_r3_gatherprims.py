"""Microbench: the primitive costs that shape the big-fill emission.

On-device chained timing (fetches cost ~25-30 ms on this tunnel, so each
op is folded k times with a carry dependency and two chain lengths are
differenced).

Measures, at the block shapes of fill._mask_fill_emit_big (blk=512k):
  - flat scalar gather: 512k indices into 16k/512k/4M/64M-entry tables
  - row gather (take axis=0, 128-lane rows): small and big tables
  - cumsum(axis=1) vs 7-step shift prefix on [blk, 128]
  - one-hot select-reduce / compare-count over [blk, 128]
  - dynamic_slice of [16384, 128] from a big 2-D array

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_gatherprims.py
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

BLK = 1 << 19
K = 16


def chain_time(step, seed_carry, *tables, k=K, reps=3):
    """step(carry, *tables) -> carry; ms per step by chain differencing.

    Tables are explicit jit arguments — closure-captured device arrays
    get serialized into the remote-compile payload as constants (a 64M
    table produced an HTTP 413), so never close over big arrays here."""

    @partial(jax.jit, static_argnames=("kk",))
    def chain(c, tabs, kk):
        return jax.lax.fori_loop(0, kk, lambda i, c: step(c, *tabs), c)

    def run(kk):
        np.asarray(chain(seed_carry, tables, kk).ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            np.asarray(chain(seed_carry, tables, kk).ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best

    t1 = run(1)
    tn = run(k + 1)
    return max((tn - t1) / k * 1e3, 0.0)


def report(name, ms):
    print(json.dumps({"name": name, "ms": round(ms, 4)}), flush=True)


def main():
    rng = np.random.RandomState(0)
    print("backend:", jax.devices()[0].platform, flush=True)

    for tab_n in (16384, 1 << 19, 1 << 22, 1 << 26):
        tab = jnp.asarray(rng.randint(0, 99, tab_n).astype(np.int32))
        ix = jnp.asarray(rng.randint(0, tab_n, BLK).astype(np.int32))

        def step(c, tab):
            # perturb indices by the carry's parity so gathers can't fold
            g = jnp.take(tab, (c + jnp.int32(1)) % tab.shape[0])
            return (c + g) % jnp.int32(2 ** 20)

        ms = chain_time(step, ix, tab)
        report("flat_gather_%d" % tab_n, ms)

    for rows_n in (16384, 1 << 19, 1 << 21):
        tab2 = jnp.asarray(
            rng.randint(0, 99, (rows_n, 128)).astype(np.int32))
        ix0 = jnp.asarray(
            np.sort(rng.randint(0, rows_n, BLK)).astype(np.int32))

        def step(c, tab2, rows_n=rows_n):
            g = jnp.take(tab2, c % rows_n, axis=0)  # [BLK, 128]
            return (c + g[:, 0] + g[:, 64]) % jnp.int32(rows_n)

        ms = chain_time(step, ix0, tab2)
        report("row_gather_%dx128" % rows_n, ms)

    big0 = jnp.asarray(rng.randint(1, 9, (BLK, 128)).astype(np.int32))

    def step_cumsum(c, *t):
        s = jnp.cumsum(c, axis=1)
        return (c + s[:, -1:] % 3).astype(jnp.int32) % 7 + 1

    report("cumsum_axis1", chain_time(step_cumsum, big0))

    def step_shift(c, *t):
        x = c
        for s in (1, 2, 4, 8, 16, 32, 64):
            x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
        return (c + x[:, -1:] % 3).astype(jnp.int32) % 7 + 1

    report("shift_prefix7", chain_time(step_shift, big0))

    lane_i = jnp.arange(128, dtype=jnp.int32)[None, :]

    def step_onehot(c, *t):
        sel = c[:, 0] % 128
        v = jnp.sum(jnp.where(lane_i == sel[:, None], c, 0), axis=1)
        return (c + v[:, None] % 3) % 7 + 1

    report("onehot_select", chain_time(step_onehot, big0))

    def step_cmp(c, *t):
        sel = c[:, 0] % 128
        v = jnp.sum((c <= sel[:, None]).astype(jnp.int32), axis=1)
        return (c + v[:, None] % 3) % 7 + 1

    report("cmp_count", chain_time(step_cmp, big0))

    tabs = jnp.asarray(rng.randint(0, 99, (1 << 21, 128)).astype(np.int32))
    seed = jnp.zeros((16384, 128), jnp.int32)

    def step_dslice(c, tabs):
        s = c[0, 0] % jnp.int32((1 << 21) - 16384)
        v = jax.lax.dynamic_slice(tabs, (s, 0), (16384, 128))
        return c + v % 3

    report("dynamic_slice_16384x128", chain_time(step_dslice, seed, tabs))

    def step_quad(c, *t):
        q = jnp.sum(jax.lax.population_count(
            jax.lax.bitcast_convert_type(c, jnp.uint32)
        ).astype(jnp.int32).reshape(BLK, 4, 32), axis=2)
        return (c + q[:, :1] % 3) % 7 + 1

    report("quad_pop_sum", chain_time(step_quad, big0))


if __name__ == "__main__":
    main()
