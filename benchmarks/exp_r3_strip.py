"""Round-3: strip-down microbench of the slab count kernel's machinery.

plancross == planboth (6.3 vs 6.5 ms at 1M) proved the window tests are
free; the sweep cost is per-chunk *machinery*. Each variant here runs
the same grid/loop shape with one mechanism removed (results are wrong
— timing only):

  full      the real kernel (both offsets, 1 row, unroll 4)
  notrans   a-side transpose replaced by a broadcast row
  noroll    read_win rolls removed (aligned reads, merged select kept)
  nobread   b-side read_win replaced by reusing the a-side read
  noaread   a-side read_win replaced by a static row read
  tests0    everything read/transposed, compares removed

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_strip.py [variant ...]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collision_tpu.columns import CHUNK, LANE
from collision_tpu.slabs import SLAB_OFFSETS, default_slab_config, plan_slabs


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


def make_kernel(gx, mc, slab_rows, variant, unroll=4):
    def kernel(starts_ref, r0_ref, w0_ref, wcap_ref, stream_ref,
               total_ref, totf_ref, bufs, sems, cursor, cursor_f):
        x = pl.program_id(0)

        def start_slab(s, slot):
            pltpu.make_async_copy(
                stream_ref.at[pl.ds(r0_ref[s], slab_rows)],
                bufs.at[slot], sems.at[slot]).start()

        @pl.when(x == 0)
        def _init_dma():
            start_slab(0, 0)
            start_slab(1, 1)
            pltpu.make_async_copy(
                stream_ref.at[pl.ds(r0_ref[0], slab_rows)],
                bufs.at[0], sems.at[0]).wait()

        pltpu.make_async_copy(
            stream_ref.at[pl.ds(r0_ref[x + 1], slab_rows)],
            bufs.at[(x + 1) % 3], sems.at[(x + 1) % 3]).wait()

        @pl.when(x + 2 <= gx)
        def _prefetch():
            start_slab(x + 2, (x + 2) % 3)

        @pl.when(x == 0)
        def _init():
            cursor[0] = 0
            cursor_f[0] = 0.0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
        iota6 = jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)

        def read_win(dx, g):
            lrow = g // LANE
            lane0 = g % LANE
            slot = jax.lax.rem(x + dx, 3)
            lr = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - 2)
            if variant == "noroll":
                return bufs[slot, lr, pl.ds(0, 6), :]
            two = bufs[slot, pl.ds(lr, 2), pl.ds(0, 6), :]
            rolled = pltpu.roll(two, -lane0, 2)
            return jnp.where(iota6 < LANE - lane0, rolled[0], rolled[1])

        a0 = starts_ref[x]
        a1 = starts_ref[x + 1]
        nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)

        def chunk_tests(k, acc):
            g0 = a0 + k * CHUNK
            alen = jnp.minimum(a1 - g0, CHUNK)
            if variant == "noaread":
                a6 = bufs[jax.lax.rem(x, 3), 0, pl.ds(0, 6), :]
            else:
                a6 = read_win(0, g0)
            if variant == "notrans":
                aT = jnp.broadcast_to(a6[0:1, :].reshape(LANE, 1),
                                      (LANE, 6)) * 1.0
            else:
                aT = jnp.swapaxes(a6, 0, 1)
            aT = jnp.where(sub_full < alen, aT, jnp.inf)
            axlo = aT[:CHUNK, 0:1]
            aylo = aT[:CHUNK, 1:2]
            azlo = aT[:CHUNK, 2:3]
            axhi = aT[:CHUNK, 3:4]
            ayhi = aT[:CHUNK, 4:5]
            azhi = aT[:CHUNK, 5:6]
            tbase = jnp.minimum(k, mc - 1) * 2

            for off, dx in enumerate(SLAB_OFFSETS):
                w0 = w0_ref[0, 0, tbase + off]
                wcap = wcap_ref[0, 0, tbase + off]
                if variant == "nobread":
                    b6 = a6
                else:
                    b6 = read_win(dx, w0)
                jrel = lane_i
                if variant == "tests0":
                    m = jrel < wcap
                else:
                    m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                    m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                    m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                    m &= jrel < wcap
                    if dx == 0:
                        m &= w0 + jrel > g0 + sub_c
                c = jnp.where(m, 1, 0)
                fold = c[0:8]
                for f in range(8, CHUNK, 8):
                    fold = fold + c[f:f + 8]
                acc = acc + fold
            return acc

        def g_body(g, acc):
            for t in range(unroll):
                acc = chunk_tests(g * unroll + t, acc)
            return acc

        acc = jax.lax.fori_loop(
            0, (nchunks + unroll - 1) // unroll, g_body,
            jnp.zeros((8, LANE), jnp.int32))
        cursor[0] = cursor[0] + jnp.sum(acc, dtype=jnp.int32)
        cursor_f[0] = cursor_f[0] + jnp.sum(
            acc.astype(jnp.float32), dtype=jnp.float32)

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]
            totf_ref[0] = cursor_f[0]

    return kernel


def run_variant(plan, variant):
    gx, mc, slab_rows = plan.gx, plan.mc, plan.slab_rows
    kernel = make_kernel(gx, mc, slab_rows, variant)
    wcap_c = jnp.minimum(plan.wcap, LANE)

    @jax.jit
    def call(stream, starts, slab_r0, w0, wcap):
        out, outf = pl.pallas_call(
            kernel,
            grid=(gx,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, mc * 2), lambda s: (s, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, mc * 2), lambda s: (s, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                       jax.ShapeDtypeStruct((1,), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((3, slab_rows, 8, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),
            ],
        )(starts, slab_r0, w0.reshape(gx, 1, mc * 2),
          wcap.reshape(gx, 1, mc * 2), stream)
        return out[0], outf[0]

    eps = jnp.float32(1e-7)

    def step(s):
        st = plan.stream.at[0, 0, 0].add(s * 0)
        c, cf = call(st + s * jnp.float32(1e-12), plan.starts,
                     plan.slab_r0, plan.w0, wcap_c)
        return c.astype(jnp.float32) * eps

    return chain_time(step)


def main():
    n = 1_000_000
    variants = sys.argv[1:] or [
        "full", "notrans", "noroll", "nobread", "noaread", "tests0"]
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    gx, col_cap, slab_rows = default_slab_config(n)
    plan = plan_slabs(coords, radii, gx, col_cap, slab_rows)
    print("backend:", jax.devices()[0].platform, "gx:", gx, flush=True)
    out = {}
    for v in variants:
        ms = run_variant(plan, v)
        out[v] = round(ms, 3)
        print(f"{v}: {ms:.3f} ms", flush=True)
    print("ROW " + json.dumps({"name": "strip-1M", **out}), flush=True)


if __name__ == "__main__":
    main()
