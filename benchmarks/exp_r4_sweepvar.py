"""Round-4: dual-sweep kernel variants for the a-side machinery.

The A/B split (results_v5e_round4.jsonl, /tmp/dual_ab.py) pins the 1M
count step at plan 3.2 + Pallas dual sweep 5.6 + residual 1.0 ms — the
sweep's ~717 ns/chunk-pair is the headline's remaining fat, and the
strip microbench blames the [6,128]->[128,6] transpose + rolled read.
This measures sweep-only times for:

  v1  baseline: chunk pairs, [6,128] transpose per pair
  v3  a8: transpose the full aligned [8,128] read (tile-shaped for the
      (8,128) sublane/lane transpose) and slice components after
  v2  quad: FOUR chunks per a-read ([6,256] -> [256,6] transpose,
      3-row roll-merge) — halves per-pair machinery again
  v6  unroll=2 chunk pairs per loop iteration (baseline shape)

Usage: PYTHONPATH=... python -u benchmarks/exp_r4_sweepvar.py
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collision_tpu.columns import CHUNK, LANE
from collision_tpu.slabs import SLAB_OFFSETS, default_slab_config, \
    plan_slabs


def make_kernel(gx, mc, slab_rows, variant, unroll=1):
    quad = variant == "quad"
    a8 = variant == "a8"
    AW = 4 * CHUNK if quad else 2 * CHUNK   # chunks covered per a-read

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
        iota6 = jax.lax.broadcasted_iota(jnp.int32, (6, LANE), 1)
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
        aw_full = jax.lax.broadcasted_iota(jnp.int32, (AW, 1), 0)

        def read_win(dx, g, rows=2, comps=6):
            lrow = g // LANE
            lane0 = g % LANE
            slot = jax.lax.rem(x + dx, 3)
            lr = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - rows)
            two = bufs[slot, pl.ds(lr, rows), pl.ds(0, comps), :]
            rolled = pltpu.roll(two, -lane0, 2)
            it = iota8 if comps == 8 else iota6
            if rows == 2:
                return jnp.where(it < LANE - lane0, rolled[0], rolled[1])
            mid = jnp.where(it < LANE - lane0, rolled[1], rolled[2])
            first = jnp.where(it < LANE - lane0, rolled[0], rolled[1])
            return jnp.concatenate([first, mid], axis=1)  # [comps, 256]

        a0 = starts_ref[x]
        a1 = starts_ref[x + 1]
        nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)
        ngroups = (nchunks + AW // CHUNK - 1) // (AW // CHUNK)

        def group_tests(kk, acc):
            g0 = a0 + kk * AW
            alen = jnp.minimum(a1 - g0, AW)
            if quad:
                a6 = read_win(0, g0, rows=3)            # [6, 256]
                aT = jnp.swapaxes(a6, 0, 1)             # [256, 6]
            elif a8:
                a6 = read_win(0, g0, comps=8)           # [8, 128]
                aT = jnp.swapaxes(a6, 0, 1)             # [128, 8]
            else:
                a6 = read_win(0, g0)                    # [6, 128]
                aT = jnp.swapaxes(a6, 0, 1)
            aT = jnp.where(aw_full < alen, aT[:, :6], jnp.inf)

            for sub in range(AW // CHUNK):
                k = kk * (AW // CHUNK) + sub
                g0s = g0 + sub * CHUNK
                s0 = sub * CHUNK
                axlo = aT[s0:s0 + CHUNK, 0:1]
                aylo = aT[s0:s0 + CHUNK, 1:2]
                azlo = aT[s0:s0 + CHUNK, 2:3]
                axhi = aT[s0:s0 + CHUNK, 3:4]
                ayhi = aT[s0:s0 + CHUNK, 4:5]
                azhi = aT[s0:s0 + CHUNK, 5:6]
                tbase = jnp.minimum(k, mc - 1) * 2

                for off, dx in enumerate(SLAB_OFFSETS):
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]
                    b6 = read_win(dx, w0)
                    m = (axhi > b6[0:1, :]) & (axlo < b6[3:4, :])
                    m &= (ayhi > b6[1:2, :]) & (aylo < b6[4:5, :])
                    m &= (azhi > b6[2:3, :]) & (azlo < b6[5:6, :])
                    m &= lane_i < wcap
                    if dx == 0:
                        m &= w0 + lane_i > g0s + sub_c
                    c = jnp.where(m, 1, 0)
                    fold = c[0:8]
                    for f in range(8, CHUNK, 8):
                        fold = fold + c[f:f + 8]
                    acc = acc + fold
            return acc

        if unroll == 1:
            acc = jax.lax.fori_loop(
                0, ngroups, group_tests, jnp.zeros((8, LANE), jnp.int32))
        else:
            def g_body(g, acc):
                for t in range(unroll):
                    acc = group_tests(g * unroll + t, acc)
                return acc
            acc = jax.lax.fori_loop(
                0, (ngroups + unroll - 1) // unroll, g_body,
                jnp.zeros((8, LANE), jnp.int32))
        cursor[0] = cursor[0] + jnp.sum(acc, dtype=jnp.int32)
        cursor_f[0] = cursor_f[0] + jnp.sum(
            acc.astype(jnp.float32), dtype=jnp.float32)

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]
            totf_ref[0] = cursor_f[0]

    return kernel


@partial(jax.jit, static_argnames=("gx", "mc", "slab_rows", "variant",
                                   "unroll"))
def count_variant(stream, starts, slab_r0, w0_tab, wcap_tab,
                  gx, mc, slab_rows, variant, unroll=1):
    kernel = make_kernel(gx, mc, slab_rows, variant, unroll)
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
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((3, slab_rows, 8, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
        ],
    )(starts, slab_r0, w0_tab.reshape(gx, 1, mc * 2),
      wcap_tab.reshape(gx, 1, mc * 2), stream)
    return out[0], outf[0]


def main():
    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    gx, cc, sr = default_slab_config(n)
    print("backend:", jax.devices()[0].platform, "gx:", gx, flush=True)
    plan = plan_slabs(coords, radii, gx, cc, sr)
    wclamp = jnp.minimum(plan.wcap, LANE)
    eps = jnp.float32(1e-9)

    def chain_time(make_step, k=8, repeats=3):
        @partial(jax.jit, static_argnames=("kk",))
        def chain(seed, kk):
            return jax.lax.fori_loop(0, kk, lambda _, s: make_step(s),
                                     seed)

        def run(kk):
            np.asarray(chain(jnp.float32(0), kk))
            best = float("inf")
            for _ in range(repeats):
                t = time.perf_counter()
                np.asarray(chain(jnp.float32(0), kk))
                best = min(best, time.perf_counter() - t)
            return best
        return max((run(k + 1) - run(1)) / k * 1e3, 0.0)

    # Exactness cross-check between variants (clamped-window counts).
    ref = None
    out = {"name": "r4-sweepvar-1M", "gx": gx}
    for variant, unroll in (("pair", 1), ("a8", 1), ("quad", 1),
                            ("pair", 2), ("quad", 2)):
        c, cf = count_variant(
            plan.stream, plan.starts, plan.slab_r0, plan.w0, wclamp,
            gx, plan.mc, plan.slab_rows, variant, unroll)
        c = int(c)
        if ref is None:
            ref = c
        st = jnp.float32(1e-12)

        def step(s, variant=variant, unroll=unroll):
            cc_, cf_ = count_variant(
                plan.stream + s * st, plan.starts, plan.slab_r0,
                plan.w0, wclamp, gx, plan.mc, plan.slab_rows, variant,
                unroll)
            return cc_.astype(jnp.float32) * eps
        ms = round(chain_time(step), 3)
        key = "{}_u{}".format(variant, unroll)
        out[key] = ms
        print(key, ms, "ms count", c, "match", c == ref, flush=True)
    print("ROW " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
