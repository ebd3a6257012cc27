"""Isolate the column-sweep kernel's cost drivers on the TPU.

Variants (flags): roll vs raw two-row reads, acc carry width, tests on/off.
"""

import time
from functools import partial

import numpy as np


def make_kernel(gxy, mc, slab_rows, use_roll, acc8, do_tests, six_only,
                static_rpw=0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from collision_tpu.columns import CHUNK, COLUMN_OFFSETS, LANE

    def kernel(starts_ref, r0_ref, w0_ref, wcap_ref, stream_ref,
               total_ref, bufs, sems, cursor):
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

        @pl.when(x + 2 <= gxy)
        def _prefetch():
            start_slab(x + 2, (x + 2) % 3)

        @pl.when(x == 0)
        def _init():
            cursor[0] = 0

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        sub_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sub_full = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
        nrows_comp = 6 if six_only else 8

        def read_aligned(dx, g):
            lrow = g // LANE
            lane0 = g % LANE
            slot = jax.lax.rem(x + dx, 3)
            two = bufs[slot, pl.ds(lrow - r0_ref[x + dx], 2),
                       pl.ds(0, nrows_comp), :]
            rolled = pltpu.roll(two, -lane0, 2)
            merged = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (nrows_comp, LANE), 1)
                < LANE - lane0,
                rolled[0], rolled[1])
            return merged

        def read_raw(dx, lrow):
            slot = jax.lax.rem(x + dx, 3)
            l = jnp.clip(lrow - r0_ref[x + dx], 0, slab_rows - 1)
            return bufs[slot, l, pl.ds(0, nrows_comp), :]

        ACC = 8 if acc8 else CHUNK

        def y_body(y, acc):
            col = x * gxy + y
            a0 = starts_ref[col]
            a1 = starts_ref[col + 1]
            nchunks = jnp.minimum((a1 - a0 + CHUNK - 1) // CHUNK, mc)

            def k_body(k, acc):
                g0 = a0 + k * CHUNK
                alen = jnp.minimum(a1 - g0, CHUNK)
                a8 = read_aligned(0, g0)
                aT = jnp.swapaxes(a8, 0, 1)
                aT = jnp.where(sub_full < alen, aT, jnp.inf)
                axlo = aT[:CHUNK, 0:1]
                aylo = aT[:CHUNK, 1:2]
                azlo = aT[:CHUNK, 2:3]
                axhi = aT[:CHUNK, 3:4]
                ayhi = aT[:CHUNK, 4:5]
                azhi = aT[:CHUNK, 5:6]
                tbase = (y * mc + k) * 5

                def tests(b8, lanemask, jglob, off):
                    if not do_tests:
                        return (axhi > b8[0:1, :]) & lanemask
                    m = (axhi > b8[0:1, :]) & (axlo < b8[3:4, :])
                    m &= (ayhi > b8[1:2, :]) & (aylo < b8[4:5, :])
                    m &= (azhi > b8[2:3, :]) & (azlo < b8[5:6, :])
                    m &= lanemask
                    if off == 0:
                        m &= jglob > g0 + sub_c
                    return m

                def add(acc, m):
                    c = jnp.where(m, 1, 0)
                    if acc8:
                        r = c[0:8] + c[8:16] + c[16:24] + c[24:32] \
                            + c[32:40] + c[40:48] + c[48:56] + c[56:64]
                        return acc + r
                    return acc + c

                for off, (dx, dy) in enumerate(COLUMN_OFFSETS):
                    w0 = w0_ref[0, 0, tbase + off]
                    wcap = wcap_ref[0, 0, tbase + off]
                    if static_rpw:
                        row_lo = w0 // LANE
                        for r in range(static_rpw):
                            lrow = row_lo + r
                            b8 = read_raw(dx, lrow)
                            jglob = lrow * LANE + lane_i
                            lanemask = (jglob >= w0) & (jglob < w0 + wcap)
                            m = tests(b8, lanemask, jglob, off)
                            acc = add(acc, m)
                        continue
                    if use_roll:
                        nrows = (wcap + LANE - 1) // LANE

                        def r_body(i, acc, w0=w0, wcap=wcap, dx=dx, off=off):
                            b8 = read_aligned(dx, w0 + i * LANE)
                            lanemask = lane_i < wcap - i * LANE
                            jglob = w0 + i * LANE + lane_i
                            m = tests(b8, lanemask, jglob, off)
                            return add(acc, m)

                        acc = jax.lax.fori_loop(0, nrows, r_body, acc)
                    else:
                        row_lo = w0 // LANE
                        nrows = (w0 + wcap + LANE - 1) // LANE - row_lo

                        def r_body(i, acc, w0=w0, wcap=wcap, dx=dx,
                                   off=off, row_lo=row_lo):
                            lrow = row_lo + i
                            b8 = read_raw(dx, lrow)
                            jglob = lrow * LANE + lane_i
                            lanemask = (jglob >= w0) & (jglob < w0 + wcap)
                            m = tests(b8, lanemask, jglob, off)
                            return add(acc, m)

                        acc = jax.lax.fori_loop(0, nrows, r_body, acc)
                return acc

            return jax.lax.fori_loop(0, nchunks, k_body, acc)

        acc = jax.lax.fori_loop(
            0, gxy, y_body, jnp.zeros((ACC, LANE), jnp.int32))
        cursor[0] = cursor[0] + jnp.sum(acc)

        @pl.when(x == pl.num_programs(0) - 1)
        def _finish():
            total_ref[0] = cursor[0]

    return kernel


def run_variant(plan, gxy, mc, slab_rows, **flags):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from collision_tpu.columns import LANE

    K = gxy * mc * 5
    kernel = make_kernel(gxy, mc, slab_rows, **flags)

    @jax.jit
    def go(stream, starts, slab_r0, w0, wcap):
        out = pl.pallas_call(
            kernel,
            grid=(gxy,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, K), lambda s: (s, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, K), lambda s: (s, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((3, slab_rows, 8, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )(starts, slab_r0, w0.reshape(gxy, 1, K),
          wcap.reshape(gxy, 1, K), stream)
        return out[0]

    return go


def chain_time(step, carry0, rounds=8):
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def chain(carry, k):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)

    def run(k):
        np.asarray(jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1])
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(
                jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best

    t1 = run(1)
    t2 = run(rounds + 1)
    return max((t2 - t1) / rounds * 1e3, 1e-6)


def main():
    import jax
    import jax.numpy as jnp
    from collision_tpu.columns import (plan_columns, default_column_config)

    n = 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(rng.uniform(0, 1 / n ** 0.5, n).astype("float32"))
    gxy, ccap, srows = default_column_config(n)
    mc = -(-ccap // 64)
    plan = plan_columns(coords, radii, gxy, ccap, srows)
    stream, starts, r0, w0, wcap = (plan.stream, plan.starts, plan.slab_r0,
                                    plan.w0, plan.wcap)
    want = None
    variants = [
        ("baseline roll+acc64", dict(use_roll=True, acc8=False,
                                     do_tests=True, six_only=False)),
        ("raw rows, acc64", dict(use_roll=False, acc8=False,
                                 do_tests=True, six_only=False)),
        ("roll, acc8", dict(use_roll=True, acc8=True,
                            do_tests=True, six_only=False)),
        ("raw rows, acc8", dict(use_roll=False, acc8=True,
                                do_tests=True, six_only=False)),
        ("raw rows, acc8, 6comp", dict(use_roll=False, acc8=True,
                                       do_tests=True, six_only=True)),
        ("static rpw=2, acc8", dict(use_roll=False, acc8=True,
                                    do_tests=True, six_only=True,
                                    static_rpw=2)),
        ("static rpw=2 unroll-k", dict(use_roll=False, acc8=True,
                                       do_tests=True, six_only=True,
                                       static_rpw=2)),
    ]
    import sys
    sel = [int(a) for a in sys.argv[1:]] or list(range(len(variants)))
    want = 5940
    for vi in sel:
        name, flags = variants[vi]
        go = run_variant(plan, gxy, mc, srows, **flags)
        total = int(go(stream, starts, r0, w0, wcap))
        if want is None:
            want = total
        def step(c, go=go):
            t = go(stream, starts, r0, w0, wcap)
            return c + (t % 2).astype(jnp.float32) * 1e-12
        ms = chain_time(step, stream)
        print("%-28s %8.2f ms  count=%d %s"
              % (name, ms, total, "OK" if total == want else "BAD"),
              flush=True)


if __name__ == "__main__":
    main()
