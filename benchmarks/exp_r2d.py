"""Round-2 probes with proper chained on-device timing.

E4'  per-step overhead of a trivial 576-step sweep (1 lane-column DMA).
E4'' same with 9 column DMAs + center.
E3'  [128,128] in-kernel transpose throughput.
E6   in-kernel manual async DMA from HBM at dynamic sublane offset.
"""

import time
from functools import partial

import numpy as np


def chain_time(step, carry0, rounds=8, repeats=3, label=""):
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def chain(carry, k):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)

    def run(k):
        np.asarray(jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1])
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(
                jax.tree_util.tree_leaves(chain(carry0, k))[0].ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best

    t1 = run(1)
    t2 = run(rounds + 1)
    ms = max((t2 - t1) / rounds * 1e3, 1e-6)
    print("%-44s %8.3f ms" % (label, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.devices()[0].platform, flush=True)

    grid_dim, M = 24, 120
    Gp = grid_dim + 2
    bins_lane = jnp.asarray(
        np.random.rand(Gp, Gp, Gp, 8, M).astype(np.float32))
    bins = jnp.swapaxes(bins_lane, -1, -2)

    def col_spec(dx, dy):
        return pl.BlockSpec(
            (1, 1, Gp, 8, M),
            lambda s, dx=dx, dy=dy: (s // grid_dim + dx, s % grid_dim + dy,
                                     0, 0, 0),
            memory_space=pltpu.VMEM)

    def center_spec():
        return pl.BlockSpec(
            (1, 1, Gp, M, 8),
            lambda s: (s // grid_dim + 1, s % grid_dim + 1, 0, 0, 0),
            memory_space=pltpu.VMEM)

    # --- E4': trivial sweep, 1 column ---
    def triv3_kernel(c_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[0] = 0
        o_ref[0] = o_ref[0] + jnp.sum(c_ref[0, 0, 0] > 0.5, dtype=jnp.int32)

    def one_col(b):
        t = pl.pallas_call(
            triv3_kernel,
            grid=(grid_dim * grid_dim,),
            in_specs=[col_spec(1, 1)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(b)
        return b + (t[0] % 2).astype(jnp.float32) * 1e-12

    chain_time(one_col, bins_lane, label="E4' trivial sweep 576 steps, 1 col")

    # --- E4'': 9 cols + center ---
    def triv_kernel(*refs):
        o_ref = refs[10]
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[0] = 0
        o_ref[0] = o_ref[0] + jnp.sum(refs[1][0, 0, 0] > 0.5,
                                      dtype=jnp.int32)

    def ten_inputs(b):
        bl = jnp.swapaxes(b, -1, -2)
        t = pl.pallas_call(
            triv_kernel,
            grid=(grid_dim * grid_dim,),
            in_specs=[center_spec()] + [
                col_spec(dx, dy) for dx in (0, 1, 2) for dy in (0, 1, 2)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(b, *([bl] * 9))
        return b + (t[0] % 2).astype(jnp.float32) * 1e-12

    chain_time(ten_inputs, bins,
               label="E4'' trivial sweep, center+9 cols (+transp)")

    # --- E3': transpose throughput ---
    x2 = jnp.asarray(np.random.rand(128, 128).astype(np.float32))

    def many_tr_kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + jnp.swapaxes(x_ref[:], 0, 1) * (1.0 + i)
        o_ref[:] = jax.lax.fori_loop(
            0, 1000, body, jnp.zeros((128, 128), jnp.float32))

    def tr_step(x):
        o = pl.pallas_call(
            many_tr_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return x + o[:1, :1] * 1e-20

    ms = chain_time(tr_step, x2, label="E3' 1000x transpose [128,128]")
    print("   -> %.2f us per transpose" % (ms,), flush=True)

    # --- E6: manual DMA from HBM at dynamic sublane offset ---
    n_rows = 8192
    planes = jnp.asarray(np.random.rand(n_rows, 128).astype(np.float32))

    def dma_kernel(off_ref, hbm_ref, o_ref, scratch, sem):
        def body(i, acc):
            w0 = off_ref[i]
            cp = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(w0, 8), :], scratch, sem)
            cp.start()
            cp.wait()
            return acc + jnp.sum(scratch[...])
        acc = jax.lax.fori_loop(0, 64, body, jnp.float32(0.0))
        o_ref[0] = acc

    offs = jnp.asarray(
        np.random.randint(0, n_rows - 8, 64).astype(np.int32))

    def dma_step(p):
        o = pl.pallas_call(
            dma_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(offs, p)
        return p + o[0] * 1e-20

    try:
        ms = chain_time(dma_step, planes,
                        label="E6 64x dynamic HBM->VMEM DMA [8,128]")
        print("   -> %.2f us per dynamic DMA" % (ms * 1000 / 64,), flush=True)
    except Exception as e:
        print("E6 FAILED:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
