"""Round-2 Mosaic capability probes (run on the real TPU).

E3  in-kernel transpose: [8,128] -> [128,8] and [128,128] (a-side broadcast
    problem for sorted-stream tiles).
E4  per-grid-step overhead: trivial-compute kernel sweeping K steps with
    the same DMA shapes as the halo sweep.
E5  dynamic sublane slicing of a VMEM ref with an SMEM-scalar start.
"""

import time
from functools import partial

import numpy as np


def timed(fn, *args, rounds=5):
    import jax
    r = jax.block_until_ready(fn(*args))
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(rounds):
        t = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[:1])
        best = min(best, time.perf_counter() - t)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.devices()[0].platform, flush=True)

    # --- E3: in-kernel transpose ---
    def tr_kernel(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    x = jnp.asarray(np.arange(8 * 128, dtype=np.float32).reshape(8, 128))
    try:
        out = pl.pallas_call(
            tr_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.array_equal(np.asarray(out), np.asarray(x).T)
        print("E3a transpose [8,128]->[128,8]: ok =", ok, flush=True)
    except Exception as e:
        print("E3a FAILED:", str(e)[:300], flush=True)

    x2 = jnp.asarray(np.random.rand(128, 128).astype(np.float32))
    try:
        out = pl.pallas_call(
            tr_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x2)
        ok = np.array_equal(np.asarray(out), np.asarray(x2).T)
        print("E3b transpose [128,128]: ok =", ok, flush=True)
    except Exception as e:
        print("E3b FAILED:", str(e)[:300], flush=True)

    # E3c: many transposes in a loop — throughput.
    def many_tr_kernel(x_ref, o_ref):
        def body(i, acc):
            t = jnp.swapaxes(x_ref[:], 0, 1)
            return acc + t * (1.0 + i)
        o_ref[:] = jax.lax.fori_loop(0, 1000, body,
                                     jnp.zeros((128, 128), jnp.float32))

    try:
        f = jax.jit(lambda x: pl.pallas_call(
            many_tr_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        ms = timed(f, x2)
        print("E3c 1000x transpose[128,128] loop: %.3f ms (%.1f us each)"
              % (ms, ms), flush=True)
    except Exception as e:
        print("E3c FAILED:", str(e)[:300], flush=True)

    # --- E5: dynamic sublane slice with SMEM scalar start ---
    def dyn_kernel(start_ref, x_ref, o_ref):
        s = start_ref[0]
        o_ref[:] = x_ref[pl.ds(s, 8), :]

    xbig = jnp.asarray(np.random.rand(512, 128).astype(np.float32))
    for s0, align in ((40, "8-aligned"), (13, "unaligned")):
        try:
            out = pl.pallas_call(
                dyn_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.asarray([s0], jnp.int32), xbig)
            ok = np.allclose(np.asarray(out), np.asarray(xbig)[s0:s0 + 8])
            print("E5 dynamic sublane slice (%s): ok = %s" % (align, ok),
                  flush=True)
        except Exception as e:
            print("E5 (%s) FAILED: %s" % (align, str(e)[:200]), flush=True)

    # --- E4: per-step overhead with halo-like DMA shapes ---
    # Same block shapes as the halo sweep (center + 9 lane columns) but a
    # trivial kernel body: measures pure step+DMA cost.
    grid_dim, M = 24, 120
    Gp = grid_dim + 2
    bins = jnp.asarray(
        np.random.rand(Gp, Gp, Gp, M, 8).astype(np.float32))
    bins_lane = jnp.swapaxes(bins, -1, -2)

    def triv_kernel(*refs):
        total_ref = refs[10]
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            total_ref[0] = 0
        total_ref[0] = total_ref[0] + jnp.sum(
            refs[1][0, 0, 0] > 0.5, dtype=jnp.int32)

    def center_spec():
        return pl.BlockSpec(
            (1, 1, Gp, M, 8),
            lambda s: (s // grid_dim + 1, s % grid_dim + 1, 0, 0, 0),
            memory_space=pltpu.VMEM)

    def col_spec(dx, dy):
        return pl.BlockSpec(
            (1, 1, Gp, 8, M),
            lambda s, dx=dx, dy=dy: (s // grid_dim + dx, s % grid_dim + dy,
                                     0, 0, 0),
            memory_space=pltpu.VMEM)

    def run_trivial(b, bl):
        return pl.pallas_call(
            triv_kernel,
            grid=(grid_dim * grid_dim,),
            in_specs=[center_spec()] + [col_spec(dx, dy)
                                        for dx in (0, 1, 2)
                                        for dy in (0, 1, 2)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(b, *([bl] * 9))

    f = jax.jit(run_trivial)
    ms = timed(f, bins, bins_lane)
    print("E4a trivial halo-shaped sweep (576 steps, center+9): %.2f ms "
          "(%.1f us/step)" % (ms, ms * 1000 / 576), flush=True)

    # Variant: drop the sublane-oriented center (the 1.6 MB padded DMA).
    def triv2_kernel(*refs):
        total_ref = refs[9]
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            total_ref[0] = 0
        total_ref[0] = total_ref[0] + jnp.sum(
            refs[0][0, 0, 0] > 0.5, dtype=jnp.int32)

    def run_trivial2(bl):
        return pl.pallas_call(
            triv2_kernel,
            grid=(grid_dim * grid_dim,),
            in_specs=[col_spec(dx, dy)
                      for dx in (0, 1, 2) for dy in (0, 1, 2)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(*([bins_lane] * 9))

    f2 = jax.jit(run_trivial2)
    ms = timed(f2, bins_lane)
    print("E4b trivial sweep, 9 lane cols only:  %.2f ms (%.1f us/step)"
          % (ms, ms * 1000 / 576), flush=True)

    # Variant: single input (1 lane column) per step.
    def triv3_kernel(c_ref, total_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            total_ref[0] = 0
        total_ref[0] = total_ref[0] + jnp.sum(
            c_ref[0, 0, 0] > 0.5, dtype=jnp.int32)

    def run_trivial3(bl):
        return pl.pallas_call(
            triv3_kernel,
            grid=(grid_dim * grid_dim,),
            in_specs=[col_spec(1, 1)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(bins_lane)

    f3 = jax.jit(run_trivial3)
    ms = timed(f3, bins_lane)
    print("E4c trivial sweep, 1 lane col:        %.2f ms (%.1f us/step)"
          % (ms, ms * 1000 / 576), flush=True)


if __name__ == "__main__":
    main()
