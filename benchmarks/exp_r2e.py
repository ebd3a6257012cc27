"""Column-engine capability probes.

E7  pltpu.roll with dynamic shift on lanes.
E8  manual double-buffered dynamic HBM reads at column-sweep shape:
    576 steps x 5 dynamic [Pmax, 8, 128] DMAs + realistic compute.
E9  [Pmax, 128] -> [128, Pmax] transpose with Pmax not a lane multiple.
E10 in-kernel jnp.dot (MXU) for one-hot pair packing.
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
    print("%-52s %8.3f ms" % (label, ms), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.devices()[0].platform, flush=True)

    # --- E7: dynamic roll ---
    def roll_kernel(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0], 1)

    x = jnp.asarray(np.arange(2 * 128, dtype=np.float32).reshape(2, 128))
    try:
        out = pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray([37], jnp.int32), x)
        ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), -37, 1))
        print("E7 dynamic lane roll: ok =", ok, flush=True)
    except Exception as e:
        print("E7 FAILED:", str(e)[:300], flush=True)

    # --- E9: transpose [24,128] -> [128,24] ---
    def tr_kernel(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    x9 = jnp.asarray(np.random.rand(24, 128).astype(np.float32))
    try:
        out = pl.pallas_call(
            tr_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 24), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x9)
        ok = np.array_equal(np.asarray(out), np.asarray(x9).T)
        print("E9 transpose [24,128]->[128,24]: ok =", ok, flush=True)
    except Exception as e:
        print("E9 FAILED:", str(e)[:300], flush=True)

    # --- E10: in-kernel one-hot matmul (pair packing) ---
    def pack_kernel(x_ref, m_ref, o_ref):
        mask = m_ref[:]  # [8,128] 0/1 float
        rank = jnp.cumsum(mask, axis=1) - mask  # rank among set lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        # perm[l, r] (for row 0): scatter set lanes to prefix ranks
        row_mask = mask[0:1, :]
        row_rank = rank[0:1, :].astype(jnp.int32)
        perm = ((row_rank == lane[:, :1].T * 0 + lane[0:1, :].T)
                .astype(jnp.float32))  # placeholder shape check
        # simpler: build [128,128] perm via broadcast compare
        rank_col = jnp.swapaxes(row_rank, 0, 1)  # [128,1]
        mask_col = jnp.swapaxes(row_mask, 0, 1)  # [128,1]
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        P = ((rank_col == lane_row) & (mask_col > 0)).astype(jnp.float32)
        packed = jnp.dot(x_ref[0:1, :], P,
                         preferred_element_type=jnp.float32)
        o_ref[:] = packed

    xv = jnp.asarray(np.arange(128, dtype=np.float32).reshape(1, 128))
    mv = np.zeros((8, 128), np.float32)
    hits = np.sort(np.random.RandomState(0).choice(128, 17, replace=False))
    mv[0, hits] = 1
    try:
        out = pl.pallas_call(
            pack_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xv, jnp.asarray(mv))
        got = np.asarray(out)[0, :17]
        ok = np.array_equal(got, hits.astype(np.float32))
        print("E10 one-hot MXU packing: ok =", ok, flush=True)
        if not ok:
            print("   got", got[:8], "want", hits[:8], flush=True)
    except Exception as e:
        print("E10 FAILED:", str(e)[:300], flush=True)

    # --- E8: double-buffered dynamic HBM reads at sweep shape ---
    R = 8192
    Pmax = 17
    stream = jnp.asarray(np.random.rand(R, 8, 128).astype(np.float32))
    n_steps = 576
    r0s = jnp.asarray(
        np.random.randint(0, R - Pmax, (n_steps, 5)).astype(np.int32))

    def sweep_kernel(r0_ref, hbm_ref, o_ref, buf, sem):
        # buf: [2, 5, Pmax, 8, 128]; double-buffered across steps.
        step = pl.program_id(0)
        slot = step % 2
        nxt = (step + 1) % 2

        @pl.when(step == 0)
        def _():
            o_ref[0] = 0
            for c in range(5):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(r0_ref[0 * 5 + c], Pmax)],
                    buf.at[0, c], sem.at[0, c]).start()

        @pl.when(step + 1 < pl.num_programs(0))
        def _():
            for c in range(5):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(r0_ref[(step + 1) * 5 + c], Pmax)],
                    buf.at[nxt, c], sem.at[nxt, c]).start()

        for c in range(5):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(r0_ref[step * 5 + c], Pmax)],
                buf.at[slot, c], sem.at[slot, c]).wait()

        # ~15 us of fake compute: 3000 vreg ops
        def body(i, acc):
            return acc + jnp.sum(buf[slot, 0, 0, :, :] * (i + 1.0))
        acc = jax.lax.fori_loop(0, 350, body, jnp.float32(0))
        o_ref[0] = o_ref[0] + acc.astype(jnp.int32)

    def sweep(s):
        o = pl.pallas_call(
            sweep_kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2, 5, Pmax, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 5)),
            ],
        )(r0s.reshape(-1), s)
        return s + (o[0] % 2).astype(jnp.float32) * 1e-12

    try:
        ms = chain_time(sweep, stream,
                        label="E8 576 steps x 5 dyn DMAs + 15us compute")
        print("   -> %.1f us/step (compute-only would be ~15us)"
              % (ms * 1000 / n_steps), flush=True)
    except Exception as e:
        print("E8 FAILED:", str(e)[:400], flush=True)


if __name__ == "__main__":
    main()
