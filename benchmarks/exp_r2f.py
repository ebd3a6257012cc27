"""Final column-engine mechanics probes.

F_a  SMEM BlockSpec input with a per-step index map (window tables).
F_b  scalar read from a VMEM ref.
F_c  pltpu.roll under interpret mode (CPU test path).
F_d  dynamic trip-count fori_loop in-kernel.
F_f  dynamic-start major-dim slice of VMEM scratch.
F_g  [1,128] -> [128,1] transpose.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.devices()[0].platform, flush=True)

    # --- F_a: SMEM input block with index map ---
    def ka(tab_ref, o_ref):
        s = pl.program_id(0)
        o_ref[0] = tab_ref[0] + tab_ref[3]

    tab = jnp.asarray(np.arange(4 * 8, dtype=np.int32).reshape(4, 8))
    try:
        out = pl.pallas_call(
            ka,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 8), lambda s: (s, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(tab)
        print("F_a SMEM block input w/ index map: got", int(out[0]),
              "(want", int(tab[3, 0] + tab[3, 3]), ")", flush=True)
    except Exception as e:
        print("F_a FAILED:", str(e)[:250], flush=True)

    # --- F_b: scalar read from VMEM ---
    def kb(x_ref, o_ref):
        o_ref[0] = x_ref[3, 7].astype(jnp.int32)

    x = jnp.asarray(np.arange(8 * 128, dtype=np.float32).reshape(8, 128))
    try:
        out = pl.pallas_call(
            kb,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(x)
        print("F_b scalar read from VMEM: got", int(out[0]), "(want 391)",
              flush=True)
    except Exception as e:
        print("F_b FAILED:", str(e)[:250], flush=True)

    # --- F_c: pltpu.roll in interpret mode ---
    def kc(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0], 1)

    x2 = jnp.asarray(np.arange(2 * 128, dtype=np.float32).reshape(2, 128))
    try:
        out = pl.pallas_call(
            kc,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            interpret=True,
        )(jnp.asarray([37], jnp.int32), x2)
        ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x2), -37, 1))
        print("F_c pltpu.roll interpret mode: ok =", ok, flush=True)
    except Exception as e:
        print("F_c FAILED:", str(e)[:250], flush=True)

    # --- F_d: dynamic trip-count loop ---
    def kd(n_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + jnp.sum(x_ref[i])
        o_ref[0] = jax.lax.fori_loop(0, n_ref[0], body, jnp.float32(0.0)
                                     ).astype(jnp.int32)

    try:
        out = pl.pallas_call(
            kd,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(jnp.asarray([3], jnp.int32),
          jnp.ones((8, 128), jnp.float32))
        print("F_d dynamic trip-count loop: got", int(out[0]),
              "(want 384)", flush=True)
    except Exception as e:
        print("F_d FAILED:", str(e)[:250], flush=True)

    # --- F_f: dynamic major-dim slice of a VMEM ref ---
    def kf(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[pl.ds(s_ref[0], 2), 3, :]

    big = jnp.asarray(
        np.arange(64 * 8 * 128, dtype=np.float32).reshape(64, 8, 128))
    try:
        out = pl.pallas_call(
            kf,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
        )(jnp.asarray([17], jnp.int32), big)
        ok = np.array_equal(np.asarray(out), np.asarray(big)[17:19, 3, :])
        print("F_f dynamic major slice of VMEM: ok =", ok, flush=True)
    except Exception as e:
        print("F_f FAILED:", str(e)[:250], flush=True)

    # --- F_g: [1,128] -> [128,1] transpose ---
    def kg(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[0:1, :], 0, 1)

    try:
        out = pl.pallas_call(
            kg,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
        )(x)
        ok = np.array_equal(np.asarray(out)[:, 0], np.asarray(x)[0])
        print("F_g transpose [1,128]->[128,1]: ok =", ok, flush=True)
    except Exception as e:
        print("F_g FAILED:", str(e)[:250], flush=True)


if __name__ == "__main__":
    main()
