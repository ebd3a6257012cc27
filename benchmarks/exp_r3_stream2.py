"""Round-3: stream interleave cost measured against a Pallas consumer.

exp_r3_stream.py's dynamic-element probe let XLA slice through the
transpose (v0 measured 0.007 ms) — but in the real pipeline the stream
feeds pl.pallas_call, which forces materialization. Here every variant
is chained as  build(s) -> Pallas block-sum -> carry , so each pays its
true materialized-layout cost; a component-major null variant (no
interleave at all, free reshape) gives the floor, isolating the
interleave's marginal cost = variant - null.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_stream2.py [n]
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

LANE = 128
BLK = 256  # Rp rows per consumer/interleave block


def chain_time(make_step, k=8, repeats=3):
    @partial(jax.jit, static_argnames=("kk",))
    def chain(seed, kk):
        def body(_, s):
            return make_step(s)
        return jax.lax.fori_loop(0, kk, body, seed)

    def run(kk):
        np.asarray(chain(jnp.float32(0), kk))
        best = float("inf")
        for _ in range(repeats):
            t = time.perf_counter()
            np.asarray(chain(jnp.float32(0), kk))
            best = min(best, time.perf_counter() - t)
        return best

    return max((run(k + 1) - run(1)) / k * 1e3, 0.0)


def _sum_kernel(in_ref, out_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc[0, 0] = jnp.float32(0)

    x = in_ref[:].reshape(-1, LANE)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    acc[0, 0] = acc[0, 0] + jnp.sum(x)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _fin():
        out_ref[0, 0] = acc[0, 0]


def consume(stream, grid_rows):
    """Pallas block-sum along dim 0 — forces the input layout."""
    shape = stream.shape
    return pl.pallas_call(
        _sum_kernel,
        grid=(shape[0] // grid_rows,),
        in_specs=[pl.BlockSpec(
            (grid_rows,) + shape[1:], lambda i: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(stream)[0, 0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    slab_rows = 71
    R = -(-n // LANE)
    Rp = -(-(R + slab_rows + 2) // BLK) * BLK
    npad = Rp * LANE
    rng = np.random.RandomState(4)
    comps_np = rng.random((8, n)).astype("float32")
    comps = [jnp.asarray(comps_np[i]) for i in range(8)]
    print("backend:", jax.devices()[0].platform, "n:", n, "Rp:", Rp,
          flush=True)
    eps = jnp.float32(1e-12)

    rows = []

    def rec(name, ms):
        print("{}: {:.3f} ms".format(name, ms), flush=True)
        rows.append((name, ms))

    def padto(v, fill=jnp.inf):
        return jnp.full((npad,), fill, jnp.float32).at[:v.shape[0]].set(v)

    # null: component-major [8, Rp, 128] — reshape only, no interleave
    def vnull(s):
        cs = [padto(c + s * eps) for c in comps]
        stacked = jnp.stack(cs).reshape(8, Rp, LANE)
        return consume(stacked, 8) * eps
    rec("null_component_major", chain_time(vnull))

    def v0(s):
        cs = [padto(c + s * eps) for c in comps]
        stream = jnp.transpose(
            jnp.stack(cs).reshape(8, Rp, LANE), (1, 0, 2))
        return consume(stream, BLK) * eps
    rec("v0_transpose", chain_time(v0))

    def v1(s):
        cs = [padto(c + s * eps).reshape(Rp, LANE) for c in comps]
        stream = jnp.stack(cs, axis=1)
        return consume(stream, BLK) * eps
    rec("v1_stack_axis1", chain_time(v1))

    def _interleave8_kernel(*refs):
        out_ref = refs[-1]
        for c in range(8):
            out_ref[:, c, :] = refs[c][:]

    def v4(s):
        cs = [padto(c + s * eps).reshape(Rp, LANE) for c in comps]
        stream = pl.pallas_call(
            _interleave8_kernel,
            grid=(Rp // BLK,),
            in_specs=[pl.BlockSpec((BLK, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec((BLK, 8, LANE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rp, 8, LANE), jnp.float32),
        )(*cs)
        return consume(stream, BLK) * eps
    rec("v4_pallas_8ref", chain_time(v4))

    # sanity: identical sums
    s0 = jnp.float32(0)
    vals = [float(jax.jit(f)(s0)) for f in (vnull, v0, v1, v4)]
    if len({repr(v) for v in vals}) != 1:
        print("MISMATCH", vals, flush=True)

    print("ROW " + json.dumps({
        "name": "stream-interleave2-n{}".format(n),
        **{k: v for k, v in rows}}), flush=True)


if __name__ == "__main__":
    main()
