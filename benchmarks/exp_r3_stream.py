"""Round-3: the stream-tensor interleave cost (plan's last ~1.1 ms).

The slab/column plans build a [Rp, 8, 128] stream from 8 sorted f32
component arrays via stack -> reshape -> transpose(1,0,2); exp_r3_plan3
infers ~1.1 ms at 1M (64 MB r+w => 7x off bandwidth). Variants:

  v0  current: pad + stack [8, npad] + reshape + transpose(1,0,2)
  v1  stack(axis=1) of [Rp, 128] pieces
  v2  zeros[Rp,8,128].at[:, c, :].set(piece) x8
  v3  Pallas: component-major [8, Rp, 128] concat (contiguous) +
      in-kernel swapaxes per row block
  v4  Pallas: 8 separate [B,128] input refs, 8 strided sublane stores

Every probe returns a *data-dependent dynamic* element of the result so
XLA cannot slice the graph down to one lane.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_stream.py [n]
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
BLK = 256  # rows per Pallas block


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

    def probe(stream, s):
        # dynamic, data-dependent index -> no static slicing
        di = jnp.clip(s.astype(jnp.int32), 0, 7)
        return stream.reshape(-1)[di].astype(jnp.float32) * eps

    rows = []

    def rec(name, ms):
        print("{}: {:.3f} ms".format(name, ms), flush=True)
        rows.append((name, ms))

    def padto(v, fill=jnp.inf):
        return jnp.full((npad,), fill, jnp.float32).at[:v.shape[0]].set(v)

    def v0(s):
        cs = [padto(c + s * eps) for c in comps]
        stacked = jnp.stack(cs)  # [8, npad]
        stream = jnp.transpose(stacked.reshape(8, Rp, LANE), (1, 0, 2))
        return probe(stream, s)
    rec("v0_transpose", chain_time(v0))

    def v1(s):
        cs = [padto(c + s * eps).reshape(Rp, LANE) for c in comps]
        stream = jnp.stack(cs, axis=1)  # [Rp, 8, 128]
        return probe(stream, s)
    rec("v1_stack_axis1", chain_time(v1))

    def v2(s):
        out = jnp.full((Rp, 8, LANE), jnp.inf, jnp.float32)
        for c_i, c in enumerate(comps):
            out = out.at[:, c_i, :].set(
                padto(c + s * eps).reshape(Rp, LANE))
        return probe(out, s)
    rec("v2_at_set", chain_time(v2))

    def _interleave_kernel(in_ref, out_ref):
        out_ref[:] = jnp.swapaxes(in_ref[:], 0, 1)

    def v3(s):
        cs = [padto(c + s * eps) for c in comps]
        stacked = jnp.stack(cs).reshape(8, Rp, LANE)
        stream = pl.pallas_call(
            _interleave_kernel,
            grid=(Rp // BLK,),
            in_specs=[pl.BlockSpec((8, BLK, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, 8, LANE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rp, 8, LANE), jnp.float32),
        )(stacked)
        return probe(stream, s)
    rec("v3_pallas_swap", chain_time(v3))

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
        return probe(stream, s)
    rec("v4_pallas_8ref", chain_time(v4))

    # sanity: all variants agree on the probed element
    s0 = jnp.float32(3)
    vals = [float(jax.jit(f)(s0)) for f in (v0, v1, v2, v3, v4)]
    if len({repr(v) for v in vals}) != 1:
        print("MISMATCH", vals, flush=True)

    print("ROW " + json.dumps({
        "name": "stream-interleave-n{}".format(n),
        **{k: v for k, v in rows}}), flush=True)


if __name__ == "__main__":
    main()
