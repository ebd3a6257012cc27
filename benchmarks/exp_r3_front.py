"""Round-3: the slab plan's FRONT END (bounds + keys) cost.

exp_r3_stream2 proved the stream interleave is fused and free; the
plan's unaccounted ~1.2 ms (full 3.75 - sort 1.43 - build 1.08) must be
the front end: min/max bounds along axis 0 of the thin [n, 3] coords
(3/128 lane utilization) plus strided column slices feeding keys/sort.

  v0      current: jnp.min/max(coords, axis=0), jnp.max(radii), keys
  v_lane  [n,4] concat -> flat -> [n/32, 128] reshape: components land
          on period-4 lanes, so min/max over axis 0 runs at full
          bandwidth; per-component values fold from the [128] row.
  split   cost of materializing x/y/z as dense [n] arrays (consumed by
          a Pallas sum so the strided reads can't fuse away)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_front.py [n]
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

from collision_tpu.slabs import _xbits_z, default_slab_config, slab_sort_keys

LANE = 128


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


def _sum_kernel(a_ref, b_ref, c_ref, out_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc[0, 0] = jnp.float32(0)
    acc[0, 0] = acc[0, 0] + jnp.sum(a_ref[:]) + jnp.sum(b_ref[:]) \
        + jnp.sum(c_ref[:])

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _fin():
        out_ref[0, 0] = acc[0, 0]


def consume3(x, y, z, rows):
    m = x.shape[0] // LANE
    xs = [v.reshape(m, LANE) for v in (x, y, z)]
    return pl.pallas_call(
        _sum_kernel,
        grid=(m // rows,),
        in_specs=[pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(*xs)[0, 0]


def lane_bounds(coords, radii):
    """(lo[3], hi[3], r_max) via a full-bandwidth lane-major reduce."""
    n = coords.shape[0]
    c4 = jnp.concatenate([coords, radii[:, None]], axis=1)  # [n, 4]
    m = -(-(4 * n) // (32 * LANE)) * (32 * LANE)
    flat = c4.reshape(-1)
    # pad with replicas of the last row so reductions are unaffected
    reps = (m - 4 * n) // 4
    if reps:
        flat = jnp.concatenate([flat, jnp.tile(c4[-1], (reps,))])
    grid2 = flat.reshape(-1, LANE)
    lo128 = jnp.min(grid2, axis=0)          # [128]
    hi128 = jnp.max(grid2, axis=0)
    lo4 = jnp.min(lo128.reshape(32, 4), axis=0)   # [4]
    hi4 = jnp.max(hi128.reshape(32, 4), axis=0)
    return lo4[:3], hi4[:3], hi4[3]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    gx = default_slab_config(n)[0]
    print("backend:", jax.devices()[0].platform, "n:", n, "gx:", gx,
          flush=True)
    eps = jnp.float32(1e-12)

    rows = []

    def rec(name, ms):
        print("{}: {:.3f} ms".format(name, ms), flush=True)
        rows.append((name, ms))

    # v0: current front end (bounds + keys), forced through the key sum
    # (keys depend on lo/ext/r_max, and jnp.sum over [n] cannot slice)
    def v0(s):
        c = coords + s * eps
        lo_s = jnp.min(c, axis=0)
        hi_s = jnp.max(c, axis=0)
        r_max = jnp.max(radii)
        key, _ = slab_sort_keys(c, radii, gx, lo_s, hi_s - lo_s, r_max)
        return jnp.sum(key, dtype=jnp.uint32).astype(jnp.float32) * eps
    rec("v0_front", chain_time(v0))

    # bounds only
    def v0b(s):
        c = coords + s * eps
        lo_s = jnp.min(c, axis=0)
        hi_s = jnp.max(c, axis=0)
        r_max = jnp.max(radii)
        return (jnp.sum(lo_s) + jnp.sum(hi_s) + r_max) * eps
    rec("v0_bounds", chain_time(v0b))

    # lane-major bounds
    def v1b(s):
        c = coords + s * eps
        lo_s, hi_s, r_max = lane_bounds(c, radii)
        return (jnp.sum(lo_s) + jnp.sum(hi_s) + r_max) * eps
    rec("lane_bounds", chain_time(v1b))

    # v1: lane bounds + keys
    def v1(s):
        c = coords + s * eps
        lo_s, hi_s, r_max = lane_bounds(c, radii)
        key, _ = slab_sort_keys(c, radii, gx, lo_s, hi_s - lo_s, r_max)
        return jnp.sum(key, dtype=jnp.uint32).astype(jnp.float32) * eps
    rec("v1_front", chain_time(v1))

    # column split cost (forced via Pallas consumer)
    def vsplit(s):
        c = coords + s * eps
        npad = -(-n // LANE) * LANE
        def padz(v):
            return jnp.zeros((npad,), jnp.float32).at[:n].set(v)
        return consume3(padz(c[:, 0]), padz(c[:, 1]), padz(c[:, 2]),
                        256) * eps
    rec("split3", chain_time(vsplit))

    # sanity: lane bounds == axis bounds
    lo0 = np.asarray(jnp.min(coords, axis=0))
    hi0 = np.asarray(jnp.max(coords, axis=0))
    lo1, hi1, rm1 = jax.jit(lane_bounds)(coords, radii)
    assert np.array_equal(lo0, np.asarray(lo1)), (lo0, lo1)
    assert np.array_equal(hi0, np.asarray(hi1)), (hi0, hi1)
    assert float(rm1) == float(jnp.max(radii))
    print("lane_bounds exact: OK", flush=True)

    print("ROW " + json.dumps({
        "name": "front-n{}".format(n),
        **{k: v for k, v in rows}}), flush=True)


if __name__ == "__main__":
    main()
