"""Round-3: plan-cost decomposition with REAL loop-carried dependence.

exp_r3_plan.py's ``s * 0`` chains let XLA hoist loop-invariant steps
(keys/sort6 measured 0.00 ms); here every step perturbs its input by the
carry and the carry is derived from the step's *output*, so nothing can
be hoisted or dead-code-eliminated.

Measures, at the headline shape (1M uniform):
  full     whole plan_slabs
  sort6    lax.sort (key, id, x, y, z, r)     — current plan sort
  sort2    lax.sort (key, id)
  sort1    lax.sort (key<<32 | pos) single u64
  sort4p   lax.sort (key, id, pack64(x,y), pack64(z,r))
  gather   rows [n,4] f32 take by a sorted permutation
  build    _plan_from_sorted from pre-sorted operands

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_plan2.py [n]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.slabs import (
    _plan_from_sorted, _xbits_z, default_slab_config, plan_slabs,
    slab_sort_keys)


def chain_time(make_step, k=8, repeats=3):
    """Time one step: the carry feeds the step and the step's output
    feeds the carry, so the loop body cannot be hoisted."""
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
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    gx, col_cap, slab_rows = default_slab_config(n)
    print("backend:", jax.devices()[0].platform, "n:", n,
          "gx:", gx, "col_cap:", col_cap, "slab_rows:", slab_rows,
          flush=True)

    lo_s = jnp.min(coords, axis=0)
    hi_s = jnp.max(coords, axis=0)
    ext = hi_s - lo_s
    r_max = jnp.max(radii)
    zbits = _xbits_z(gx)
    eps = jnp.float32(1e-12)  # perturbation that keeps keys near-constant

    rows = []

    def rec(name, ms):
        print("{}: {:.3f} ms".format(name, ms), flush=True)
        rows.append((name, ms))

    # full plan: perturb coords by s*eps, carry = stream corner
    def full_plan(s):
        c = coords + s * eps
        p = plan_slabs(c, radii, gx, col_cap, slab_rows)
        return p.stream[0, 0, 0] * eps
    rec("full", chain_time(full_plan))

    key, _ = slab_sort_keys(coords, radii, gx, lo_s, ext, r_max)
    ids = jnp.arange(n, dtype=jnp.uint32)

    def perturb_key(s):
        # flips key bit 0 of element 0 depending on the carry — data-
        # dependent, but leaves the distribution intact
        return key ^ (s > jnp.float32(2)).astype(jnp.uint32)

    def sort6(s):
        k2 = perturb_key(s)
        outs = jax.lax.sort(
            (k2, ids, coords[:, 0], coords[:, 1], coords[:, 2], radii),
            num_keys=1, is_stable=True)
        return outs[2][0] * eps
    rec("sort6", chain_time(sort6))

    def sort2(s):
        k2 = perturb_key(s)
        outs = jax.lax.sort((k2, ids), num_keys=1, is_stable=True)
        return outs[1][0].astype(jnp.float32) * eps
    rec("sort2", chain_time(sort2))

    key64 = (key.astype(jnp.uint64) << 32) | ids.astype(jnp.uint64)

    def sort1(s):
        k2 = key64 ^ (s > jnp.float32(2)).astype(jnp.uint64)
        outs = jax.lax.sort((k2,), num_keys=1, is_stable=False)
        return outs[0][0].astype(jnp.float32) * eps
    rec("sort1", chain_time(sort1))

    xb = jax.lax.bitcast_convert_type(coords[:, 0], jnp.uint32)
    yb = jax.lax.bitcast_convert_type(coords[:, 1], jnp.uint32)
    zb = jax.lax.bitcast_convert_type(coords[:, 2], jnp.uint32)
    rb = jax.lax.bitcast_convert_type(radii, jnp.uint32)
    xy = (xb.astype(jnp.uint64) << 32) | yb.astype(jnp.uint64)
    zr = (zb.astype(jnp.uint64) << 32) | rb.astype(jnp.uint64)

    def sort4p(s):
        k2 = perturb_key(s)
        outs = jax.lax.sort((k2, ids, xy, zr), num_keys=1,
                            is_stable=True)
        return (outs[3][0] & jnp.uint64(0xFFFF)).astype(jnp.float32) * eps
    rec("sort4p", chain_time(sort4p))

    # gather: rows [n, 4] by the sorted permutation
    perm = jax.lax.sort((key, ids), num_keys=1, is_stable=True)[1]
    packed = jnp.concatenate([coords, radii[:, None]], axis=1)  # [n, 4]

    def gather_rows(s):
        p2 = perm + (s > jnp.float32(2)).astype(jnp.uint32)
        g = jnp.take(packed, p2.astype(jnp.int32), axis=0,
                     indices_are_sorted=False, unique_indices=True)
        return g[0, 0] * eps
    rec("gather4", chain_time(gather_rows))

    # gather of one [n] f32 operand
    xcol = coords[:, 0]

    def gather_one(s):
        p2 = perm + (s > jnp.float32(2)).astype(jnp.uint32)
        g = jnp.take(xcol, p2.astype(jnp.int32))
        return g[0] * eps
    rec("gather1", chain_time(gather_one))

    # build from sorted: perturb one sorted operand
    outs = jax.lax.sort(
        (key, ids, coords[:, 0], coords[:, 1], coords[:, 2], radii),
        num_keys=1, is_stable=True)
    zext = jnp.where(ext[2] > 0, ext[2], jnp.float32(1))
    zscale = (jnp.float32((1 << zbits) - 1)) / zext

    def build(s):
        x2 = outs[2] + s * eps
        arrays = _plan_from_sorted(
            outs[0], outs[1], x2, outs[3], outs[4], outs[5],
            jnp.int32(n), gx, 0, zbits, lo_s[2], zext, zscale, r_max,
            col_cap, slab_rows)
        return arrays[0][0, 0, 0] * eps
    rec("build", chain_time(build))

    print("ROW " + json.dumps({
        "name": "plan-split2-n{}-gx{}".format(n, gx),
        **{k: v for k, v in rows}}), flush=True)


if __name__ == "__main__":
    main()
