"""Round-3: decompose _plan_from_sorted (the plan's non-sort ~2.3 ms).

exp_r3_plan2 showed full=3.75, sort6=1.43, but its `build` probe
perturbed x only — the window thresholds derive from z/r, so the big
searchsorted was hoisted out of the chain. Here each probe perturbs z,
keeping every downstream stage live:

  build_z   _plan_from_sorted with z perturbed (true non-sort cost)
  stream    the [Rp, 8, 128] stream tensor alone
  zranges   per-chunk z ranges (strip gather + masked reduce)
  winsearch the gx*mc*4 window searchsorted (sorted_bucket_starts)
  starts    the gx+2 slab-start bucket search

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python -u benchmarks/exp_r3_plan3.py [n]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from collision_tpu.columns import CHUNK, LANE, _quantize
from collision_tpu.ops.offset import sorted_bucket_starts
from collision_tpu.slabs import (
    _plan_from_sorted, _xbits_z, default_slab_config, slab_sort_keys)


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
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.random((n, 3)).astype("float32"))
    radii = jnp.asarray(
        rng.uniform(0, 1.0 / np.sqrt(n), n).astype("float32"))
    gx, col_cap, slab_rows = default_slab_config(n)
    print("backend:", jax.devices()[0].platform, "n:", n, "gx:", gx,
          "col_cap:", col_cap, "slab_rows:", slab_rows, flush=True)

    lo_s = jnp.min(coords, axis=0)
    hi_s = jnp.max(coords, axis=0)
    ext = hi_s - lo_s
    r_max = jnp.max(radii)
    zbits = _xbits_z(gx)
    zmax = (1 << zbits) - 1
    mc = -(-col_cap // CHUNK)
    eps = jnp.float32(1e-12)

    key, _ = slab_sort_keys(coords, radii, gx, lo_s, ext, r_max)
    ids = jnp.arange(n, dtype=jnp.uint32)
    outs = jax.lax.sort(
        (key, ids, coords[:, 0], coords[:, 1], coords[:, 2], radii),
        num_keys=1, is_stable=True)
    key_s, ids_s, x_s, y_s, z_s, r_s = outs
    zext = jnp.where(ext[2] > 0, ext[2], jnp.float32(1))
    zscale = jnp.float32(zmax) / zext

    rows = []

    def rec(name, ms):
        print("{}: {:.3f} ms".format(name, ms), flush=True)
        rows.append((name, ms))

    def build_z(s):
        z2 = z_s + s * eps
        arrays = _plan_from_sorted(
            key_s, ids_s, x_s, y_s, z2, r_s, jnp.int32(n), gx, 0, zbits,
            lo_s[2], zext, zscale, r_max, col_cap, slab_rows)
        # touch every output so nothing is DCE'd
        acc = arrays[0][0, 0, 0]
        for a in arrays[1:]:
            acc = acc + a.reshape(-1)[0].astype(jnp.float32)
        return acc * eps
    rec("build_z", chain_time(build_z))

    # --- stream tensor alone ---
    pos = jnp.arange(n, dtype=jnp.int32)
    valid = pos < n
    R = -(-n // LANE)
    Rp = R + slab_rows + 2
    npad = Rp * LANE

    def stream_only(s):
        z2 = z_s + s * eps

        def padto(v, fill):
            return jnp.full((npad,), fill, jnp.float32).at[:n].set(v)

        idf = jax.lax.bitcast_convert_type(ids_s, jnp.float32)
        comps = jnp.stack([
            padto(x_s - r_s, jnp.inf), padto(y_s - r_s, jnp.inf),
            padto(z2 - r_s, jnp.inf), padto(x_s + r_s, jnp.inf),
            padto(y_s + r_s, jnp.inf), padto(z2 + r_s, jnp.inf),
            padto(idf, jnp.inf),
            jnp.full((npad,), jnp.inf, jnp.float32),
        ])
        stream = jnp.transpose(comps.reshape(8, Rp, LANE), (1, 0, 2))
        return stream[0, 0, 0] * eps
    rec("stream", chain_time(stream_only))

    # --- per-chunk z ranges ---
    starts = sorted_bucket_starts(
        key_s >> zbits,
        jnp.arange(gx + 2, dtype=jnp.uint32)).astype(jnp.int32)
    nseg = npad // CHUNK
    c_idx = jnp.arange(gx, dtype=jnp.int32)
    k_idx = jnp.arange(mc, dtype=jnp.int32)
    g0 = starts[c_idx][:, None] + k_idx[None, :] * CHUNK
    ends = starts[c_idx + 1][:, None]
    alen = jnp.clip(ends - g0, 0, CHUNK)
    seg = jnp.minimum(g0 // CHUNK, nseg - 2)

    def zranges(s):
        z2 = z_s + s * eps
        zlo_pad = jnp.full((nseg * CHUNK,), jnp.inf, jnp.float32) \
            .at[:n].set(z2 - r_s)
        zhi_pad = jnp.full((nseg * CHUNK,), -jnp.inf, jnp.float32) \
            .at[:n].set(z2 + r_s)
        zlo_rows = zlo_pad.reshape(nseg, CHUNK)
        zhi_rows = zhi_pad.reshape(nseg, CHUNK)
        strip_lo = jnp.concatenate(
            [jnp.take(zlo_rows, seg, axis=0),
             jnp.take(zlo_rows, seg + 1, axis=0)], axis=-1)
        strip_hi = jnp.concatenate(
            [jnp.take(zhi_rows, seg, axis=0),
             jnp.take(zhi_rows, seg + 1, axis=0)], axis=-1)
        local = (g0 - seg * CHUNK)[..., None]
        lane = jnp.arange(2 * CHUNK, dtype=jnp.int32)
        inwin = (lane >= local) & (lane < local + alen[..., None])
        lo_chunk = jnp.min(jnp.where(inwin, strip_lo, jnp.inf), axis=-1)
        hi_chunk = jnp.max(jnp.where(inwin, strip_hi, -jnp.inf), axis=-1)
        return (lo_chunk[0, 0] + hi_chunk[0, 0]) * eps
    rec("zranges", chain_time(zranges))

    # --- window searchsorted (live thresholds) ---
    zhi_scene = lo_s[2] + zext
    # fixed plausible chunk z-ranges, perturbed per step
    qlo_base = jnp.clip(jnp.linspace(0.0, 0.9, gx * mc), 0, 1) \
        .reshape(gx, mc).astype(jnp.float32)

    def winsearch(s):
        lo_chunk = qlo_base + s * eps
        hi_chunk = lo_chunk + jnp.float32(0.01)
        qlo = _quantize(jnp.clip(lo_chunk - r_max, lo_s[2], zhi_scene),
                        lo_s[2], zscale, zmax)
        qhi = _quantize(jnp.clip(hi_chunk + r_max, lo_s[2], zhi_scene),
                        lo_s[2], zscale, zmax)
        key_q = []
        for dx in (0, 1):
            cb = (c_idx.astype(jnp.uint32) + dx)
            key_q.append((cb[:, None] << zbits) + qlo)
            key_q.append((cb[:, None] << zbits) + qhi + 1)
        all_pos = sorted_bucket_starts(
            key_s, jnp.stack(key_q).reshape(-1)
        ).reshape(4, gx, mc).astype(jnp.int32)
        return all_pos[0, 0, 0].astype(jnp.float32) * eps
    rec("winsearch", chain_time(winsearch))

    # --- slab starts bucket search (live keys impossible without re-sort;
    #     perturb the *queries* instead) ---
    def starts_probe(s):
        b0 = (s > jnp.float32(2)).astype(jnp.uint32)
        buckets = b0 + jnp.arange(gx + 2, dtype=jnp.uint32)
        st = sorted_bucket_starts(key_s >> zbits, buckets)
        return st[0].astype(jnp.float32) * eps
    rec("starts", chain_time(starts_probe))

    print("ROW " + json.dumps({
        "name": "plan-split3-n{}-gx{}".format(n, gx),
        **{k: v for k, v in rows}}), flush=True)


if __name__ == "__main__":
    main()
