"""Multi-device slab engine: distributed sort + per-device Pallas sweep.

Round-3 sharding of the flagship count path. Unlike the earlier layers
(sharded.py / sharded_fill.py), nothing global is replicated: spheres
arrive sharded over the mesh axis, each device sorts its shard by the
composite slab key, and an ``all_to_all`` bucket exchange re-partitions
them so device d owns slabs [d*gpd, (d+1)*gpd) — the natural slab
decomposition, since the sweep kernel's work and DMA already walk slabs
independently. One ``ppermute`` sends each device's first slab backward
as the halo its predecessor needs for the dx=1 stencil offset (the halo
parks in the plan's pad-slab position, so the per-device kernel is the
unmodified single-device kernel). Totals psum to the exact global count
— bit-identical to the single-device engine (integer addition is
associative; every pair is tested on exactly one device: intra-slab and
slab-to-successor pairs on the slab's owner, with the last device's
vacuous halo closing the chain).

Collectives (all_to_all, ppermute, psum, pmin/pmax for the global scene
stats) ride ICI via ``shard_map`` over an explicit ``Mesh``. Static
bucket/halo capacities make the exchange fixed-shape; overflows are
detected (``ok=False``) — the same never-silently-wrong contract as
every other engine knob.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..columns import CHUNK, LANE
from ..kernels.slab_sweep import UNROLL, _slab_count
from ..ops.offset import sorted_bucket_starts
from ..slabs import (
    SlabPlan, _plan_from_sorted, _xbits_z, default_slab_config,
    residual_count, slab_sort_keys,
)
from ..utils import round_up

_SENTINEL = np.uint32(0xFFFFFFFF)


def slab_count_sharded(coords, radii, mesh, axis="sp", gx=None,
                       col_capacity=None, slab_rows=None,
                       bucket_margin=2.0, interpret=False):
    """Exact global pair count over a device mesh.

    Args:
      coords: [n, 3] float32 (n divisible by the axis size; row order
        defines the global sphere ids).
      radii: [n] float32.
      mesh: jax.sharding.Mesh containing ``axis``.
      axis: mesh axis name to shard over.
      gx: total slab count (divisible by the axis size); None resolves
        default_slab_config and rounds up.
      col_capacity, slab_rows: per-slab capacities (shared by the halo).
      bucket_margin: static all_to_all bucket headroom over the uniform
        mean n/D^2.
      interpret: run the Pallas sweep under the interpreter (CPU tests).

    Returns:
      (count uint32, ok bool), replicated. ``ok`` False when any static
      capacity (bucket, halo, slab, residual) overflowed anywhere.
    """
    n = coords.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(
            "n ({}) must be divisible by the mesh axis size {}".format(
                n, n_dev))
    auto_gx, auto_cap, auto_rows = default_slab_config(n, gx=gx)
    gx = auto_gx if gx is None else gx
    gx = -(-gx // n_dev) * n_dev
    if col_capacity is None or slab_rows is None:
        _, auto_cap, auto_rows = default_slab_config(n, gx=gx)
        col_capacity = auto_cap if col_capacity is None else col_capacity
        slab_rows = auto_rows if slab_rows is None else slab_rows

    n_l = n // n_dev
    gpd = gx // n_dev
    bucket_cap = int(round_up(
        int(n_l / max(n_dev, 1) * bucket_margin) + CHUNK, LANE))
    halo_cap = int(round_up(col_capacity, LANE))

    fn = _make_device_fn(axis, n_dev, n_l, gx, gpd, bucket_cap, halo_cap,
                         col_capacity, slab_rows, bool(interpret))
    sharded = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P()),
        # Pallas calls inside shard_map don't annotate varying-across-
        # mesh-axes metadata on their out shapes; disable the check.
        check_vma=False,
    ))
    count, ok = sharded(jnp.asarray(coords, jnp.float32),
                        jnp.asarray(radii, jnp.float32))
    return count.astype(jnp.uint32), ok


def slab_fill_sharded(coords, radii, capacity, mesh, axis="sp", gx=None,
                      col_capacity=None, slab_rows=None, rpw=2,
                      bucket_margin=2.0, interpret=False):
    """Sharded pair fill over the distributed slab engine.

    Same decomposition as :func:`slab_count_sharded`; each device runs
    the 2-offset masks kernel + sparse emission over its local plan,
    global pair slots are assigned by an ``all_gather`` of per-device
    totals (device-major order == the global sweep order, so the buffer
    is bit-identical to the single-device slab fill), and the fixed-
    capacity buffers merge with an all-reduce-min (unwritten slots are
    0xFFFFFFFF).

    Returns (pairs[capacity, 2] uint32, count, ok), replicated.
    """
    n = coords.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(
            "n ({}) must be divisible by the mesh axis size {}".format(
                n, n_dev))
    auto_gx, _, _ = default_slab_config(n, gx=gx)
    gx = auto_gx if gx is None else gx
    gx = -(-gx // n_dev) * n_dev
    if col_capacity is None or slab_rows is None:
        _, auto_cap, auto_rows = default_slab_config(n, gx=gx)
        col_capacity = auto_cap if col_capacity is None else col_capacity
        slab_rows = auto_rows if slab_rows is None else slab_rows

    n_l = n // n_dev
    gpd = gx // n_dev
    bucket_cap = int(round_up(
        int(n_l / max(n_dev, 1) * bucket_margin) + CHUNK, LANE))
    halo_cap = int(round_up(col_capacity, LANE))

    fn = _make_device_fn(axis, n_dev, n_l, gx, gpd, bucket_cap, halo_cap,
                         col_capacity, slab_rows, bool(interpret),
                         capacity=int(capacity), rpw=int(rpw))
    sharded = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))
    pairs, count, ok = sharded(jnp.asarray(coords, jnp.float32),
                               jnp.asarray(radii, jnp.float32))
    return pairs, count.astype(jnp.uint32), ok


def _make_device_fn(axis, n_dev, n_l, gx, gpd, bucket_cap, halo_cap,
                    col_capacity, slab_rows, interpret, capacity=0,
                    rpw=1):
    zbits = _xbits_z(gx)
    mc = -(-col_capacity // CHUNK)
    merged_len = n_dev * bucket_cap
    final_len = merged_len + halo_cap

    def device_fn(c_l, r_l):
        me = jax.lax.axis_index(axis)
        col0 = me.astype(jnp.int32) * gpd

        # --- global scene statistics (identical quantization everywhere)
        lo = jax.lax.pmin(jnp.min(c_l, axis=0), axis)
        hi = jax.lax.pmax(jnp.max(c_l, axis=0), axis)
        r_max = jax.lax.pmax(jnp.max(r_l), axis)
        ext = hi - lo
        zext = jnp.where(ext[2] > 0, ext[2], jnp.float32(1.0))

        key, zscale = slab_sort_keys(c_l, r_l, gx, lo, ext, r_max)
        gid = me.astype(jnp.uint32) * np.uint32(n_l) \
            + jnp.arange(n_l, dtype=jnp.uint32)
        key_s, id_s, x_s, y_s, z_s, r_s = jax.lax.sort(
            (key, gid, c_l[:, 0], c_l[:, 1], c_l[:, 2], r_l),
            num_keys=1, is_stable=True)

        # --- bucket boundaries by destination device ---
        thresholds = (jnp.arange(n_dev + 1, dtype=jnp.uint32) * gpd) \
            << zbits
        bnd = sorted_bucket_starts(key_s, thresholds).astype(jnp.int32)
        lens = bnd[1:] - bnd[:-1]
        ok_a2a_local = jnp.max(lens) <= bucket_cap

        idx = jnp.clip(
            bnd[:-1, None] + jnp.arange(bucket_cap, dtype=jnp.int32),
            0, n_l - 1)
        in_bucket = jnp.arange(bucket_cap, dtype=jnp.int32)[None, :] \
            < lens[:, None]

        def bucketize(v, pad):
            return jnp.where(in_bucket, jnp.take(v, idx), pad)

        send = [
            bucketize(key_s, _SENTINEL),
            bucketize(id_s, jnp.uint32(0)),
            bucketize(x_s, jnp.float32(0)),
            bucketize(y_s, jnp.float32(0)),
            bucketize(z_s, jnp.float32(0)),
            bucketize(r_s, jnp.float32(0)),
        ]
        recv = [jax.lax.all_to_all(v, axis, 0, 0, tiled=True)
                .reshape(n_dev, bucket_cap) for v in send]
        recv_lens = jax.lax.all_to_all(lens, axis, 0, 0, tiled=True)
        n_valid = jnp.sum(recv_lens)

        # --- merge the n_dev sorted buckets (sentinels sort last) ---
        key_m, id_m, x_m, y_m, z_m, r_m = jax.lax.sort(
            tuple(v.reshape(merged_len) for v in recv),
            num_keys=1, is_stable=True)

        # --- halo: my first slab goes to my predecessor ---
        flen = sorted_bucket_starts(
            (key_m >> zbits).astype(jnp.uint32),
            (jnp.uint32(col0) + 1)[None])[0].astype(jnp.int32)
        flen = jnp.minimum(flen, n_valid)
        ok_halo_local = flen <= halo_cap
        in_first = jnp.arange(halo_cap, dtype=jnp.int32) < flen
        halo_send = [
            jnp.where(in_first, key_m[:halo_cap], _SENTINEL),
            jnp.where(in_first, id_m[:halo_cap], jnp.uint32(0)),
            jnp.where(in_first, x_m[:halo_cap], jnp.float32(0)),
            jnp.where(in_first, y_m[:halo_cap], jnp.float32(0)),
            jnp.where(in_first, z_m[:halo_cap], jnp.float32(0)),
            jnp.where(in_first, r_m[:halo_cap], jnp.float32(0)),
        ]
        perm = [(i, i - 1) for i in range(1, n_dev)]
        halo = [jax.lax.ppermute(v, axis, perm) for v in halo_send]
        halo_flen = jax.lax.ppermute(flen, axis, perm)
        # The last device's halo is vacuous (nothing received — zeros):
        # mask it to sentinels so it parks in the pad region.
        last = me == n_dev - 1
        halo[0] = jnp.where(last, _SENTINEL, halo[0])
        halo_flen = jnp.where(last, 0, halo_flen)
        size = n_valid + halo_flen

        # --- final local order: merged + halo, sentinels last ---
        key_f, id_f, x_f, y_f, z_f, r_f = jax.lax.sort(
            tuple(jnp.concatenate([a, b])
                  for a, b in zip((key_m, id_m, x_m, y_m, z_m, r_m),
                                  halo)),
            num_keys=1, is_stable=True)

        arrays = _plan_from_sorted(
            key_f, id_f, x_f, y_f, z_f, r_f, size, gpd, col0, zbits,
            lo[2], zext, zscale, r_max, col_capacity, slab_rows)
        plan = SlabPlan(*arrays, n=final_len, gx=gpd, mc=mc,
                        slab_rows=slab_rows)
        # The halo slab (local index gpd) is a DMA target of the last
        # grid step but is outside the plan's own max_slab stat.
        starts = plan.starts
        halo_rows = (starts[gpd + 1] + LANE - 1) // LANE \
            - starts[gpd] // LANE
        ok_local = plan.ok & ok_a2a_local & ok_halo_local \
            & (halo_rows + 2 <= slab_rows)

        if capacity > 0:
            # --- fill: local masks + sparse emission, global-slot merge
            from ..fill import NO_PAIR, _mask_fill_emit
            from ..kernels.slab_sweep import _slab_masks

            B = _slab_masks(plan.stream, plan.starts, plan.slab_r0,
                            plan.w0, plan.wcap, gpd, mc, slab_rows,
                            rpw, interpret)
            rp = jnp.sum(
                jax.lax.population_count(B).astype(jnp.int32), axis=2,
                dtype=jnp.int32)
            local_total = jnp.sum(rp, dtype=jnp.int32)
            f_ok = ok_local & (plan.rows_rolled <= rpw) \
                & (jnp.sum(rp.astype(jnp.float32))
                   < float(2 ** 31 - 2 ** 26))
            ids_flat = jax.lax.bitcast_convert_type(
                plan.stream[:, 6, :], jnp.uint32).reshape(-1)
            ida_l, idb_l, trunc_safe = _mask_fill_emit(
                B, plan.starts, plan.w0.reshape(-1), mc, ids_flat,
                capacity, rpw, local_total, None, noff=2, rolled=True,
                rp=rp)

            totals = jax.lax.all_gather(local_total, axis)
            me_i = me.astype(jnp.int32)
            base = jnp.sum(jnp.where(
                jnp.arange(n_dev) < me_i, totals, 0), dtype=jnp.int32)
            total = jnp.sum(totals, dtype=jnp.int32)

            # Device-major slot order == global sweep order: my pairs
            # own global slots [base, base + local_total).
            q = jnp.arange(capacity, dtype=jnp.int32)
            li = q - base
            mine = (li >= 0) & (li < local_total) & (q < capacity)
            lic = jnp.clip(li, 0, capacity - 1)
            ida_g = jnp.where(mine, jnp.take(ida_l, lic), NO_PAIR)
            idb_g = jnp.where(mine, jnp.take(idb_l, lic), NO_PAIR)
            pairs = jnp.stack([ida_g, idb_g], axis=1)
            pairs = jax.lax.pmin(pairs, axis)
            # A device whose slice was cut off by capacity must have
            # materialized its full prefix: its local buffer held
            # capacity slots, so truncation is covered by trunc_safe.
            ok = jax.lax.psum(
                (f_ok & trunc_safe).astype(jnp.int32), axis) == n_dev
            return pairs, jax.lax.psum(local_total, axis), ok

        wcap_c = jnp.minimum(plan.wcap, LANE)
        count, count_f = _slab_count(
            plan.stream, plan.starts, plan.slab_r0, plan.w0, wcap_c,
            gpd, mc, slab_rows, 1, interpret, UNROLL)
        rcount, r_ok = residual_count(plan)
        no_ovf = count_f < float(2 ** 31 - 2 ** 26)

        total = jax.lax.psum(count + rcount, axis)
        ok = jax.lax.psum(
            (ok_local & r_ok & no_ovf).astype(jnp.int32), axis) == n_dev
        return total, ok

    return device_fn
